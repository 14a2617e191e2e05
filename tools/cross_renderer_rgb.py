"""RGB cross-renderer parity: quantify the Lambert-vs-OpenGL gap (round 5).

Round 4 settled the DEPTH channel against the reference's real OpenGL
renderer (mean 4.4 mm — docs/design/cross_renderer_parity.md) but
explicitly did not measure RGB: the reference's RGB channel renders the
textured scene (basketball texture ballbot.xml:76-79, wheels, tower),
while this repo's `render_rgbd` (sensors/depth.py) is flat-color Lambert
over {terrain, ball} only. This tool renders the SAME scenes both ways
and quantifies the gap — overall, per channel, and split into the pixel
populations where the two renderers even draw the same object class
(terrain/ball/sky agreement from the depth hit masks) vs pixels where
the reference draws geometry this renderer has no model of.

Depth-only remains the paper's pipeline (ballbot_env.py:123); RGB mode
is a compatibility surface, and this memo-feeding tool bounds what an
RGB-trained policy/encoder would see moving between renderers.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
      python tools/cross_renderer_rgb.py
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("MUJOCO_GL", "egl")
os.environ.setdefault("EGL_PLATFORM", "surfaceless")
os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
os.environ.setdefault("__EGL_VENDOR_LIBRARY_FILENAMES",
                      "/usr/share/glvnd/egl_vendor.d/50_mesa.json")

import numpy as np

REF_XML = "/root/reference/ballbot_gym/models/ballbot.xml"


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openballbot_rl_tpu.utils.devices import force_cpu
    force_cpu()
    import jax.numpy as jnp
    import mujoco

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import hfield as hf
    from openballbot_rl_tpu.physics.model import make_model
    from openballbot_rl_tpu.sensors.depth import DepthCameras

    xml = open(REF_XML).read()
    xml = "\n".join(l for l in xml.splitlines() if "cone_mesh" not in l)
    tex_dir = os.path.join(os.path.dirname(REF_XML), "textures")
    assets = {fn: open(os.path.join(tex_dir, fn), "rb").read()
              for fn in os.listdir(tex_dir)}
    model = mujoco.MjModel.from_xml_string(xml, assets)
    data = mujoco.MjData(model)

    box = {}

    def fresh(depth: bool):
        key = "d" if depth else "rgb"
        if key in box:
            box[key].close()
        r = mujoco.Renderer(model, 64, 64)
        if depth:
            r.enable_depth_rendering()
        box[key] = r
        return r

    mymodel = make_model()
    n = model.hfield_nrow[0]
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    cams = DepthCameras(ball_radius=float(mymodel.ball_radius))

    ball_geom_off = 0.14
    base_dz = float(mymodel.base_init_z)
    ball_dz = float(mymodel.ball_com_init_z)

    rng = np.random.default_rng(0)
    scenes = []
    for seed in (3, 11, 42):
        terr = np.asarray(gen(n, seed=seed), np.float32).reshape(n, n)
        for _ in range(4):
            x, y = rng.uniform(-2.5, 2.5, 2)
            tilt = rng.uniform(0.0, 0.25)
            axis = rng.uniform(-1, 1, 2)
            scenes.append((seed, terr, x, y, tilt, axis))

    sampler_cache = {}
    rgb_mj, rgb_mine, d_mj_all, cls_mine = [], [], [], []
    for seed, terr, x, y, tilt, axis in scenes:
        hts = jnp.asarray(terr)[None]
        if seed not in sampler_cache:
            sampler_cache[seed] = hf.make_sampler(hts, jnp.asarray(0),
                                                  5.0, 2.0)
        h_local, _, _ = sampler_cache[seed](jnp.asarray(x), jnp.asarray(y))
        z_off = float(h_local) + 0.01
        ax = np.array([axis[0], axis[1], 0.0])
        ax = ax / (np.linalg.norm(ax) + 1e-9)
        quat = np.array([np.cos(tilt / 2), *(np.sin(tilt / 2) * ax)],
                        np.float32)
        base_pos = np.array([x, y, base_dz + z_off], np.float32)
        ball_center = np.array([x, y, ball_dz + z_off], np.float32)

        model.hfield_data[:] = terr.reshape(-1)
        mujoco.mj_resetData(model, data)
        data.qpos[0:3] = base_pos
        data.qpos[3:7] = quat
        data.qpos[10:13] = ball_center + np.array([0, 0, ball_geom_off])
        data.qpos[13:17] = [1, 0, 0, 0]
        mujoco.mj_forward(model, data)

        r_rgb = fresh(depth=False)
        r_d = fresh(depth=True)
        ims, ds = [], []
        for cam in ("cam_0", "cam_1"):
            r_rgb.update_scene(data, camera=cam)
            ims.append(r_rgb.render().astype(np.float32) / 255.0)
            r_d.update_scene(data, camera=cam)
            dd = r_d.render().astype(np.float32)
            dd[dd >= 1.0] = 1.0
            ds.append(dd)
        rgb_mj.append(np.stack(ims))                   # (2, H, W, 3)
        d_mj_all.append(np.stack(ds))                  # (2, H, W)

        out = np.asarray(cams.render_rgbd(
            sampler_cache[seed], jnp.asarray(base_pos), jnp.asarray(quat),
            jnp.asarray(ball_center)))                 # (2, 4, H, W)
        rgb_mine.append(np.moveaxis(out[:, :3], 1, -1))
        # object-class map from this renderer: 0 sky, 1 terrain, 2 ball
        d_mine = out[:, 3]
        # ball pixels: re-derive via the ball trace (same geometry the
        # renderer used) — approximate via color match to the flat ball
        # color before shading is ambiguous, so use depth: ball pixels are
        # where our depth < 1 AND the reference's class would also be
        # geometry; classify by our renderer's own masks instead:
        cls = np.where(d_mine >= 0.999, 0, 1)
        cls_mine.append(cls)

    A = np.stack(rgb_mj)                               # (S, 2, H, W, 3)
    B = np.stack(rgb_mine)
    D = np.stack(d_mj_all)                             # (S, 2, H, W)
    C = np.stack(cls_mine)                             # (S, 2, H, W)

    diff = np.abs(A - B)
    # where BOTH renderers agree something is drawn (ref depth < 1 means
    # geometry nearer than the clip; our cls=1 means we drew geometry)
    both_geom = (D < 0.999) & (C == 1)
    only_ref = (D < 0.999) & (C == 0)                  # ref-only geometry
    gray_a = A.mean(-1)
    gray_b = B.mean(-1)
    corr = float(np.corrcoef(gray_a.reshape(-1), gray_b.reshape(-1))[0, 1])

    out = {
        "n_scenes": int(A.shape[0]),
        "rgb_mean_abs": float(diff.mean()),
        "rgb_p95_abs": float(np.quantile(diff, 0.95)),
        "rgb_per_channel_mean": [float(diff[..., c].mean())
                                 for c in range(3)],
        "rgb_mean_abs_where_both_draw": float(diff[both_geom].mean()),
        "rgb_mean_abs_where_only_ref_draws": float(
            diff[only_ref].mean()) if only_ref.any() else None,
        "frac_pixels_only_ref_geometry": float(only_ref.mean()),
        "frac_pixels_both_geometry": float(both_geom.mean()),
        "grayscale_corr": corr,
    }
    print(json.dumps(out, indent=2))
    os.makedirs("outputs/experiments/studies/r5", exist_ok=True)
    with open("outputs/experiments/studies/r5/cross_renderer_rgb.json",
              "w") as f:
        json.dump(out, f, indent=2)
    np.savez_compressed(
        "outputs/experiments/studies/r5/cross_renderer_rgb_imgs.npz",
        ref=A, mine=B, ref_depth=D, mine_geom=C)
    return 0


if __name__ == "__main__":
    sys.exit(main())
