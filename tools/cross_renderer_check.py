"""Cross-renderer image + latent parity vs the reference's real renderer.

The one consumer of image pixels never cross-checked before round 4: the
repo's analytic raycaster (sensors/depth.py) is validated against its own
exact marcher, but a policy/encoder trained on the reference's OpenGL
depth images (ballbot_gym/sensors/rgbd.py:36-83, two mujoco.Renderer
instances, depth clipped at 1.0) had never been fed this renderer's
images. This tool renders the SAME scenes both ways and bounds the gap:

  1. load the reference MJCF (/root/reference/ballbot_gym/models/
     ballbot.xml) in headless MuJoCo (EGL surfaceless + Mesa software GL),
     write our terrain bank's heights into model.hfield_data exactly like
     ballbot_env.py:513, pose base+ball by qpos, and render cam_0/cam_1
     depth with the reference's clip semantics;
  2. render the same (terrain, base pose, ball center) with this repo's
     exact marcher and with the render_patch/render_tiles TPU fast path;
  3. compare depth images, and compare LATENTS through the reference's own
     shipped frozen encoder (ported exactly by
     tools/port_reference_encoder.py — max |dz| 3e-6 vs torch), in units
     of the encoder's per-dimension signal spread across scenes.

Results -> docs/design/cross_renderer_parity.md.

Run CPU-only: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    PYTHONPATH=. python tools/cross_renderer_check.py
"""
from __future__ import annotations

import json
import os
import sys

# headless GL (probed in round 4: default EGL display fails; surfaceless
# Mesa with software rasterization works)
os.environ.setdefault("MUJOCO_GL", "egl")
os.environ.setdefault("EGL_PLATFORM", "surfaceless")
os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
os.environ.setdefault("__EGL_VENDOR_LIBRARY_FILENAMES",
                      "/usr/share/glvnd/egl_vendor.d/50_mesa.json")

import numpy as np

REF_XML = "/root/reference/ballbot_gym/models/ballbot.xml"


def mujoco_depth(model, data, renderer, cam: str) -> np.ndarray:
    """Reference depth semantics (rgbd.py:67-73): render, clip >= 1 to 1."""
    renderer.update_scene(data, camera=cam)
    depth = renderer.render().astype(np.float32)
    depth[depth >= 1.0] = 1.0
    return depth


def main() -> int:
    from openballbot_rl_tpu.utils.devices import force_cpu
    force_cpu()
    import jax
    import jax.numpy as jnp
    import mujoco

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.encoders.training import make_frozen_encoder
    from openballbot_rl_tpu.physics import hfield as hf
    from openballbot_rl_tpu.physics.model import make_model
    from openballbot_rl_tpu.physics.rotations import quat_to_mat
    from openballbot_rl_tpu.sensors.depth import DepthCameras

    # The reference checkout does not ship meshes/cone.stl (the camera
    # marker cones) — strip that asset and its two geoms; textures load
    # from the assets dict. The cones are decorative markers at the camera
    # origins; the cam STICKS (real capsules) stay in the model.
    xml = open(REF_XML).read()
    xml = "\n".join(l for l in xml.splitlines()
                    if "cone_mesh" not in l)
    tex_dir = os.path.join(os.path.dirname(REF_XML), "textures")
    assets = {fn: open(os.path.join(tex_dir, fn), "rb").read()
              for fn in os.listdir(tex_dir)}
    model = mujoco.MjModel.from_xml_string(xml, assets)
    data = mujoco.MjData(model)

    renderer_box = {}

    def fresh_renderer():
        # the offscreen Renderer uploads the heightfield to the GL context
        # at creation — it must be recreated after every hfield_data write
        # (the reference's viewer path calls update_hfield; rgbd.py
        # recreates its renderers on reset(model))
        if "r" in renderer_box:
            renderer_box["r"].close()
        r = mujoco.Renderer(model, 64, 64)
        r.enable_depth_rendering()
        renderer_box["r"] = r
        return r

    mymodel = make_model()
    n = model.hfield_nrow[0]
    assert n == mymodel.hfield_n == 293

    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})

    cams = DepthCameras(ball_radius=float(mymodel.ball_radius))
    enc_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "outputs/encoders/encoder_ref_epoch53")
    encode, _ = make_frozen_encoder(enc_path)

    # ball GEOM center sits 0.14 m below the ball body origin (ballbot.xml:79)
    ball_geom_off = 0.14
    base_dz = float(mymodel.base_init_z)      # 0.24 at zero offset
    ball_dz = float(mymodel.ball_com_init_z)  # ball CENTER at zero offset

    scenes = []
    rng = np.random.default_rng(0)
    for seed in (3, 11, 42):
        terr = np.asarray(gen(n, seed=seed), np.float32).reshape(n, n)
        for k in range(4):
            x, y = rng.uniform(-2.5, 2.5, 2)
            tilt = rng.uniform(0.0, 0.25)           # up to ~14 deg
            axis = rng.uniform(-1, 1, 2)
            scenes.append((seed, terr, x, y, tilt, axis))

    sampler_cache = {}
    rows = []
    imgs_mj, imgs_exact, imgs_fast = [], [], []
    for seed, terr, x, y, tilt, axis in scenes:
        hts = jnp.asarray(terr)[None]
        if seed not in sampler_cache:
            sampler_cache[seed] = hf.make_sampler(hts, jnp.asarray(0), 5.0,
                                                  2.0)
        h0 = float(hf.spawn_height_offset(jnp.asarray(terr), 2.0))
        # pose: base lifted by local terrain height at (x, y) + spawn rule
        h_local, _, _ = sampler_cache[seed](jnp.asarray(x), jnp.asarray(y))
        z_off = float(h_local) + 0.01
        ax = np.array([axis[0], axis[1], 0.0])
        ax = ax / (np.linalg.norm(ax) + 1e-9)
        quat = np.array([np.cos(tilt / 2), *(np.sin(tilt / 2) * ax)],
                        np.float32)
        base_pos = np.array([x, y, base_dz + z_off], np.float32)
        ball_center = np.array([x, y, ball_dz + z_off], np.float32)

        # --- reference render ---
        model.hfield_data[:] = terr.reshape(-1)
        renderer = fresh_renderer()
        mujoco.mj_resetData(model, data)
        data.qpos[0:3] = base_pos
        data.qpos[3:7] = quat
        data.qpos[10:13] = ball_center + np.array([0, 0, ball_geom_off])
        data.qpos[13:17] = [1, 0, 0, 0]
        mujoco.mj_forward(model, data)
        d_mj = np.stack([mujoco_depth(model, data, renderer, "cam_0"),
                         mujoco_depth(model, data, renderer, "cam_1")])

        # --- this repo's renders ---
        bp = jnp.asarray(base_pos)
        q = jnp.asarray(quat)
        bc = jnp.asarray(ball_center)
        d_exact = np.asarray(cams(sampler_cache[seed], bp, q, bc))
        d_fast = np.asarray(cams.render_patch(hts, jnp.asarray(0), 5.0, 2.0,
                                              bp, q, bc))
        imgs_mj.append(d_mj)
        imgs_exact.append(d_exact)
        imgs_fast.append(d_fast)
        rows.append((seed, x, y, tilt))

    imgs_mj = np.stack(imgs_mj)          # (S, 2, H, W)
    imgs_exact = np.stack(imgs_exact)
    imgs_fast = np.stack(imgs_fast)

    def img_stats(a, b):
        d = np.abs(a - b)
        return dict(mean=float(d.mean()), p95=float(np.quantile(d, 0.95)),
                    p99=float(np.quantile(d, 0.99)), max=float(d.max()))

    def latents(imgs):
        flat = jnp.asarray(imgs.reshape(-1, 1, 64, 64))
        return np.asarray(encode(flat))             # (S*2, 20)

    z_mj = latents(imgs_mj)
    z_exact = latents(imgs_exact)
    z_fast = latents(imgs_fast)
    sig = z_mj.std(axis=0)                          # per-dim signal spread

    def z_stats(a, b):
        d = np.abs(a - b)
        rel = d / (sig[None, :] + 1e-6)
        return dict(mean_abs=float(d.mean()), p95_abs=float(np.quantile(d, 0.95)),
                    mean_rel=float(rel.mean()), p95_rel=float(np.quantile(rel, 0.95)),
                    signal_std_mean=float(sig.mean()))

    out = {
        "n_scenes": len(rows),
        "depth_mj_vs_exact": img_stats(imgs_mj, imgs_exact),
        "depth_mj_vs_fast": img_stats(imgs_mj, imgs_fast),
        "depth_exact_vs_fast": img_stats(imgs_exact, imgs_fast),
        "latent_mj_vs_exact": z_stats(z_mj, z_exact),
        "latent_mj_vs_fast": z_stats(z_mj, z_fast),
        "latent_exact_vs_fast": z_stats(z_exact, z_fast),
    }
    print(json.dumps(out, indent=2))
    os.makedirs("outputs/experiments/studies/r4", exist_ok=True)
    with open("outputs/experiments/studies/r4/cross_renderer.json", "w") as f:
        json.dump(out, f, indent=2)
    np.savez("outputs/experiments/studies/r4/cross_renderer_images.npz",
             mj=imgs_mj, exact=imgs_exact, fast=imgs_fast,
             scenes=np.array(rows, np.float32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
