"""Fit render_rgbd's per-class palette to the reference's OpenGL renders.

Model per object class c (terrain, ball) and channel k:
    ref_pixel ~= col[c,k] * (ambient + (1 - ambient) * cos_theta)
with cos_theta the headlight Lambert term (light from the camera —
MuJoCo's default scene light), and the sky a constant color. The shading
map is obtained by rendering the same scenes with a white palette and
ambient 0; `ambient` is grid-searched, colors solved in closed form.

Consumes outputs/experiments/studies/r5/cross_renderer_rgb_imgs.npz
(tools/cross_renderer_rgb.py with the same scene RNG). Prints the fitted
palette for sensors/depth.py::_RGB_PALETTE and the calibrated residuals.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=. \
      python tools/fit_rgb_palette.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

NPZ = "outputs/experiments/studies/r5/cross_renderer_rgb_imgs.npz"


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openballbot_rl_tpu.utils.devices import force_cpu
    force_cpu()
    import jax.numpy as jnp

    from openballbot_rl_tpu.core.factories import create_terrain
    from openballbot_rl_tpu.physics import hfield as hf
    from openballbot_rl_tpu.physics.model import make_model
    from openballbot_rl_tpu.sensors.depth import DepthCameras

    z = np.load(NPZ)
    ref, ref_depth = z["ref"], z["ref_depth"]      # (S,2,H,W,3), (S,2,H,W)

    mymodel = make_model()
    n = mymodel.hfield_n
    gen = create_terrain({"type": "perlin", "config": {
        "scale": 25.0, "octaves": 4, "persistence": 0.2, "lacunarity": 2.0}})
    cams = DepthCameras(ball_radius=float(mymodel.ball_radius))
    base_dz = float(mymodel.base_init_z)
    ball_dz = float(mymodel.ball_com_init_z)

    # identical scene RNG to cross_renderer_rgb.py
    rng = np.random.default_rng(0)
    scenes = []
    for seed in (3, 11, 42):
        terr = np.asarray(gen(n, seed=seed), np.float32).reshape(n, n)
        for _ in range(4):
            x, y = rng.uniform(-2.5, 2.5, 2)
            tilt = rng.uniform(0.0, 0.25)
            axis = rng.uniform(-1, 1, 2)
            scenes.append((seed, terr, x, y, tilt, axis))

    shade_pal = {"terrain": (1.0, 1.0, 1.0), "ball": (1.0, 1.0, 1.0),
                 "sky": (0.0, 0.0, 0.0), "ambient": 0.0}
    ballmark = {"terrain": (0.0, 0.0, 0.0), "ball": (1.0, 1.0, 1.0),
                "sky": (0.0, 0.0, 0.0), "ambient": 1.0}

    sampler_cache = {}
    shade, ballm, mine_depth = [], [], []
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
        bp = jnp.asarray([x, y, base_dz + z_off], jnp.float32)
        bc = jnp.asarray([x, y, ball_dz + z_off], jnp.float32)
        q = jnp.asarray(quat)
        s = np.asarray(cams.render_rgbd(sampler_cache[seed], bp, q, bc,
                                        palette=shade_pal))
        m = np.asarray(cams.render_rgbd(sampler_cache[seed], bp, q, bc,
                                        palette=ballmark))
        shade.append(s[:, 0])                      # cos map (white, amb 0)
        ballm.append(m[:, 0] > 0.5)                # ball mask
        mine_depth.append(s[:, 3])
    S = np.stack(shade)                            # (S,2,H,W)
    BALL = np.stack(ballm)
    MD = np.stack(mine_depth)

    geom = MD < 0.999
    terr_m = geom & ~BALL
    sky_m = ~geom
    both = ref_depth < 0.999

    def fit_class(mask):
        mask = mask & both
        s = S[mask]
        best = None
        for amb in np.arange(0.0, 0.92, 0.02):
            f = amb + (1 - amb) * s                # shading factor
            cols, resid = [], 0.0
            for k in range(3):
                yk = ref[..., k][mask]
                c = float((f * yk).sum() / np.maximum((f * f).sum(), 1e-9))
                cols.append(min(max(c, 0.0), 1.0))
                resid += float(np.abs(cols[k] * f - yk).mean())
            resid /= 3
            if best is None or resid < best[2]:
                best = (amb, cols, resid)
        return best

    amb_t, col_t, res_t = fit_class(terr_m)
    amb_b, col_b, res_b = fit_class(BALL)
    col_sky = [float(ref[..., k][sky_m & ~both].mean()) for k in range(3)] \
        if (sky_m & ~both).any() else [0.433] * 3
    # single shared ambient: weighted by pixel counts
    n_t, n_b = (terr_m & both).sum(), (BALL & both).sum()
    amb = float((amb_t * n_t + amb_b * n_b) / max(n_t + n_b, 1))
    # re-solve colors at the shared ambient
    def solve_cols(mask, amb):
        mask = mask & both
        s = S[mask]
        f = amb + (1 - amb) * s
        out = []
        for k in range(3):
            yk = ref[..., k][mask]
            c = float((f * yk).sum() / np.maximum((f * f).sum(), 1e-9))
            out.append(min(max(c, 0.0), 1.0))
        return out
    col_t = solve_cols(terr_m, amb)
    col_b = solve_cols(BALL, amb)

    pal = {"terrain": [round(c, 3) for c in col_t],
           "ball": [round(c, 3) for c in col_b],
           "sky": [round(c, 3) for c in col_sky],
           "ambient": round(amb, 3)}
    print("fitted palette:", json.dumps(pal))
    print(f"(per-class best ambients: terrain {amb_t:.2f} ball {amb_b:.2f}; "
          f"residuals at own ambient {res_t:.4f}/{res_b:.4f})")

    # calibrated residual over all pixels
    pred = np.where(geom[..., None],
                    np.where(BALL[..., None], np.asarray(col_b),
                             np.asarray(col_t))
                    * (amb + (1 - amb) * S[..., None]),
                    np.asarray(col_sky))
    d = np.abs(pred - ref)
    stats = {
        "pal": pal,
        "rgb_mean_abs_calibrated": float(d.mean()),
        "rgb_p95_abs_calibrated": float(np.quantile(d, 0.95)),
        "gray_corr_calibrated": float(np.corrcoef(
            pred.mean(-1).reshape(-1), ref.mean(-1).reshape(-1))[0, 1]),
    }
    print(json.dumps(stats, indent=2))
    with open("outputs/experiments/studies/r5/rgb_palette_fit.json",
              "w") as f:
        json.dump(stats, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
