"""Heightfield sampling as pure array ops.

Terrain layout matches the reference convention: a (n, n) grid `T[i, j]` with
row index i along +y and column index j along +x, covering the square
[-E, E] x [-E, E] (E = half extent, 5 m), elevation z = zscale * T (T in
[0, 1]). The reference writes exactly this flattened grid into MuJoCo's
`model.hfield_data` (ballbot_env.py:513; ballbot.xml:23).
"""
from __future__ import annotations

import jax.numpy as jnp


def world_to_grid(x, y, n: int, half_extent: float):
    """Continuous (col, row) grid coordinates for world (x, y)."""
    gx = (x + half_extent) / (2.0 * half_extent) * (n - 1)
    gy = (y + half_extent) / (2.0 * half_extent) * (n - 1)
    return gx, gy


def sample_height_grad(terrain: jnp.ndarray, x, y, half_extent: float, zscale):
    """Bilinear height and its world-space gradient at world (x, y).

    terrain: (n, n) in [0,1].
    Returns (h, dh_dx, dh_dy) in meters / dimensionless slope.
    """
    sampler = make_sampler(terrain, None, half_extent, zscale)
    return sampler(x, y)


def make_sampler(heights: jnp.ndarray, idx, half_extent: float, zscale):
    """Build a point sampler fn(x, y) -> (h, dh_dx, dh_dy).

    heights: (n, n) with idx=None, or a bank (K, n, n) with idx a scalar
    index. The bank form matters for performance: slicing `bank[idx]` under
    vmap materializes a (B, n, n) gather (1.4 GB/step at B=4096); sampling
    through `heights[idx, i, j]` instead keeps every tap a scalar gather.
    """
    n = heights.shape[-1]
    if idx is None:
        tap = lambda i, j: heights[i, j]
    else:
        tap = lambda i, j: heights[idx, i, j]

    def sampler(x, y):
        gx, gy = world_to_grid(x, y, n, half_extent)
        gx = jnp.clip(gx, 0.0, n - 1.001)
        gy = jnp.clip(gy, 0.0, n - 1.001)
        j0 = jnp.floor(gx).astype(jnp.int32)
        i0 = jnp.floor(gy).astype(jnp.int32)
        j1 = jnp.minimum(j0 + 1, n - 1)
        i1 = jnp.minimum(i0 + 1, n - 1)
        fx = gx - j0.astype(gx.dtype)
        fy = gy - i0.astype(gy.dtype)

        t00 = tap(i0, j0)
        t01 = tap(i0, j1)
        t10 = tap(i1, j0)
        t11 = tap(i1, j1)

        h01 = t00 * (1 - fx) + t01 * fx          # row i0
        h23 = t10 * (1 - fx) + t11 * fx          # row i1
        h = (h01 * (1 - fy) + h23 * fy) * zscale

        cell = 2.0 * half_extent / (n - 1)
        dh_dx = (((t01 - t00) * (1 - fy) + (t11 - t10) * fy) * zscale) / cell
        dh_dy = ((h23 - h01) * zscale) / cell
        return h, dh_dx, dh_dy

    return sampler


def extract_patch(heights: jnp.ndarray, idx, x, y, n: int,
                  half_extent: float, patch_n: int):
    """Slice a (patch_n, patch_n) window of `heights[idx]` centered on world
    (x, y). Returns (patch, (ci, cj)) with ci/cj the slice origin in grid
    coordinates. The ONLY gather in the patch-cached sampling scheme — run
    it on a cadence (or at reset), never per step."""
    import jax

    gx, gy = world_to_grid(x, y, n, half_extent)
    ci = jnp.clip(jnp.round(gy).astype(jnp.int32) - patch_n // 2, 0,
                  n - patch_n)
    cj = jnp.clip(jnp.round(gx).astype(jnp.int32) - patch_n // 2, 0,
                  n - patch_n)
    patch = jax.lax.dynamic_slice(heights, (idx, ci, cj),
                                  (1, patch_n, patch_n))[0]
    return patch, jnp.stack([ci, cj])


def make_patch_sampler(patch: jnp.ndarray, patch_ij: jnp.ndarray,
                       n: int, half_extent: float, zscale):
    """Gather-free point sampler over a local terrain patch.

    Bit-exact drop-in for make_sampler WHILE queries stay inside the patch
    (the env guarantees this via the refresh cadence; see
    envs/env.py EnvParams.terrain_patch_*): the four bilinear taps are
    extracted with one-hot contractions (multiplying the stored value by
    1.0 and summing zeros preserves bits for the non-negative heights), and
    the interpolation formula below is copied verbatim from make_sampler.
    Queries outside the patch clamp to its border rows/cols.

    Why it exists: make_sampler's per-tap scalar gathers run at ~78M taps/s
    on TPU; the engine's 6 query points x 4 taps at B=32768 made terrain
    sampling ~70%% of the whole physics step. One-hot einsums over a
    (P, P) patch are dense VPU/MXU work instead.
    """
    P = patch.shape[-1]
    ci = patch_ij[0].astype(jnp.float32)
    cj = patch_ij[1].astype(jnp.float32)
    cols = jnp.arange(P, dtype=jnp.int32)

    def tap4(i0, i1, j0, j1):
        import jax

        shape = i0.shape
        i0 = i0.reshape(-1)
        i1 = i1.reshape(-1)
        j0 = j0.reshape(-1)
        j1 = j1.reshape(-1)
        oi0 = (i0[:, None] == cols[None, :]).astype(patch.dtype)
        oi1 = (i1[:, None] == cols[None, :]).astype(patch.dtype)
        oj0 = (j0[:, None] == cols[None, :]).astype(patch.dtype)
        oj1 = (j1[:, None] == cols[None, :]).astype(patch.dtype)
        # Precision.HIGHEST: TPU dots default to bf16 multiplies, which
        # would truncate the selected heights and silently break the
        # bit-exactness contract (CPU tests cannot catch it). HIGHEST's
        # 3-term bf16 decomposition is exact for f32 inputs, and these
        # dots are tiny (M x P x P).
        hi = jax.lax.Precision.HIGHEST
        rows0 = jnp.matmul(oi0, patch, precision=hi)  # (M, P): row i0
        rows1 = jnp.matmul(oi1, patch, precision=hi)
        t00 = jnp.sum(rows0 * oj0, axis=-1)
        t01 = jnp.sum(rows0 * oj1, axis=-1)
        t10 = jnp.sum(rows1 * oj0, axis=-1)
        t11 = jnp.sum(rows1 * oj1, axis=-1)
        return (t00.reshape(shape), t01.reshape(shape),
                t10.reshape(shape), t11.reshape(shape))

    def sampler(x, y):
        gx, gy = world_to_grid(x, y, n, half_extent)
        gx = jnp.clip(gx, 0.0, n - 1.001)          # identical to make_sampler
        gy = jnp.clip(gy, 0.0, n - 1.001)
        j0 = jnp.floor(gx).astype(jnp.int32)
        i0 = jnp.floor(gy).astype(jnp.int32)
        j1 = jnp.minimum(j0 + 1, n - 1)
        i1 = jnp.minimum(i0 + 1, n - 1)
        fx = gx - j0.astype(gx.dtype)
        fy = gy - i0.astype(gy.dtype)

        # local (clamped) patch coordinates for the taps
        ci_i = patch_ij[0]
        cj_i = patch_ij[1]
        t00, t01, t10, t11 = tap4(
            jnp.clip(i0 - ci_i, 0, P - 1), jnp.clip(i1 - ci_i, 0, P - 1),
            jnp.clip(j0 - cj_i, 0, P - 1), jnp.clip(j1 - cj_i, 0, P - 1))

        h01 = t00 * (1 - fx) + t01 * fx          # row i0
        h23 = t10 * (1 - fx) + t11 * fx          # row i1
        h = (h01 * (1 - fy) + h23 * fy) * zscale

        cell = 2.0 * half_extent / (n - 1)
        dh_dx = (((t01 - t00) * (1 - fy) + (t11 - t10) * fy) * zscale) / cell
        dh_dy = ((h23 - h01) * zscale) / cell
        return h, dh_dx, dh_dy

    return sampler


def surface_normal(dh_dx, dh_dy):
    """Unit upward normal of the surface z = h(x, y)."""
    inv = 1.0 / jnp.sqrt(1.0 + dh_dx * dh_dx + dh_dy * dh_dy)
    return jnp.stack([-dh_dx * inv, -dh_dy * inv, inv], axis=-1)


def spawn_height_offset(terrain: jnp.ndarray, zscale, window: int = 6,
                        eps: float = 0.01):
    """Initial robot/ball height offset: max terrain height in a +-window cell
    neighborhood of the grid center, + eps.

    Mirrors the reference spawn rule (ballbot_env.py:540-563): max terrain
    height under the ball's AABB plus a 1 cm safety margin. The reference's
    index arithmetic uses cell_size = half_extent/n, yielding a +-6 cell
    window for the 0.09 m ball; we reproduce that window.
    """
    n = terrain.shape[-1]
    c = n // 2
    sub = terrain[..., c - window:c + window + 1, c - window:c + window + 1]
    return jnp.max(sub, axis=(-2, -1)) * zscale + eps
