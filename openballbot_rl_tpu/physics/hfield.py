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

        cell = 2.0 * half_extent / max(n - 1, 1)   # n=1: one flat cell
        dh_dx = (((t01 - t00) * (1 - fy) + (t11 - t10) * fy) * zscale) / cell
        dh_dy = ((h23 - h01) * zscale) / cell
        return h, dh_dx, dh_dy

    return sampler


# ---------- aligned terrain tiles (stateless patch supply) ----------
#
# The round-2 patch cache refreshed per-env patches with a vmapped
# dynamic_slice; XLA lowers that to a SERIAL per-env loop on TPU (65.7 ms
# per refresh at B=32768 — tools/bench_tap_variants.py). Aligned tiles fix
# the supply side: every terrain is pre-sliced into overlapping P x P tiles
# on an S-cell grid at bank build, stored flat as (K*T*T, P*P), and each
# env fetches the tile nearest its robot with ONE embedding-style row
# gather per step (1.24 ms for all 32768 envs on v5e). Selection is pure
# index arithmetic from base_pos — no cached patch state, no refresh
# cadence, no bank-version tracking.
#
# Margin: the robot lands within S/2 cells of its tile center (selection
# rounds to the stride grid), the tile extends (P-1)/2 cells either side of
# its center, and the furthest bilinear tap sits one cell past the query, so
# one-sided coverage is (P-1)/2 - S/2 cells past the query footprint. For
# the physics tiles (P=32, S=8) that is 11.5 cells against a <=8-cell query
# footprint (ball + body spheres incl. tilt): 2.5 spare cells. NOTE the
# margin is measured in GRID CELLS — a finer grid (larger n) shrinks it in
# world meters with no change here, so make_terrain_bank asserts the
# world-space margin against the physics footprint at build time
# (check_tile_margin below) instead of trusting this comment.

TILE_SIZE = 32
TILE_STRIDE = 8

# camera tiles (renderer patch supply): render_tiles recentres a
# patch_n x patch_n window (P_R = 118 cells, sensors/depth.py) out of the
# selected tile, so the tile must cover [crow - P_R//2, crow + P_R//2 - 1]
# for any camera row within S/2 of the tile center: P >= P_R + 1 + S
# (144 >= 119 + 24). Stored bf16: the renderer downcasts the patch to bf16
# before its MXU polar resample anyway, so tile storage loses nothing.
CAM_TILE_SIZE = 144
CAM_TILE_STRIDE = 24

# world-space query footprint the physics tiles must cover around the base:
# ball contact + body spheres + one bilinear corner cell, under max tilt
# (~0.27 m; see tests/unit/test_patch_sampler.py footprint check)
PHYS_QUERY_FOOTPRINT_M = 0.30


def tiles_per_dim(n: int, tile_size: int = TILE_SIZE,
                  stride: int = TILE_STRIDE) -> int:
    """Tile count per axis: stride-S origins covering [0, n-P] inclusive,
    rounded up (the last tile may extend into edge padding that clamped
    queries can never address). Small grids (n <= P) get one tile that the
    edge padding in make_tiles completes."""
    return max(1, -(-(n - tile_size) // stride) + 1)


def check_tile_margin(n: int, half_extent: float) -> None:
    """Fail loudly when the physics-tile margin no longer covers the
    engine's query footprint in WORLD meters (the margin is fixed in grid
    cells, so a finer grid silently shrinks it otherwise)."""
    margin_cells = (TILE_SIZE - 1) / 2 - TILE_STRIDE / 2 - 1  # -1: bilinear
    cell = 2.0 * half_extent / max(n - 1, 1)
    if margin_cells * cell < PHYS_QUERY_FOOTPRINT_M and n > TILE_SIZE:
        raise ValueError(
            f"aligned-tile margin {margin_cells * cell:.3f} m at n={n} "
            f"(cell {cell * 100:.2f} cm) is below the physics query "
            f"footprint {PHYS_QUERY_FOOTPRINT_M} m — raise TILE_SIZE or "
            "lower TILE_STRIDE before using tiles on this grid")


def make_tiles(heights: jnp.ndarray, tile_size: int = TILE_SIZE,
               stride: int = TILE_STRIDE, dtype=None) -> jnp.ndarray:
    """Pre-slice a (K, n, n) bank into aligned tiles, flat (K*T*T, P*P).

    Flat layout: tile (k, a, b) lives at row (k*T + a)*T + b, covering
    grid rows [a*S, a*S+P) and cols [b*S, b*S+P). Pure array ops (static
    slices), so it runs wherever the bank is generated, device included.
    """
    P, S = tile_size, stride
    K, n = heights.shape[0], heights.shape[-1]
    T = tiles_per_dim(n, P, S)
    n_pad = S * (T - 1) + P
    h = jnp.pad(heights, ((0, 0), (0, n_pad - n), (0, n_pad - n)),
                mode="edge")
    if dtype is not None:
        h = h.astype(dtype)
    bands = jnp.stack([h[:, a * S:a * S + P, :] for a in range(T)], 1)
    tiles = jnp.stack([bands[..., b * S:b * S + P] for b in range(T)], 2)
    return tiles.reshape(K * T * T, P * P)


def tile_select(terrain_idx, x, y, n: int, half_extent: float, T: int):
    """Flat tile row + grid origin for the tile nearest world (x, y).

    terrain_idx/x/y may be traced scalars (vmapped per env); n, T static.
    """
    P, S = TILE_SIZE, TILE_STRIDE
    gx, gy = world_to_grid(x, y, n, half_extent)
    a = jnp.clip(jnp.round((gy - (P - 1) / 2) / S).astype(jnp.int32), 0, T - 1)
    b = jnp.clip(jnp.round((gx - (P - 1) / 2) / S).astype(jnp.int32), 0, T - 1)
    flat = (terrain_idx * T + a) * T + b
    return flat, jnp.stack([a * S, b * S]).astype(jnp.int32)


def cam_tile_select(terrain_idx, crow, ccol, T: int):
    """Flat camera-tile row + grid origin for integer camera grid coords.

    crow/ccol are the camera's SNAPPED grid row/col (render_patch's
    round((y + E)/cell) ints, possibly out of [0, n) — selection clips).
    Guarantee (proof in docs/guides/performance.md): with
    P >= patch_n + 1 + S, every recentred patch row
    clip(crow - patch_n//2 + v, 0, n-1) lands inside the selected tile.
    """
    P, S = CAM_TILE_SIZE, CAM_TILE_STRIDE
    a = jnp.clip(jnp.round((crow - (P - 1) / 2) / S).astype(jnp.int32),
                 0, T - 1)
    b = jnp.clip(jnp.round((ccol - (P - 1) / 2) / S).astype(jnp.int32),
                 0, T - 1)
    flat = (terrain_idx * T + a) * T + b
    return flat, a * S, b * S


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
    on TPU (no per-lane gather hardware); the engine's 6 query points x 4
    taps at B=32768 made terrain sampling ~70%% of the whole physics step.
    Each tap here is instead a dense masked 2-D reduction whose mask is an
    inline iota comparison: XLA fuses mask construction + select + reduce
    into one VPU pass over the patch, so nothing index-shaped ever touches
    HBM. Exactness does not depend on dot precision — exactly one element
    of the mask is nonzero, `where` passes the selected f32 through
    untouched, and adding zeros is exact in any accumulation order — which
    is why this beats the earlier one-hot-matmul formulation (that needed
    Precision.HIGHEST to avoid bf16 truncation and paid 5.5x for it:
    tools/bench_tap_variants.py, 0.81 ms vs 4.45 ms per batched step at
    B=32768 on v5e).
    """
    P = patch.shape[-1]
    cells = jnp.arange(P * P, dtype=jnp.int32)
    patch_flat = patch.reshape(-1)

    # FLAT-index masks (round 4): the tile supply gathers each env's patch
    # as one (P*P,) row; tapping it through (P, P)-shaped masks forced XLA
    # to re-layout the gather output ((B, 1024) {1,0} -> {0,1} copy, 0.39
    # ms/step at B=32768) and run the selects on (B, 32, 32) tiles.
    # Comparing the flat cell index ii*P + jj against one iota keeps every
    # tap on the gather's native (B, P*P) layout — same single-nonzero
    # mask, same bits (one f32 passes through `where` untouched; adding
    # zeros is exact in any order).
    def tap4(i0, i1, j0, j1):
        def corner(ii, jj):
            m = (ii * P + jj)[..., None] == cells         # (..., P*P)
            return jnp.sum(jnp.where(m, patch_flat, 0.0), axis=-1)

        return (corner(i0, j0), corner(i0, j1),
                corner(i1, j0), corner(i1, j1))

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

        cell = 2.0 * half_extent / max(n - 1, 1)   # n=1: one flat cell
        dh_dx = (((t01 - t00) * (1 - fy) + (t11 - t10) * fy) * zscale) / cell
        dh_dy = ((h23 - h01) * zscale) / cell
        return h, dh_dx, dh_dy

    return sampler


def _make_corner_taps(impl: str):
    """Per-env corner-tap function whose VMAP rule dispatches to a batched
    Pallas kernel (ops/pallas_taps.py).

    Unbatched semantics (the custom_vmap fallback, and the bit-exactness
    contract): taps = tiles[flat, li*P + lj] via the same flat one-hot as
    make_patch_sampler. The vmap rule replaces the batched gather+one-hot
    with either `patch_taps_rows` (XLA row gather + Pallas tap kernel,
    impl="pallas_rows") or `tile_taps_fused` (rows DMA'd HBM->VMEM inside
    the kernel, impl="pallas_fused")."""
    import jax

    from openballbot_rl_tpu.ops.pallas_taps import (
        patch_taps_rows, tile_taps_fused)

    @jax.custom_batching.custom_vmap
    def corner_taps(tiles, flat, li0, li1, lj0, lj1):
        P = TILE_SIZE
        row = tiles[flat]
        cells = jnp.arange(P * P, dtype=jnp.int32)

        def corner(ii, jj):
            m = (ii * P + jj)[..., None] == cells
            return jnp.sum(jnp.where(m, row, 0.0), axis=-1)

        return (corner(li0, lj0), corner(li0, lj1),
                corner(li1, lj0), corner(li1, lj1))

    @corner_taps.def_vmap
    def _rule(axis_size, in_batched, tiles, flat, li0, li1, lj0, lj1):
        assert not in_batched[0], (
            "corner_taps: the tile bank must be closed over unbatched")
        # normalize any extra leading dims (nested vmap) to one batch axis
        shape = li0.shape[:-1]
        fl = flat.reshape(-1)
        l2 = [a.reshape(-1, a.shape[-1]) for a in (li0, li1, lj0, lj1)]
        if impl == "pallas_fused":
            outs = tile_taps_fused(tiles, fl, *l2)
        else:
            rows = jnp.take(tiles, fl, axis=0)
            outs = patch_taps_rows(rows, *l2)
        outs = tuple(o.reshape(shape + (6,)) for o in outs)
        return outs, (True, True, True, True)

    return corner_taps


_CORNER_TAPS = {}


def make_tile_tap_sampler(tiles: jnp.ndarray, flat, patch_ij: jnp.ndarray,
                          n: int, half_extent: float, zscale,
                          impl: str = "pallas_rows"):
    """make_patch_sampler with the gather+taps routed through a Pallas
    kernel under vmap (round 5 — the roofline's named fix: fuse the tile
    gather into the tap reduction instead of materializing the (B, P*P)
    gather output in HBM). Bit-identical to make_patch_sampler
    (tests/unit/test_patch_sampler.py::TestPallasTapParity); interpolation
    math below is copied verbatim."""
    P = TILE_SIZE
    if impl not in _CORNER_TAPS:
        _CORNER_TAPS[impl] = _make_corner_taps(impl)
    corner_taps = _CORNER_TAPS[impl]

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

        ci_i = patch_ij[0]
        cj_i = patch_ij[1]
        t00, t01, t10, t11 = corner_taps(
            tiles, flat,
            jnp.clip(i0 - ci_i, 0, P - 1), jnp.clip(i1 - ci_i, 0, P - 1),
            jnp.clip(j0 - cj_i, 0, P - 1), jnp.clip(j1 - cj_i, 0, P - 1))

        h01 = t00 * (1 - fx) + t01 * fx          # row i0
        h23 = t10 * (1 - fx) + t11 * fx          # row i1
        h = (h01 * (1 - fy) + h23 * fy) * zscale

        cell = 2.0 * half_extent / max(n - 1, 1)   # n=1: one flat cell
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
