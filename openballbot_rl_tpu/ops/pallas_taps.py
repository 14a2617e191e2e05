"""Pallas TPU kernels for the terrain tap hot path (round 5).

The blind step's measured ceiling is the patch-physics variant (12.6M
env steps/s vs 8.7M delivered — docs/guides/performance.md roofline);
the gap is the stateless tile supply: per step XLA gathers a (B, 1024)
f32 tile row per env (~134 MB at B=32768, 0.76 ms), MATERIALIZES it in
HBM, then re-reads it for the 24 one-hot tap reductions (0.73 ms).
These kernels fuse the two:

  * `patch_taps_rows` — taps on pre-gathered rows: one pass over the
    (B, 1024) rows in VMEM with a row/column-factorized one-hot (12
    sublane-masked passes instead of XLA's 24 flat-mask passes), no HBM
    round-trip for intermediates.
  * `tile_taps_fused` — the full fusion: per-env tile rows are DMA'd
    HBM->VMEM inside the kernel (per-env `make_async_copy` from the
    flat row index), so the gather output never exists in HBM at all.

Exactness: every tap is a one-hot selection — exactly one mask element
is nonzero, `where` passes the selected f32 through untouched, and
adding zeros is exact in any accumulation order — so both kernels are
bit-identical to hfield.make_patch_sampler's taps
(tests/unit/test_pallas_taps.py pins this, and test_patch_sampler pins
the sampler built on top against make_sampler).

Reference counterpart: none — the reference's terrain queries are
MuJoCo's C heightfield collision (SURVEY.md section 2.1 #12); this is
the TPU-native replacement for its hot path, SURVEY.md section 7 step 1
("Pallas kernels where XLA fusion is insufficient").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

P = 32                      # physics tile side (hfield.TILE_SIZE)
PP = P * P


def _default_interpret() -> bool:
    # CPU tests (and the virtual-device suite) run the same kernels through
    # the Pallas interpreter; on TPU they compile with Mosaic.
    return jax.default_backend() != "tpu"


def _taps_body(rows, li0, li1, lj0, lj1):
    """One-hot taps on in-VMEM (BLK, P*P) tile rows, FLAT layout.

    li0/li1/lj0/lj1: (BLK, 6) int32 local patch coords (pre-clamped to
    [0, P-1] by the caller, same as make_patch_sampler).
    Returns (BLK, 24) f32: [t00 | t01 | t10 | t11] blocks of 6.

    Stays in the rows' native (BLK, 1024) layout — 1024 = 8 sublanes x
    128 lanes exactly, full VPU utilization — because Mosaic rejects the
    (BLK, 1024) -> (BLK, 32, 32) shape cast the factorized row/column
    formulation needs (infer-vector-layout: unsupported shape cast, seen
    on v5e). The flat one-hot is the same formulation the production XLA
    path uses (hfield.make_patch_sampler), so bit-parity is structural.
    """
    BLK = rows.shape[0]
    cell = jax.lax.broadcasted_iota(jnp.int32, (BLK, PP), 1)

    def corner(ii, jj):
        cols = []
        for k in range(6):                  # static unroll: 6 query points
            f = (ii[:, k] * P + jj[:, k])[:, None]           # (BLK, 1)
            cols.append(jnp.sum(jnp.where(cell == f, rows, 0.0), axis=1))
        return cols

    return jnp.stack(corner(li0, lj0) + corner(li0, lj1)
                     + corner(li1, lj0) + corner(li1, lj1),
                     axis=1)                                 # (BLK, 24)


def _rows_kernel(rows_ref, li0_ref, li1_ref, lj0_ref, lj1_ref, out_ref):
    out_ref[:] = _taps_body(rows_ref[:], li0_ref[:], li1_ref[:],
                            lj0_ref[:], lj1_ref[:])


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def patch_taps_rows(rows, li0, li1, lj0, lj1, block: int = 256,
                    interpret: bool | None = None):
    """Bilinear corner taps from pre-gathered tile rows.

    rows: (B, P*P) f32 — each env's tile row (jnp.take of bank.tiles).
    li0/li1/lj0/lj1: (B, 6) int32 local (clamped) patch coordinates.
    Returns t00, t01, t10, t11: each (B, 6) f32, bit-equal to
    rows[b, li*P + lj].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = rows.shape[0]
    if interpret is None:
        interpret = _default_interpret()
    blk = min(block, B)
    if B % blk:                              # odd batch: single block
        blk = B
    grid = (B // blk,)
    ispec = pl.BlockSpec((blk, 6), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _rows_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 24), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((blk, PP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  ispec, ispec, ispec, ispec],
        out_specs=pl.BlockSpec((blk, 24), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, li0, li1, lj0, lj1)
    return out[:, 0:6], out[:, 6:12], out[:, 12:18], out[:, 18:24]


def _fused_kernel(flat_ref, li0_ref, li1_ref, lj0_ref, lj1_ref,
                  tiles_ref, out_ref, scratch, sems):
    """DMA-gather each env's tile row HBM->VMEM, then tap in VMEM.

    tiles_ref is the bank viewed as (R, 8, 128): with the row split into
    one (sublane, lane) tile, dim 0 is UNTILED, so a single-row DMA slice
    is legal (the 2-D (R, 1024) view is tiled (8, 128) along its own dims
    and Mosaic requires dim-0 slices in multiples of 8). The taps then
    run on the (blk, 8, 128) scratch with a 3-D iota — no shape casts.
    """
    from jax.experimental.pallas import tpu as pltpu

    blk = scratch.shape[0]

    def start(b, _):
        pltpu.make_async_copy(tiles_ref.at[flat_ref[b, 0]],
                              scratch.at[b], sems.at[b]).start()
        return _

    def wait(b, _):
        pltpu.make_async_copy(tiles_ref.at[flat_ref[b, 0]],
                              scratch.at[b], sems.at[b]).wait()
        return _

    jax.lax.fori_loop(0, blk, start, None)
    jax.lax.fori_loop(0, blk, wait, None)

    rows = scratch[:]                                       # (blk, 8, 128)
    lanes = rows.shape[-1]
    cell = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) * lanes
            + jax.lax.broadcasted_iota(jnp.int32, rows.shape, 2))

    def corner(ii, jj):
        cols = []
        for k in range(6):                  # static unroll: 6 query points
            f = (ii[:, k] * P + jj[:, k])[:, None, None]    # (blk, 1, 1)
            masked = jnp.where(cell == f, rows, 0.0)
            # reduce one axis at a time: Mosaic's layout inference aborts
            # (layout.h check) on a rank-3 multi-axis reduction here
            cols.append(jnp.sum(jnp.sum(masked, axis=2), axis=1))
        return cols

    li0, li1 = li0_ref[:], li1_ref[:]
    lj0, lj1 = lj0_ref[:], lj1_ref[:]
    out_ref[:] = jnp.stack(corner(li0, lj0) + corner(li0, lj1)
                           + corner(li1, lj0) + corner(li1, lj1), axis=1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def tile_taps_fused(tiles, flat, li0, li1, lj0, lj1, block: int = 256,
                    interpret: bool | None = None):
    """Fused tile-row gather + bilinear corner taps.

    tiles: (R, P*P) f32 tile bank, resident in HBM (never materialized as
    a (B, P*P) gather output). flat: (B,) int32 tile row per env.
    Returns t00, t01, t10, t11: each (B, 6) f32, bit-equal to
    tiles[flat[b], li*P + lj].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = flat.shape[0]
    if interpret is None:
        interpret = _default_interpret()
    blk = min(block, B)
    if B % blk:
        blk = B
    grid = (B // blk,)
    ispec = pl.BlockSpec((blk, 6), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 24), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((blk, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  ispec, ispec, ispec, ispec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((blk, 24), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((blk, 8, PP // 8), jnp.float32),
                        pltpu.SemaphoreType.DMA((blk,))],
        interpret=interpret,
    )(flat.reshape(B, 1).astype(jnp.int32), li0, li1, lj0, lj1,
      tiles.reshape(tiles.shape[0], 8, PP // 8))
    return out[:, 0:6], out[:, 6:12], out[:, 12:18], out[:, 18:24]


def taps_reference(rows, li0, li1, lj0, lj1):
    """The XLA production formulation (hfield.make_patch_sampler's flat
    one-hot), batched — the bit-exactness oracle for both kernels."""
    cells = jnp.arange(PP, dtype=jnp.int32)

    def corner(ii, jj):
        m = (ii * P + jj)[..., None] == cells          # (B, 6, PP)
        return jnp.sum(jnp.where(m, rows[:, None, :], 0.0), axis=-1)

    return (corner(li0, lj0), corner(li0, lj1),
            corner(li1, lj0), corner(li1, lj1))
