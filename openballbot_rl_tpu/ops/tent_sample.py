"""Fused tent-weight (exact bilinear) grid sampling — Pallas TPU kernel.

The depth renderer (sensors/depth.py render_patch) samples a local terrain
patch at M polar points per camera via tent-weight einsum:

    h[m] = sum_{r,c} max(0, 1-|gr[m]-r|) * max(0, 1-|gc[m]-c|) * patch[r,c]

The kernel generates the weights in VMEM per M-block, runs the row
contraction on the MXU, and reduces against the column weights in-register,
so HBM only sees the patch (P^2), the coordinates (2M), and the output (M)
— versus XLA materializing the (B, M, P) weight operands.

STATUS — experimental, NOT the production path. Verified bit-exact against
the einsum both in interpret mode and compiled on a v5e chip, but currently
~1000x SLOWER than the XLA einsum there (B=1024, M=4608, P=118: 12.7 s vs
35 ms): per-program cost under the sequential TPU grid is ~1.4 ms
regardless of block size, which needs a device profile to diagnose — not
available over this environment's remote-compile relay. The renderer keeps
the einsum; this op stays as the correctness-tested starting point for
kernel tuning with local profiling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(gr_ref, gc_ref, patch_ref, out_ref, *, block_m: int, p: int):
    gr = gr_ref[0]                              # (block_m,)
    gc = gc_ref[0]
    patch = patch_ref[...]                      # (p, p) padded
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, p), 1).astype(
        jnp.float32)
    wr = jnp.maximum(0.0, 1.0 - jnp.abs(gr[:, None] - cols))
    wc = jnp.maximum(0.0, 1.0 - jnp.abs(gc[:, None] - cols))
    t = jnp.dot(wr, patch, preferred_element_type=jnp.float32)  # (block_m, p)
    out_ref[0] = jnp.sum(t * wc, axis=1)


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def tent_sample(gr: jnp.ndarray, gc: jnp.ndarray, patch: jnp.ndarray,
                block_m: int = 512, interpret: bool = False) -> jnp.ndarray:
    """h (M,) = bilinear(patch)(gr, gc) with gr/gc in grid coordinates.

    gr, gc: (M,) float32 clipped to [0, P-1]; patch: (P, P) float32.
    Supports vmap (leading batch dims become extra grid dimensions). The
    patch is zero-padded to TPU tile multiples (8, 128); padding columns can
    never receive tent weight because coordinates are clipped to P-1.
    """
    (m,) = gr.shape
    p = patch.shape[-1]
    m_pad = _round_up(m, block_m)
    p128 = _round_up(p, 128)
    if m_pad != m:
        gr = jnp.pad(gr, (0, m_pad - m))
        gc = jnp.pad(gc, (0, m_pad - m))
    # pad the patch to full tile width; the tent weights span p128 columns
    # but padding cells never receive weight (coordinates clip to p-1)
    patch_p = jnp.pad(patch, ((0, p128 - p), (0, p128 - p)))
    out = pl.pallas_call(
        functools.partial(_kernel, block_m=block_m, p=p128),
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((1, block_m), lambda i: (0, i)),
            pl.BlockSpec((1, block_m), lambda i: (0, i)),
            pl.BlockSpec((p128, p128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        interpret=interpret,
    )(gr[None, :], gc[None, :], patch_p)
    return out[0, :m]


def tent_sample_ref(gr, gc, patch):
    """XLA einsum reference (the renderer's current formulation)."""
    p = patch.shape[-1]
    idx = jnp.arange(p, dtype=jnp.float32)
    wr = jnp.maximum(0.0, 1.0 - jnp.abs(gr[:, None] - idx[None, :]))
    wc = jnp.maximum(0.0, 1.0 - jnp.abs(gc[:, None] - idx[None, :]))
    return jnp.einsum("mr,rc,mc->m", wr, patch, wc,
                      preferred_element_type=jnp.float32)


def _kernel_batched(gr_ref, gc_ref, patch_ref, out_ref, *, block_m: int,
                    p: int):
    gr = gr_ref[0, 0]                           # (block_m,)
    gc = gc_ref[0, 0]
    patch = patch_ref[0]                        # (p, p)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, p), 1).astype(
        jnp.float32)
    wr = jnp.maximum(0.0, 1.0 - jnp.abs(gr[:, None] - cols))
    wc = jnp.maximum(0.0, 1.0 - jnp.abs(gc[:, None] - cols))
    t = jnp.dot(wr, patch, preferred_element_type=jnp.float32)
    out_ref[0, 0] = jnp.sum(t * wc, axis=1)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def tent_sample_batched(grs: jnp.ndarray, gcs: jnp.ndarray,
                        patches: jnp.ndarray, block_m: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """Batched form: grs/gcs (B, M), patches (B, P, P) -> (B, M).

    The batch rides the FIRST pallas grid dimension (vmap of the single-env
    kernel serializes into per-env dispatches — ~1000x slower)."""
    b, m = grs.shape
    p = patches.shape[-1]
    m_pad = _round_up(m, block_m)
    p128 = _round_up(p, 128)
    if m_pad != m:
        grs = jnp.pad(grs, ((0, 0), (0, m_pad - m)))
        gcs = jnp.pad(gcs, ((0, 0), (0, m_pad - m)))
    patches_p = jnp.pad(patches, ((0, 0), (0, p128 - p), (0, p128 - p)))
    # operands carry a singleton middle dim so every block's trailing two
    # dims satisfy the TPU (8, 128) tiling rule (1 == overall dim)
    out = pl.pallas_call(
        functools.partial(_kernel_batched, block_m=block_m, p=p128),
        grid=(b, m_pad // block_m),
        in_specs=[
            pl.BlockSpec((1, 1, block_m), lambda bi, mi: (bi, 0, mi)),
            pl.BlockSpec((1, 1, block_m), lambda bi, mi: (bi, 0, mi)),
            pl.BlockSpec((1, p128, p128), lambda bi, mi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_m), lambda bi, mi: (bi, 0, mi)),
        out_shape=jax.ShapeDtypeStruct((b, 1, m_pad), jnp.float32),
        interpret=interpret,
    )(grs[:, None, :], gcs[:, None, :], patches_p)
    return out[:, 0, :m]
