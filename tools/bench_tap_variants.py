"""Microbenchmark of patch-tap extraction formulations (round-3 task 5).

The roofline (outputs/experiments/studies/r3/roofline.json) shows the
one-hot patch sampler costs ~4.7 ms of the 6.2 ms physics step at B=32768
(flat-plane bound: 1.5 ms). This tool measures candidate formulations of
the same computation — extract the 4 bilinear taps for 6 query points from
a per-env (P, P) patch — so the production choice is driven by chip
measurements, not lowering guesses.

Variants:
  onehot_hi_p32    — production tap4 (one-hot matmuls, Precision.HIGHEST)
  onehot_hi_p16    — same, P=16 (quarter the contraction traffic)
  onehot_hi_p8     — same, P=8
  onehot_default   — same math, default dot precision (bf16 multiplies on
                     MXU would TRUNCATE values — included to measure the
                     cost of exactness; bit-compared against the exact one)
  rowgather_onehot — rows via take_along_axis (XLA gather of contiguous
                     rows), columns via one-hot masked sum
  gather_full      — both levels via take_along_axis (pure gather)
  shift_concat     — ONE one-hot matmul against [patch | rowshift(patch)]
                     + column one-hots on shifted rows (halves the one-hot
                     construction and matmul count)

Each variant runs a T-step serialized scan over B envs; prints one JSON
line per variant with steps/s of the tap extraction alone plus a
bit-equality flag vs the production formulation on the same inputs.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("TAP_ENVS", "32768"))
    T = int(os.environ.get("TAP_STEPS", "100"))
    Q = 6

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def make_inputs(P):
        patches = jax.random.uniform(k1, (B, P, P), jnp.float32)
        # queries in patch-local continuous coords, interior so every
        # variant sees identical clamp-free indices
        g = jax.random.uniform(k2, (B, Q, 2), jnp.float32,
                               minval=1.0, maxval=P - 2.0)
        i0 = jnp.floor(g[..., 0]).astype(jnp.int32)
        j0 = jnp.floor(g[..., 1]).astype(jnp.int32)
        return patches, i0, j0

    only = os.environ.get("TAP_ONLY")   # comma-separated variant filter

    def run(name, P, taps_fn, ref=None):
        if only and name not in only.split(","):
            return None
        patches, i0, j0 = make_inputs(P)

        @jax.jit
        def loop(i0):
            def f(c, _):
                i = c
                t00, t01, t10, t11 = taps_fn(patches, i, j0, P)
                s = t00 + t01 + t10 + t11
                # serialize without changing indices
                i = jnp.where(s[..., :1].astype(jnp.int32) < -1, i + 1, i)
                return i, s.mean()
            c, r = jax.lax.scan(f, i0, None, length=T)
            return c, r.mean()

        out = loop(i0)
        jax.block_until_ready(out[1])
        t0 = time.time()
        for _ in range(5):
            out = loop(i0)
        jax.block_until_ready(out[1])
        dt = (time.time() - t0) / 5
        exact = None
        if ref is not None:
            mine = taps_fn(patches, i0, j0, P)
            theirs = ref(patches, i0, j0, P)
            exact = bool(all(jnp.array_equal(a, b)
                             for a, b in zip(mine, theirs)))
        print(json.dumps({"variant": name, "P": P,
                          "env_steps_per_sec": round(B * T / dt),
                          "ms_per_batched_step": round(dt / T * 1e3, 3),
                          "bit_equal_vs_exact": exact}))
        return B * T / dt

    # --- production formulation (mirrors hfield.make_patch_sampler.tap4) ---
    def onehot_taps(precision):
        def taps(patches, i0, j0, P):
            cols = jnp.arange(P, dtype=jnp.int32)
            i1 = jnp.minimum(i0 + 1, P - 1)
            j1 = jnp.minimum(j0 + 1, P - 1)

            def one(patch, i0, i1, j0, j1):
                oi0 = (i0[:, None] == cols[None, :]).astype(patch.dtype)
                oi1 = (i1[:, None] == cols[None, :]).astype(patch.dtype)
                oj0 = (j0[:, None] == cols[None, :]).astype(patch.dtype)
                oj1 = (j1[:, None] == cols[None, :]).astype(patch.dtype)
                rows0 = jnp.matmul(oi0, patch, precision=precision)
                rows1 = jnp.matmul(oi1, patch, precision=precision)
                return (jnp.sum(rows0 * oj0, -1), jnp.sum(rows0 * oj1, -1),
                        jnp.sum(rows1 * oj0, -1), jnp.sum(rows1 * oj1, -1))

            return jax.vmap(one)(patches, i0, i1, j0, j1)
        return taps

    import jax.lax as lax
    exact_taps = onehot_taps(lax.Precision.HIGHEST)

    def rowgather_taps(patches, i0, j0, P):
        cols = jnp.arange(P, dtype=jnp.int32)
        i1 = jnp.minimum(i0 + 1, P - 1)
        j1 = jnp.minimum(j0 + 1, P - 1)

        def one(patch, i0, i1, j0, j1):
            rows0 = jnp.take_along_axis(patch, i0[:, None], axis=0)
            rows1 = jnp.take_along_axis(patch, i1[:, None], axis=0)
            oj0 = (j0[:, None] == cols[None, :]).astype(patch.dtype)
            oj1 = (j1[:, None] == cols[None, :]).astype(patch.dtype)
            return (jnp.sum(rows0 * oj0, -1), jnp.sum(rows0 * oj1, -1),
                    jnp.sum(rows1 * oj0, -1), jnp.sum(rows1 * oj1, -1))

        return jax.vmap(one)(patches, i0, i1, j0, j1)

    def gather_taps(patches, i0, j0, P):
        i1 = jnp.minimum(i0 + 1, P - 1)
        j1 = jnp.minimum(j0 + 1, P - 1)

        def one(patch, i0, i1, j0, j1):
            def tap(i, j):
                return patch[i, j]
            tap = jax.vmap(tap)
            return tap(i0, j0), tap(i0, j1), tap(i1, j0), tap(i1, j1)

        return jax.vmap(one)(patches, i0, i1, j0, j1)

    def shift_concat_taps(patches, i0, j0, P):
        cols = jnp.arange(P, dtype=jnp.int32)

        def one(patch, i0, j0):
            # row i of patch_dn = row min(i+1, P-1) of patch
            patch_dn = jnp.concatenate([patch[1:], patch[-1:]], axis=0)
            mat = jnp.concatenate([patch, patch_dn], axis=1)   # (P, 2P)
            oi0 = (i0[:, None] == cols[None, :]).astype(patch.dtype)
            rows = jnp.matmul(oi0, mat, precision=lax.Precision.HIGHEST)
            rows0, rows1 = rows[:, :P], rows[:, P:]
            # col j of *_rt = col min(j+1, P-1)
            rows0_rt = jnp.concatenate([rows0[:, 1:], rows0[:, -1:]], axis=1)
            rows1_rt = jnp.concatenate([rows1[:, 1:], rows1[:, -1:]], axis=1)
            oj0 = (j0[:, None] == cols[None, :]).astype(patch.dtype)
            return (jnp.sum(rows0 * oj0, -1), jnp.sum(rows0_rt * oj0, -1),
                    jnp.sum(rows1 * oj0, -1), jnp.sum(rows1_rt * oj0, -1))

        return jax.vmap(one)(patches, i0, j0)

    # --- aligned-tile refresh candidates (fix for the serial-while
    # extract_patch refresh: 64 ms per refresh at B=32768 in the r3
    # profile). Tiles precomputed at bank build; per-step selection is an
    # embedding-style row gather, no dynamic_slice. ---
    NT = int(os.environ.get("TAP_TILES", "20736"))   # 64 terrains x 18x18

    def bench_gather(name, fn, *args):
        @jax.jit
        def loop(idx):
            def f(i, _):
                out = fn(i, *args)
                i = jnp.where(out.reshape(out.shape[0], -1)[:, 0]
                              .astype(jnp.int32) < -1, i + 1, i)
                return i, out.sum()
            c, r = jax.lax.scan(f, idx, None, length=T)
            return c, r

        idx = jax.random.randint(k3, (B,), 0, NT)
        out = loop(idx)
        jax.block_until_ready(out[1])
        t0 = time.time()
        for _ in range(5):
            out = loop(idx)
        jax.block_until_ready(out[1])
        dt = (time.time() - t0) / 5
        print(json.dumps({"variant": name,
                          "env_steps_per_sec": round(B * T / dt),
                          "ms_per_batched_step": round(dt / T * 1e3, 3)}))

    if os.environ.get("TAP_SKIP_GATHER") != "1":
        tiles_flat = jax.random.uniform(k1, (NT, 1024), jnp.float32)
        bench_gather("tile_embed_gather_b1024",
                     lambda i, t: jnp.take(t, i, axis=0), tiles_flat)
        tiles_3d = tiles_flat.reshape(NT, 32, 32)
        bench_gather("tile_embed_gather_b32x32",
                     lambda i, t: jnp.take(t, i, axis=0), tiles_3d)
        # per-env unaligned dynamic_slice (the current refresh), for scale
        bank = jax.random.uniform(k1, (64, 293, 293), jnp.float32)

        def dynslice(i, bank):
            ti = i % 64
            ci = (i * 7) % (293 - 32)
            cj = (i * 13) % (293 - 32)

            def one(ti, ci, cj):
                return jax.lax.dynamic_slice(bank, (ti, ci, cj),
                                             (1, 32, 32))[0]

            return jax.vmap(one)(ti, ci, cj)

        bench_gather("unaligned_dynamic_slice", dynslice, bank)

    # --- end-to-end candidate: flat tile gather -> reshape -> exact taps ---
    if os.environ.get("TAP_SKIP_E2E") != "1":
        tiles_flat2 = jax.random.uniform(k1, (NT, 1024), jnp.float32)
        _, i0e, j0e = make_inputs(32)
        tidx = jax.random.randint(k3, (B,), 0, NT)

        @jax.jit
        def loop_e2e(i0):
            def f(c, _):
                i = c
                patches = jnp.take(tiles_flat2, tidx,
                                   axis=0).reshape(B, 32, 32)
                t00, t01, t10, t11 = exact_taps(patches, i, j0e, 32)
                s = t00 + t01 + t10 + t11
                i = jnp.where(s[..., :1].astype(jnp.int32) < -1, i + 1, i)
                return i, s.mean()
            c, r = jax.lax.scan(f, i0, None, length=T)
            return c, r.mean()

        out = loop_e2e(i0e)
        jax.block_until_ready(out[1])
        t0 = time.time()
        for _ in range(5):
            out = loop_e2e(i0e)
        jax.block_until_ready(out[1])
        dt = (time.time() - t0) / 5
        print(json.dumps({"variant": "tile_gather_plus_taps_e2e",
                          "env_steps_per_sec": round(B * T / dt),
                          "ms_per_batched_step": round(dt / T * 1e3, 3)}))

    def mask_reduce_taps(patches, i0, j0, P):
        """No matmuls, no materialized one-hots: each tap is a 2-D masked
        reduction whose mask is an inline iota comparison. Exactly one
        nonzero survives each reduction, so the result is bit-exact in any
        accumulation order and at any precision — the formulation exists
        to let XLA fuse mask construction + select + reduce into one pass
        over the patch."""
        ar = jnp.arange(P, dtype=jnp.int32)
        i1 = jnp.minimum(i0 + 1, P - 1)
        j1 = jnp.minimum(j0 + 1, P - 1)

        def corner(ii, jj):
            mi = ii[..., None] == ar                      # (B, Q, P)
            mj = jj[..., None] == ar
            m = mi[..., :, None] & mj[..., None, :]       # (B, Q, P, P)
            return jnp.sum(jnp.where(m, patches[:, None], 0.0), (-2, -1))

        return (corner(i0, j0), corner(i0, j1),
                corner(i1, j0), corner(i1, j1))

    def mask_rowcol_taps(patches, i0, j0, P):
        """Two-stage masked reduce: rows by mask-reduce (one pass over the
        patch), then columns by mask-reduce over the (B, Q, P) rows."""
        ar = jnp.arange(P, dtype=jnp.int32)
        i1 = jnp.minimum(i0 + 1, P - 1)
        j1 = jnp.minimum(j0 + 1, P - 1)

        def rows(ii):
            m = (ii[..., None] == ar)[..., :, None]       # (B, Q, P, 1)
            return jnp.sum(jnp.where(m, patches[:, None], 0.0), -2)

        r0, r1 = rows(i0), rows(i1)                       # (B, Q, P)

        def col(r, jj):
            return jnp.sum(jnp.where(jj[..., None] == ar, r, 0.0), -1)

        return col(r0, j0), col(r0, j1), col(r1, j0), col(r1, j1)

    run("onehot_hi_p32", 32, exact_taps)
    run("onehot_hi_p16", 16, exact_taps)
    run("onehot_hi_p8", 8, exact_taps)
    run("onehot_default", 32, onehot_taps(lax.Precision.DEFAULT),
        ref=exact_taps)
    run("rowgather_onehot", 32, rowgather_taps, ref=exact_taps)
    run("gather_full", 32, gather_taps, ref=exact_taps)
    run("shift_concat", 32, shift_concat_taps, ref=exact_taps)
    run("shift_concat_p16", 16, shift_concat_taps, ref=exact_taps)
    run("mask_reduce", 32, mask_reduce_taps, ref=exact_taps)
    run("mask_reduce_p16", 16, mask_reduce_taps, ref=exact_taps)
    run("mask_rowcol", 32, mask_rowcol_taps, ref=exact_taps)
    run("mask_rowcol_p16", 16, mask_rowcol_taps, ref=exact_taps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
