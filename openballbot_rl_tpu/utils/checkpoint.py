"""Full-state checkpointing with exact resume (orbax).

Unlike the reference's SB3 zips — which drop optimizer schedule position, env
RNG streams, and terrain state (SURVEY.md §5.4) — a checkpoint here is the
complete RunnerState pytree (params, optimizer state, env states incl. physics
+ RNG keys, global step), so a restored run continues bit-exactly.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, runner_state: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # Leave jax.Array leaves as-is: orbax saves sharded arrays natively
    # (each process writes its addressable shards). A host np.asarray here
    # would raise under multihost training, where env-state leaves are not
    # fully addressable per process (round-1 advisor finding).
    ckptr.save(path, runner_state, force=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (a RunnerState template).

    Restore is sharding-aware, symmetric with save: each jax.Array leaf of
    `target` contributes its sharding/dtype via construct_restore_args, so a
    checkpoint written by a sharded (multi-device or multihost) run restores
    directly as sharded arrays — no full-array-per-process materialization
    (round-2 advisor finding: the previous np.asarray path restored replicated
    host arrays and would fail on non-addressable multihost leaves).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    restored = ckptr.restore(path, item=target, restore_args=restore_args)
    return jax.tree.map(
        lambda t, r: r if isinstance(r, jax.Array)
        else jax.numpy.asarray(r, getattr(t, "dtype", None)),
        target, restored)


def load_params_raw(path: str) -> Any:
    """Load just the `params` subtree of a saved RunnerState checkpoint
    without needing a full template (for eval/collect/visualization CLIs).

    Falls back to a host (numpy) restore when the template-free device
    restore refuses — orbax requires concrete shardings to deserialize a
    checkpoint written on another backend, so evaluating a TPU-trained
    checkpoint from a CPU process (CI, local analysis while the chip is
    busy) lands in the fallback; jit device-puts the numpy leaves on use.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        tree = ckptr.restore(path)
    except ValueError:
        import numpy as np

        meta = ckptr.metadata(path).item_metadata
        meta = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        tree = ckptr.restore(path, restore_args=restore_args)
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"]
    return tree
