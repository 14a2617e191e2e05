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
import numpy as np


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
    """Restore into the structure of `target` (a RunnerState template)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.tree.map(np.asarray, target))
    return jax.tree.map(
        lambda t, r: jax.numpy.asarray(r, getattr(t, "dtype", None)),
        target, restored)


def load_params_raw(path: str) -> Any:
    """Load just the `params` subtree of a saved RunnerState checkpoint
    without needing a full template (for eval/collect/visualization CLIs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    if isinstance(tree, dict) and "params" in tree:
        return tree["params"]
    return tree
