"""Device mesh + sharding helpers (the framework's "distribution layer").

The reference's only parallelism is N=10 OS processes stepping one MuJoCo sim
each (SB3 SubprocVecEnv, train.py:82-97; SURVEY.md §2.4). Here the env batch
axis is a sharded array axis on a `jax.sharding.Mesh`: envs live on device,
sharded over the 'data' axis; learner params are replicated (the nets are
4x128 MLPs — nothing to shard, though the mesh keeps a 'model' axis available
per SURVEY.md §2.4). Gradient reduction across shards is emitted by GSPMD as
psum over ICI; no host communication in the hot loop.

Multi-host: call `jax.distributed.initialize()` before building the mesh;
each process contributes its local devices and the same jitted program runs
SPMD across hosts (DCN carries dispatch only).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh by default; pass axis_names=("data","model") with an
    n_devices tuple-able count for a 2-D layout."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    if len(axis_names) == 1:
        arr = np.array(devices)
    else:
        # put all devices on the data axis, model axis size 1, unless the
        # caller reshapes explicitly
        arr = np.array(devices).reshape(len(devices), *([1] * (len(axis_names) - 1)))
    return Mesh(arr, axis_names)


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-env batched pytrees: leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_axis(tree, mesh: Mesh):
    """Place a pytree whose leaves all have a leading env axis."""
    s = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
