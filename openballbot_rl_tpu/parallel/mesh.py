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
              axis_names: Sequence[str] = ("data",),
              model_size: int = 1) -> Mesh:
    """1-D 'data' mesh by default; a real 2-D ('data', 'model') layout when
    axis_names has two entries and model_size > 1: devices are arranged
    (n//model_size, model_size) so neighboring devices share the model axis
    (ICI-adjacent on a TPU slice). Envs shard over 'data' only (P('data')
    replicates across 'model'); param kernels can shard over 'model' via
    `model_parallel_params`. Exercised by tests/integration/test_sharding.py
    (2-D mesh PPO iteration == single-device) and __graft_entry__."""
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    if len(axis_names) == 1:
        arr = np.array(devices)
    else:
        if len(axis_names) != 2:
            raise ValueError("meshes here are 1-D ('data') or 2-D "
                             "('data','model')")
        if len(devices) % model_size != 0:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"model_size={model_size}")
        arr = np.array(devices).reshape(len(devices) // model_size,
                                        model_size)
    return Mesh(arr, axis_names)


def model_parallel_params(tree, mesh: Mesh):
    """Shard parameter kernels over the mesh's 'model' axis.

    2-D kernels (dense layers) shard their OUTPUT dim; everything else
    (biases, log_std, conv kernels) replicates. GSPMD inserts the
    all-gathers/psums this layout implies. On a 1-D mesh this degenerates
    to replication.
    """
    if "model" not in mesh.axis_names:
        return replicate(tree, mesh)
    msize = mesh.shape["model"]

    def place(x):
        if getattr(x, "ndim", 0) == 2 and x.shape[-1] % msize == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)


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
