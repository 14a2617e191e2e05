"""Platform/device selection helpers.

This environment registers an experimental TPU PJRT plugin ("axon") from
sitecustomize in every interpreter and pins jax_platforms to "axon,cpu";
plugin initialization goes through a network relay and can stall. Dev tools
and tests that want pure host execution must override the platform *via
jax.config* (env vars are too late — jax is already imported at interpreter
start) before the first backend use.
"""
from __future__ import annotations

import os


def force_cpu(virtual_devices: int | None = None) -> None:
    """Force the CPU backend; optionally expose N virtual host devices.

    Must be called before any JAX computation/device query in the process.
    Safe to call multiple times.
    """
    if virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={virtual_devices}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
