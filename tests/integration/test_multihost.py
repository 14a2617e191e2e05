"""2-process jax.distributed training test (CPU, localhost coordinator).

The DCN-path analogue of test_sharding.py: two OS processes, each with two
virtual CPU devices, form one 4-device global mesh via
jax.distributed.initialize and run real cli/train.py iterations through the
`multihost:` config path (the SubprocVecEnv layer being replaced —
reference ballbot_rl/training/train.py:82-97). Asserts both processes
complete, write run artifacts, and compute bit-identical replicated metrics.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.integration, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORKER = os.path.join(REPO, "tests", "integration", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # gloo's default interface discovery fails in containers; pin loopback
    env["GLOO_SOCKET_IFNAME"] = "lo"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_training(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    # ONE shared run dir for both processes: orbax multihost saves are
    # collective into the same path (per-process paths deadlock the save —
    # the non-primary waits forever for its own array_metadatas dir)
    run_dir = tmp_path / "run"
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(run_dir)],
            env=_worker_env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))

    results = {}
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {pid} timed out (distributed deadlock?)")
        assert proc.returncode == 0, (
            f"process {pid} failed\nstdout:\n{out[-3000:]}\n"
            f"stderr:\n{err[-3000:]}")
        line = [ln for ln in out.splitlines()
                if ln.startswith("MULTIHOST_RESULT ")]
        assert line, f"process {pid} printed no result\n{out[-2000:]}"
        results[pid] = json.loads(line[-1][len("MULTIHOST_RESULT "):])

    a, b = results[0], results[1]
    assert a["iterations"] == b["iterations"] == 3
    assert a["total_timesteps"] == b["total_timesteps"] == 192
    # SPMD: replicated metrics must be identical across processes
    for k in ("pg_loss", "value_loss", "approx_kl"):
        assert a[k] == b[k], f"{k} differs across processes: {a[k]} vs {b[k]}"
    # primary-written run artifacts + the collectively saved final checkpoint
    assert (run_dir / "progress.csv").exists()
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "final_model").exists()
