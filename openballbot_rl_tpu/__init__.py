"""openballbot-rl-tpu: TPU-native ballbot RL framework (JAX/XLA/Pallas/pjit).

A from-scratch reimplementation of the capabilities of the reference
`openballbot-rl` project (MuJoCo + SB3 PPO, CPU/GPU) as a TPU-first framework:
device-resident batched physics, jit-compiled env + PPO learner, sharded over
`jax.sharding.Mesh` for pod-scale training.

Importing this package registers all standard components (rewards, terrains)
in the ComponentRegistry, mirroring the reference's import side effect
(ballbot_gym/__init__.py:36-53).
"""
__version__ = "0.1.0"

# Component registration side effects (reference: ballbot_gym/__init__.py:43-53)
import openballbot_rl_tpu.rewards  # noqa: F401,E402
import openballbot_rl_tpu.terrain  # noqa: F401,E402
import openballbot_rl_tpu.nn       # noqa: F401,E402  (policies)
import openballbot_rl_tpu.sensors  # noqa: F401,E402

# Gymnasium registration side effect (ballbot_gym/__init__.py:36-53):
# `gym.make("ballbot-v0.1")` works when gymnasium is installed.
from openballbot_rl_tpu.envs.gym_adapter import register_gym_env as _reg

_reg()
del _reg
