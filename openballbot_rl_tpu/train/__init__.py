from openballbot_rl_tpu.train.ppo import PPO, PPOConfig, RunnerState
from openballbot_rl_tpu.train.sac import SAC, SACConfig, SACRunnerState
from openballbot_rl_tpu.train.schedules import lr_schedule

__all__ = ["PPO", "PPOConfig", "RunnerState", "lr_schedule"]
