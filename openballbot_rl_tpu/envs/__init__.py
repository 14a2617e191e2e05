from openballbot_rl_tpu.envs.env import (
    BallbotEnv, EnvParams, EnvState, TerrainBank, add_cam_tiles,
    make_env_from_config, make_terrain_bank)

__all__ = ["BallbotEnv", "EnvParams", "EnvState", "TerrainBank",
           "add_cam_tiles", "make_env_from_config", "make_terrain_bank"]
