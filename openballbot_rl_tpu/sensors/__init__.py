from openballbot_rl_tpu.sensors.depth import (
    CAM_POS_B, CAM_ROT_B, DepthCameraConfig, DepthCameras)

__all__ = ["DepthCameras", "DepthCameraConfig", "CAM_POS_B", "CAM_ROT_B"]
