"""Sensors (batched depth cameras).

Importing registers the standard sensors in the ComponentRegistry (the
reference registers its RGBD sensor the same way).
"""
from openballbot_rl_tpu.sensors.depth import (
    CAM_POS_B, CAM_ROT_B, DepthCameraConfig, DepthCameras)


def _register() -> None:
    from openballbot_rl_tpu.core.registry import ComponentRegistry

    for name in ("rgbd", "depth_cameras"):
        try:
            ComponentRegistry.register_sensor(name, DepthCameras)
        except ValueError:
            pass

_register()
del _register

__all__ = ["DepthCameras", "DepthCameraConfig", "CAM_POS_B", "CAM_ROT_B"]
