"""Visualization suite (reference: ballbot_rl/visualization/)."""
from openballbot_rl_tpu.viz.scene import render_scene, save_video

__all__ = ["render_scene", "save_video"]
