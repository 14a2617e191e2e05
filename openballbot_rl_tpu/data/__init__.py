"""Depth-image dataset collection and loading (reference: ballbot_rl/data/)."""
from openballbot_rl_tpu.data.collect import collect_depth_frames
from openballbot_rl_tpu.data.dataset import (
    DepthImageDataset, collect_depth_image_paths, load_depth_images)

__all__ = ["collect_depth_frames", "DepthImageDataset",
           "collect_depth_image_paths", "load_depth_images"]
