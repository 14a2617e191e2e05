"""Depth-image dataset (reference: ballbot_rl/data/{dataset,utils}.py).

Primary format is npz arrays (device-friendly); the PNG-tree walkers mirror
the reference's /tmp/log_* layout for interop.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Sequence

import numpy as np


class DepthImageDataset:
    """(N, C, H, W) float32 in [0, 1] with train-loop conveniences.

    Reference counterpart: ballbot_rl/data/dataset.py:8-41 (a torch Dataset
    over PNG paths returning (1, H, W)/255).
    """

    def __init__(self, frames: np.ndarray):
        frames = np.asarray(frames, np.float32)
        if frames.ndim == 3:
            frames = frames[:, None]
        assert frames.ndim == 4, "expected (N, C, H, W)"
        self.frames = frames

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, i):
        return self.frames[i]

    @classmethod
    def from_npz(cls, *paths: str) -> "DepthImageDataset":
        return cls(np.concatenate(
            [np.load(p)["frames"] for p in paths], axis=0))

    @classmethod
    def from_png_tree(cls, *roots: str) -> "DepthImageDataset":
        paths: List[str] = []
        for r in roots:
            paths += collect_depth_image_paths(r)
        return cls(load_depth_images(paths))

    def merge(self, other: "DepthImageDataset") -> "DepthImageDataset":
        """Concatenation (reference dataset.py:35-41)."""
        return DepthImageDataset(
            np.concatenate([self.frames, other.frames], axis=0))


def collect_depth_image_paths(root: str) -> List[str]:
    """Walk <root>/**/rgbd_log_episode_*/depth/*.png (reference
    data/utils.py:8-41 layout)."""
    pats = [os.path.join(root, "rgbd_log_episode_*", "depth", "*.png"),
            os.path.join(root, "log_*", "rgbd_log_episode_*", "depth", "*.png")]
    out: List[str] = []
    for p in pats:
        out += sorted(glob.glob(p))
    return out


def load_depth_images(paths: Sequence[str]) -> np.ndarray:
    """PNG paths -> (N, 1, H, W) float32 / 255 (reference data/utils.py:44-56)."""
    from PIL import Image

    ims = [np.asarray(Image.open(p).convert("L"), np.float32) / 255.0
           for p in paths]
    return np.stack(ims)[:, None]
