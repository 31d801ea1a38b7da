from fastmatch_tpu.core.containers import (
    Descriptors,
    Keypoints,
    Matches,
    pad_to_capacity,
)
from fastmatch_tpu.core.lie import SE3, SO3
from fastmatch_tpu.core.camera import Fisheye, Pinhole

__all__ = [
    "Descriptors",
    "Keypoints",
    "Matches",
    "pad_to_capacity",
    "SE3",
    "SO3",
    "Fisheye",
    "Pinhole",
]
