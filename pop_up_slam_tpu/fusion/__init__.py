from .depth_fusion import (
    DepthFilter,
    init_from_popup,
    fuse_observation,
    align_scale,
    propagate_to_frame,
)

__all__ = [
    "DepthFilter",
    "init_from_popup",
    "fuse_observation",
    "align_scale",
    "propagate_to_frame",
]
