from .slam import (
    FrameDetections,
    SlamConfig,
    SlamState,
    detections_from_popup,
    slam_init,
    slam_step,
    current_pose,
)

__all__ = [
    "FrameDetections",
    "SlamConfig",
    "SlamState",
    "detections_from_popup",
    "slam_init",
    "slam_step",
    "current_pose",
]
