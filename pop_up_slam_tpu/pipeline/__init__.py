from .slam import (
    FrameDetections,
    SlamConfig,
    SlamState,
    detections_from_popup,
    slam_init,
    slam_step,
    current_pose,
)
from .pipelined import make_stages, run_pipelined
from .offline import (
    VOState,
    make_chunked_runner,
    make_chunked_vo_runner,
    make_frame_fn,
    make_vo_frame_fn,
    run_sequence_chunked,
    vo_init,
)
from .batched import (
    dead_reckon,
    make_batched_runner,
    run_sequence_batched,
)

__all__ = [
    "FrameDetections",
    "SlamConfig",
    "SlamState",
    "detections_from_popup",
    "slam_init",
    "slam_step",
    "current_pose",
    "make_stages",
    "run_pipelined",
    "make_chunked_runner",
    "make_chunked_vo_runner",
    "make_frame_fn",
    "make_vo_frame_fn",
    "run_sequence_chunked",
    "VOState",
    "vo_init",
    "dead_reckon",
    "make_batched_runner",
    "run_sequence_batched",
]
