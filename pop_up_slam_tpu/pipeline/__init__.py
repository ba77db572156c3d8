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
    FusedVOState,
    VOState,
    fused_vo_init,
    make_chunked_fused_vo_runner,
    make_chunked_runner,
    make_chunked_vo_runner,
    make_frame_fn,
    make_fused_vo_frame_fn,
    make_vo_frame_fn,
    run_sequence_chunked,
    run_sequence_with,
    vo_init,
)
from .batched import (
    dead_reckon,
    make_batched_runner,
    run_sequence_batched,
)
from .sharded import (
    make_distributed_solve,
    make_sharded_runner,
    run_sequence_sharded,
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
    "run_sequence_with",
    "VOState",
    "vo_init",
    "FusedVOState",
    "fused_vo_init",
    "make_fused_vo_frame_fn",
    "make_chunked_fused_vo_runner",
    "dead_reckon",
    "make_batched_runner",
    "run_sequence_batched",
    "make_distributed_solve",
    "make_sharded_runner",
    "run_sequence_sharded",
]
