from .data_association import (
    AssocConfig,
    AssocResult,
    associate_detections,
    landmark_scores,
)

__all__ = [
    "AssocConfig",
    "AssocResult",
    "associate_detections",
    "landmark_scores",
]
