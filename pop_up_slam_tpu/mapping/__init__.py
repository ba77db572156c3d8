from .landmark_store import (
    LandmarkStore,
    insert_landmarks,
    update_extents,
)

__all__ = ["LandmarkStore", "insert_landmarks", "update_extents"]
