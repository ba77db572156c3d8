from .landmark_store import (
    LandmarkStore,
    evict_landmarks,
    insert_landmarks,
    merge_landmarks,
    update_extents,
)

__all__ = [
    "LandmarkStore",
    "evict_landmarks",
    "insert_landmarks",
    "merge_landmarks",
    "update_extents",
]
