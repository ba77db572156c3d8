from . import se3, plane, camera
from .camera import Intrinsics

__all__ = ["se3", "plane", "camera", "Intrinsics"]
