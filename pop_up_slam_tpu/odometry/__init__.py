"""Odometry sources for the SLAM front-end.

``plane_vo`` — frame-to-frame plane-alignment visual odometry (the
TPU-native replacement for the reference's external-odometry / LSD-SLAM
pose priors, paper arXiv:1703.07334 §V).
"""

from .plane_vo import (  # noqa: F401
    PlaneVOConfig,
    PlaneVOResult,
    align_planes,
    match_planes,
    plane_vo_step,
)
