from .graph import (
    OdomFactors,
    PlaneFactors,
    PosePriors,
    Window,
    odom_residual,
    plane_residual,
    prior_residual,
    linearize,
    Linearization,
    total_cost,
)
from .robust import RobustConfig, RobustKernel

__all__ = [
    "RobustConfig",
    "RobustKernel",
    "OdomFactors",
    "PlaneFactors",
    "PosePriors",
    "Window",
    "odom_residual",
    "plane_residual",
    "prior_residual",
    "linearize",
    "Linearization",
    "total_cost",
]
