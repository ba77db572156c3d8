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

__all__ = [
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
