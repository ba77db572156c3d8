from .distributed import (
    make_mesh,
    pad_factors_for_sharding,
    sharded_linearize,
    distributed_gn_solve,
    sharded_popup,
)

__all__ = [
    "make_mesh",
    "pad_factors_for_sharding",
    "sharded_linearize",
    "distributed_gn_solve",
    "sharded_popup",
]
