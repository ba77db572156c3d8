from .export import (
    plane_map_to_meshes,
    write_ply,
    depth_to_pointcloud,
    plot_topdown,
)

__all__ = [
    "plane_map_to_meshes",
    "write_ply",
    "depth_to_pointcloud",
    "plot_topdown",
]
