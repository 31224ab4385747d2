from dynam3d_tpu.geom.projection import (
    unproject_depth_habitat,
    patch_3d_info,
    frustum_mask_habitat,
    frustum_mask_intrinsics,
    habitat_to_world,
    heading_from_positions,
    ray_grid_habitat,
    single_distance_ray_grid,
)

__all__ = [
    "unproject_depth_habitat",
    "patch_3d_info",
    "frustum_mask_habitat",
    "frustum_mask_intrinsics",
    "habitat_to_world",
    "heading_from_positions",
    "ray_grid_habitat",
    "single_distance_ray_grid",
]
