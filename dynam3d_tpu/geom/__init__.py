from dynam3d_tpu.geom.projection import (
    unproject_depth_habitat,
    unproject_depth_intrinsics,
    patch_3d_info,
    patch_geometry_from_pose,
    scale_intrinsics,
    camera_heading_from_rotation,
    frustum_mask_habitat,
    frustum_mask_intrinsics,
    habitat_to_world,
    heading_from_positions,
    ray_grid_habitat,
    single_distance_ray_grid,
)

__all__ = [
    "unproject_depth_habitat",
    "unproject_depth_intrinsics",
    "patch_3d_info",
    "patch_geometry_from_pose",
    "scale_intrinsics",
    "camera_heading_from_rotation",
    "frustum_mask_habitat",
    "frustum_mask_intrinsics",
    "habitat_to_world",
    "heading_from_positions",
    "ray_grid_habitat",
    "single_distance_ray_grid",
]
