from dynam3d_tpu.ops.knn import knn_banded, knn_brute, knn_tiled, radius_mask_fill
from dynam3d_tpu.ops.nms import heatmap_nms
from dynam3d_tpu.ops.segment import (
    segment_mean,
    segment_count,
    first_free_slots,
)

__all__ = [
    "knn_banded",
    "knn_brute",
    "knn_tiled",
    "radius_mask_fill",
    "heatmap_nms",
    "segment_mean",
    "segment_count",
    "first_free_slots",
]
