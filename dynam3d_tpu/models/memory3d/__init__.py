from dynam3d_tpu.models.memory3d.state import FieldState, init_state
from dynam3d_tpu.models.memory3d.params import init_field_params
from dynam3d_tpu.models.memory3d.update import update_view, update_views, delete_from_frustum
from dynam3d_tpu.models.memory3d.query import environment_features

__all__ = [
    "FieldState",
    "init_state",
    "init_field_params",
    "update_view",
    "update_views",
    "delete_from_frustum",
    "environment_features",
]
