from obman_train_tpu.ops.rotations import rodrigues, rotmat_to_axis_angle
from obman_train_tpu.ops.chamfer import (
    batch_pairwise_sqdist,
    chamfer_loss,
    chamfer_min_sqdist,
)
from obman_train_tpu.ops.inside import batch_mesh_contains_points
from obman_train_tpu.ops.mesh import edge_loss, laplacian_loss, meshiou
from obman_train_tpu.ops.contact import compute_contact_loss

__all__ = [
    "rodrigues",
    "rotmat_to_axis_angle",
    "batch_pairwise_sqdist",
    "chamfer_loss",
    "chamfer_min_sqdist",
    "batch_mesh_contains_points",
    "edge_loss",
    "laplacian_loss",
    "meshiou",
    "compute_contact_loss",
]
