from obman_train_tpu.ops.pallas.chamfer_kernel import pallas_chamfer_min_sqdist
from obman_train_tpu.ops.pallas.raytri_kernel import pallas_mesh_contains_points

__all__ = ["pallas_chamfer_min_sqdist", "pallas_mesh_contains_points"]
