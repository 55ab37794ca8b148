from obman_train_tpu.simulation.simulate import full_simul, run_simulation
from obman_train_tpu.simulation.intersect import intersect_vox
from obman_train_tpu.simulation.savemano import load_batch_info, save_obj

__all__ = [
    "run_simulation",
    "full_simul",
    "intersect_vox",
    "load_batch_info",
    "save_obj",
]
