from obman_train_tpu.native.build import load_physics_lib

__all__ = ["load_physics_lib"]
