from obman_train_tpu.visualize.viz2d import visualize_joints_2d
from obman_train_tpu.visualize.displaymano import (
    save_pck_img,
    visualize_batch,
)

__all__ = ["visualize_joints_2d", "visualize_batch", "save_pck_img"]
