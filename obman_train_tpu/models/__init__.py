from obman_train_tpu.models.mano import (
    ManoParams,
    mano_forward,
    mano_params_from_assets,
)

__all__ = ["ManoParams", "mano_forward", "mano_params_from_assets"]
