from obman_train_tpu.models.mano import (
    ManoParams,
    mano_forward,
    mano_params_from_assets,
)
from obman_train_tpu.models.resnet import (
    ResNet,
    import_torch_state_dict,
    resnet18,
    resnet50,
)
from obman_train_tpu.models.branches import (
    AbsoluteBranch,
    AtlasBranch,
    ManoBranch,
    PointGenCon,
    PointGenConResidual,
)
from obman_train_tpu.models.handnet import BatchSpec, HandNet, build_handnet
from obman_train_tpu.models.losses import compute_atlas_loss, compute_mano_loss

__all__ = [
    "ManoParams",
    "mano_forward",
    "mano_params_from_assets",
    "ResNet",
    "resnet18",
    "resnet50",
    "import_torch_state_dict",
    "AbsoluteBranch",
    "AtlasBranch",
    "ManoBranch",
    "PointGenCon",
    "PointGenConResidual",
    "BatchSpec",
    "HandNet",
    "build_handnet",
    "compute_atlas_loss",
    "compute_mano_loss",
]
