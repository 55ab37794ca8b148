from obman_train_tpu.assets.icosphere import icosphere
from obman_train_tpu.assets.contact_zones import (
    load_contact_zones,
    zone_masks,
    TIP_VERT_IDS,
)
from obman_train_tpu.assets.mano_assets import (
    ManoAssets,
    load_mano_assets,
    synthetic_mano_assets,
)
from obman_train_tpu.assets.laplacian import cotangent_laplacian

__all__ = [
    "icosphere",
    "load_contact_zones",
    "zone_masks",
    "TIP_VERT_IDS",
    "ManoAssets",
    "load_mano_assets",
    "synthetic_mano_assets",
    "cotangent_laplacian",
]
