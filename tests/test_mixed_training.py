"""Round-robin training over datasets with different query sets — the
reference's ConcatDataloader regime (e.g. obman + stereohands), which here
compiles one step per BatchSpec (train/loop.StepCache)."""

import numpy as np

from obman_train_tpu.assets import synthetic_mano_assets
from obman_train_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from obman_train_tpu.data import (
    BaseQueries,
    BatchLoader,
    ConcatLoader,
    HandDataset,
    SyntheticDataset,
    TransQueries,
)
from obman_train_tpu.data.loader import loader_meta
from obman_train_tpu.models import build_handnet, mano_params_from_assets
from obman_train_tpu.train import create_train_state, make_optimizer
from obman_train_tpu.train.loop import StepCache, epoch_pass


def test_mixed_spec_epoch(tmp_path):
    full_queries = [
        BaseQueries.sides, TransQueries.images, TransQueries.joints3d,
        TransQueries.verts3d, TransQueries.objpoints3d,
    ]
    hands_queries = [
        BaseQueries.sides, TransQueries.images, TransQueries.joints3d,
    ]
    ds_full = HandDataset(
        SyntheticDataset(size=8, img_res=64), inp_res=64,
        queries=full_queries, train=True,
    )
    ds_hand = HandDataset(
        SyntheticDataset(size=8, img_res=64), inp_res=64,
        queries=hands_queries, train=True,
    )
    loader = ConcatLoader(
        [
            BatchLoader(ds_full, 4, num_workers=1),
            BatchLoader(ds_hand, 4, num_workers=1),
        ],
        metas=[loader_meta("obman", "train"), loader_meta("stereohands", "train")],
    )

    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    first = next(iter(loader))
    from obman_train_tpu.data.loader import derive_spec
    from obman_train_tpu.train.loop import _to_device

    tx = make_optimizer(TrainConfig(lr=1e-3))
    state = create_train_state(
        net, tx, _to_device(first), derive_spec(first), seed=0
    )
    steps = StepCache(net, tx, train_bn=False)
    state, meters, _ = epoch_pass(
        loader, net, state, steps, epoch=0, train=True
    )
    # both specs compiled and ran: palm-root hands-only batches have no
    # atlas losses, full batches do
    assert len(steps._train) == 2
    avgs = meters.averages()
    assert "mano_joints3d" in avgs and "atlas_objpoints3d" in avgs
    assert np.isfinite(avgs["total_loss"])
    assert int(state.step) == 4


def test_train_pass_display_figures(tmp_path):
    """Train passes render periodic diagnostic figures like the reference
    (epochpass3d.py:126-134): on display steps the cached eval forward
    supplies the full results tree the jitted train step omits."""
    queries = [
        BaseQueries.sides, TransQueries.images, TransQueries.joints3d,
        TransQueries.verts3d, TransQueries.objpoints3d,
    ]
    ds = HandDataset(
        SyntheticDataset(size=4, img_res=64), inp_res=64,
        queries=queries, train=True,
    )
    loader = BatchLoader(ds, 4, num_workers=1)
    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    first = next(iter(loader))
    from obman_train_tpu.data.loader import derive_spec
    from obman_train_tpu.train.loop import _to_device

    tx = make_optimizer(TrainConfig())
    state = create_train_state(
        net, tx, _to_device(first), derive_spec(first), seed=0
    )
    steps = StepCache(net, tx, train_bn=False)
    display_dir = str(tmp_path / "images" / "train" / "epoch_0")
    state, meters, _ = epoch_pass(
        loader, net, state, steps, epoch=0, train=True,
        display_dir=display_dir, display_freq=1,
    )
    import os

    assert os.path.exists(os.path.join(display_dir, "img_000000.png"))
    assert np.isfinite(meters.averages()["total_loss"])

    # --display_freq 0 disables figures (regression: used to divide by 0).
    off_dir = str(tmp_path / "images_off")
    state, meters, _ = epoch_pass(
        loader, net, state, steps, epoch=0, train=True,
        display_dir=off_dir, display_freq=0,
    )
    assert not os.path.exists(os.path.join(off_dir, "img_000000.png"))
