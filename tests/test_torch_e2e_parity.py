"""End-to-end forward parity: reference torch HandNet graph -> flax import.

Composes the reference's OWN vendored modules in torch — bases/resnet.py
(resnet18 + resnet50), atlasbranch.AtlasBranch (PointGenCon decoder +
trans/scale heads), absolutebranch.AbsoluteBranch — plus the ManoBranch MLP
heads (manobranch.py:55-89; the ManoLayer itself needs manopth, which isn't
installed — MANO kinematics parity is covered by tests/test_mano.py), with
random weights AND randomized BN running statistics, exports the torch
state_dict through ``import_torch_handnet``, and asserts the flax model
reproduces the full image -> features -> {center3d, scaletrans, pose, shape,
objpoints3d/objtrans/objscale} forward to <=1e-4.  This is the exact
contract the release-model import relies on (reference reload.py:35-111).

Requires /root/reference (skipped elsewhere); torch CPU is in the image.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    from obman_train_tpu.assets.icosphere import icosphere

    ico_verts, ico_faces = icosphere(3)
    # AtlasBranch builds its template via trimesh.creation.icosphere
    # (atlasbranch.py:63-76); serve our (verified-identical) icosphere.
    tm = types.ModuleType("trimesh")
    tm.creation = types.SimpleNamespace(
        icosphere=lambda subdivisions=3: types.SimpleNamespace(
            vertices=ico_verts.astype(np.float64), faces=ico_faces
        )
    )
    tm.proximity = types.SimpleNamespace()
    sys.modules.setdefault("trimesh", tm)
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from mano_train.networks.bases import resnet as ref_resnet
    from mano_train.networks.branches.absolutebranch import AbsoluteBranch
    from mano_train.networks.branches.atlasbranch import AtlasBranch

    return ref_resnet, AbsoluteBranch, AtlasBranch


def _mano_heads(feat: int, ncomps: int) -> torch.nn.Module:
    """The ManoBranch MLP + heads with the reference's attribute names
    (manobranch.py:55-89) so state_dict keys match the release layout."""
    m = torch.nn.Module()
    neurons = [feat, 1024, 256]
    layers = []
    for inp, out in zip(neurons[:-1], neurons[1:]):
        layers.append(torch.nn.Linear(inp, out))
        layers.append(torch.nn.ReLU())
    m.base_layer = torch.nn.Sequential(*layers)
    m.pose_reg = torch.nn.Linear(neurons[-1], ncomps + 3)
    m.shape_reg = torch.nn.Sequential(torch.nn.Linear(neurons[-1], 10))
    return m


def _randomize_bn_stats(model: torch.nn.Module, gen: torch.Generator):
    """Give every BN layer non-trivial running stats so the import of
    batch_stats (not just params) is exercised end to end."""
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.05)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)


@pytest.mark.parametrize("version", [18, 50])
def test_torch_handnet_forward_parity(ref_modules, version):
    import jax
    import jax.numpy as jnp

    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import AtlasConfig, ManoConfig, ModelConfig
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )
    from obman_train_tpu.train.checkpoint import import_torch_handnet

    ref_resnet, RefAbsolute, RefAtlas = ref_modules
    feat = {18: 512, 50: 2048}[version]
    ncomps = 30
    torch.manual_seed(42 + version)
    gen = torch.Generator().manual_seed(7 + version)

    # ---- reference torch graph (handnet.py:78-135 composition) ----
    net = torch.nn.Module()
    net.base_net = getattr(ref_resnet, f"resnet{version}")(pretrained=False)
    net.atlas_base_net = getattr(ref_resnet, f"resnet{version}")(pretrained=False)
    net.absolute_branch = RefAbsolute(base_neurons=[feat + 3, feat // 2], out_dim=3)
    net.scaletrans_branch = RefAbsolute(base_neurons=[feat, feat // 2], out_dim=3)
    net.mano_branch = _mano_heads(feat, ncomps)
    net.atlas_branch = RefAtlas(
        use_residual=False,
        bottleneck_size=feat,
        predict_trans=True,
        predict_scale=True,
        separate_encoder=True,
    )
    _randomize_bn_stats(net, gen)
    net.eval()

    B = 2
    img_t = torch.randn(B, 3, 64, 64, generator=gen) * 0.3
    intr = torch.tensor(
        [[[480.0, 0, 128], [0, 480, 120], [0, 0, 1]]] * B
    )

    with torch.no_grad():
        feats, _ = net.base_net(img_t)
        atlas_feats, _ = net.atlas_base_net(img_t)
        absolute_input = torch.cat(
            (intr[:, 0, 0:1], intr[:, 0, 2:3], intr[:, 1, 2:3], feats), dim=1
        )
        t_center = net.absolute_branch(absolute_input)
        t_scaletrans = net.scaletrans_branch(feats)
        t_base = net.mano_branch.base_layer(feats)
        t_pose = net.mano_branch.pose_reg(t_base)
        t_shape = net.mano_branch.shape_reg(t_base)
        t_atlas = net.atlas_branch.forward_inference(
            feats, separate_encoder_features=atlas_feats
        )

    # ---- import into flax and re-run the same graph ----
    cfg = ModelConfig(
        resnet_version=version,
        absolute_lambda=0.167,
        mano=ManoConfig(
            ncomps=ncomps, use_shape=True, lambda_joints2d=0.167,
        ),
        atlas=AtlasConfig(
            predict_trans=True, predict_scale=True, separate_encoder=True,
        ),
    )
    mano_pair = (
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    model = build_handnet(cfg, *mano_pair)
    batch = {
        "images": jnp.asarray(img_t.numpy().transpose(0, 2, 3, 1)),
        "sides": jnp.zeros((B,), jnp.int32),
        "joints3d": jnp.zeros((B, 21, 3)),
        "verts3d": jnp.zeros((B, 778, 3)),
        "objpoints3d": jnp.zeros((B, 600, 3)),
        "camintrs": jnp.asarray(intr.numpy()),
        "center3d": jnp.zeros((B, 3)),
        "joints2d": jnp.zeros((B, 21, 2)),
    }
    spec = BatchSpec(
        has_joints2d=True, has_camintrs=True, has_center3d=True
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec,
    )
    imported = import_torch_handnet(net.state_dict(), variables)

    def probe(mdl, image, camintrs, sides):
        features, _ = mdl.base_net(image, train=False)
        atlas_features, _ = mdl.atlas_base_net(image, train=False)
        absolute_input = jnp.concatenate(
            [
                camintrs[:, 0:1, 0], camintrs[:, 0:1, 2],
                camintrs[:, 1:2, 2], features,
            ],
            axis=1,
        )
        return {
            "features": features,
            "atlas_features": atlas_features,
            "center3d": mdl.absolute_branch(absolute_input),
            "scaletrans": mdl.scaletrans_branch(features),
            "mano": mdl.mano_branch(features, sides=sides),
            "atlas": mdl.atlas_branch.forward_inference(
                features, separate_encoder_features=atlas_features
            ),
        }

    with jax.default_matmul_precision("highest"):
        out = model.apply(
            imported, batch["images"], batch["camintrs"], batch["sides"],
            method=probe,
        )
        out = jax.tree_util.tree_map(np.asarray, out)

    def close(actual, desired, atol):
        np.testing.assert_allclose(actual, desired, rtol=1e-4, atol=atol)

    close(out["features"], feats.numpy(), 1e-4)
    close(out["atlas_features"], atlas_feats.numpy(), 1e-4)
    close(out["center3d"], t_center.numpy(), 1e-4)
    close(out["scaletrans"], t_scaletrans.numpy(), 1e-4)
    close(out["mano"]["pose"], t_pose.numpy(), 1e-4)
    close(out["mano"]["shape"], t_shape.numpy(), 1e-4)
    # objpoints are out_factor(=200)-scaled; 1e-4 relative of that scale
    close(out["atlas"]["objtrans"], t_atlas["objtrans"].numpy(), 1e-4)
    close(out["atlas"]["objscale"], t_atlas["objscale"].numpy(), 1e-4)
    close(
        out["atlas"]["objpointscentered3d"],
        t_atlas["objpointscentered3d"].numpy(),
        2e-2,
    )
    close(out["atlas"]["objpoints3d"], t_atlas["objpoints3d"].numpy(), 2e-2)
