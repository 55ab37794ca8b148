"""Torch-checkpoint import parity: layout conversions (conv OIHW->HWIO,
linear transpose, BN fields, DataParallel prefixes) verified against actual
torch execution (torch CPU is available in this image; torchvision is not,
so single-layer parity covers the risky conversions)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402


def test_conv_bn_linear_layout_parity(rng):
    """A torch conv7x7/2+BN+relu+pool+linear stack must produce the same
    output as the flax stack after weight import conversions."""
    tconv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    tbn = torch.nn.BatchNorm2d(8)
    tfc = torch.nn.Linear(8, 5)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.randn(8) * 0.1)
        tbn.running_var.copy_(torch.rand(8) + 0.5)
        tbn.weight.copy_(torch.randn(8) * 0.2 + 1)
        tbn.bias.copy_(torch.randn(8) * 0.1)

    x = rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        h = torch.relu(tbn(tconv(tx)))
        pooled = h.mean(dim=(2, 3))
        want = tfc(pooled).numpy()

    class FlaxStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (7, 7), (2, 2), padding=3, use_bias=False,
                        name="conv")(x)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(h)
            h = nn.relu(h)
            pooled = h.mean(axis=(1, 2))
            return nn.Dense(5, name="fc")(pooled)

    model = FlaxStack()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = flax_unfreeze(variables["params"])
    stats = flax_unfreeze(variables["batch_stats"])
    params["conv"]["kernel"] = jnp.asarray(
        np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    )
    params["bn"]["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    params["bn"]["bias"] = jnp.asarray(tbn.bias.detach().numpy())
    stats["bn"]["mean"] = jnp.asarray(tbn.running_mean.numpy())
    stats["bn"]["var"] = jnp.asarray(tbn.running_var.numpy())
    params["fc"]["kernel"] = jnp.asarray(
        np.transpose(tfc.weight.detach().numpy(), (1, 0))
    )
    params["fc"]["bias"] = jnp.asarray(tfc.bias.detach().numpy())
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def flax_unfreeze(d):
    import flax

    return flax.core.unfreeze(d)


def test_resnet_importer_fills_all_params(rng):
    """Synthesize a torchvision-style resnet18 state dict (with module.
    prefixes) and check every conv/bn parameter is overwritten."""
    from obman_train_tpu.models import resnet18
    from obman_train_tpu.models.resnet import import_torch_state_dict

    model = resnet18()
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    # Build the torch-side state dict from the flax shapes (inverse mapping).
    import flax

    flat_p = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    state = {}

    def torch_key(path):
        parts = path.split("/")
        if parts[0].startswith("layer"):
            stage, block = parts[0].split("_")
            prefix = f"{stage}.{block}"
            rest = parts[1]
            if rest == "downsample_conv":
                return f"{prefix}.downsample.0.weight"
            if rest == "downsample_bn":
                return f"{prefix}.downsample.1"
            if rest.startswith("conv"):
                return f"{prefix}.{rest}.weight"
            return f"{prefix}.{rest}"
        if parts[0] == "conv1":
            return "conv1.weight"
        return parts[0]

    for path, val in flat_p.items():
        val = np.asarray(val)
        key = torch_key(path.rsplit("/", 1)[0])
        field = path.rsplit("/", 1)[1]
        if field == "kernel":
            state["module." + key] = rng.normal(
                0, 0.1, np.transpose(val, (3, 2, 0, 1)).shape
            ).astype(np.float32)
        elif field == "scale":
            state["module." + key + ".weight"] = rng.normal(
                1, 0.1, val.shape
            ).astype(np.float32)
        elif field == "bias":
            state["module." + key + ".bias"] = rng.normal(
                0, 0.1, val.shape
            ).astype(np.float32)
    flat_s = flax.traverse_util.flatten_dict(variables["batch_stats"], sep="/")
    for path, val in flat_s.items():
        key = torch_key(path.rsplit("/", 1)[0])
        field = path.rsplit("/", 1)[1]
        tfield = "running_mean" if field == "mean" else "running_var"
        state["module." + key + "." + tfield] = rng.normal(
            0.5, 0.1, np.asarray(val).shape
        ).astype(np.float32)

    from obman_train_tpu.train.checkpoint import strip_module_prefix

    imported = import_torch_state_dict(
        strip_module_prefix(state), variables, prefix=""
    )
    new_flat = flax.traverse_util.flatten_dict(imported["params"], sep="/")
    changed = sum(
        not np.allclose(np.asarray(new_flat[k]), np.asarray(flat_p[k]))
        for k in flat_p
    )
    assert changed == len(flat_p), f"only {changed}/{len(flat_p)} imported"


def test_importer_ignores_heads_absent_from_template(rng):
    """Torch checkpoints may carry heads (scaletrans/absolute/decode_*)
    the configured flax model doesn't have; the importer must not smuggle
    them into the variables (it broke strict orbax restores)."""
    import jax
    import numpy as np

    from obman_train_tpu.assets import synthetic_mano_assets
    from obman_train_tpu.config import ModelConfig
    from obman_train_tpu.models import (
        BatchSpec,
        build_handnet,
        mano_params_from_assets,
    )
    from obman_train_tpu.train.checkpoint import import_torch_handnet

    net = build_handnet(
        ModelConfig(),
        mano_params_from_assets(synthetic_mano_assets("right")),
        mano_params_from_assets(synthetic_mano_assets("left")),
    )
    spec = BatchSpec(has_joints3d=False, has_verts3d=False,
                     has_objpoints3d=False, has_camintrs=False,
                     has_center3d=False)
    batch = {"images": np.zeros((1, 64, 64, 3), np.float32),
             "sides": np.zeros((1,), np.int32)}
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "points": jax.random.PRNGKey(1)},
        batch, spec, no_loss=True, force_hand=True, force_objects=True,
    )
    sd = {
        "scaletrans_branch.decoder.0.weight": rng.normal(size=(256, 512)),
        "scaletrans_branch.decoder.0.bias": rng.normal(size=(256,)),
        "scaletrans_branch.final_layer.weight": rng.normal(size=(3, 256)),
        "scaletrans_branch.final_layer.bias": rng.normal(size=(3,)),
        "atlas_branch.decode_trans.0.weight": rng.normal(size=(256, 512)),
        "atlas_branch.decode_trans.0.bias": rng.normal(size=(256,)),
        "atlas_branch.decode_trans.2.weight": rng.normal(size=(3, 256)),
        "atlas_branch.decode_trans.2.bias": rng.normal(size=(3,)),
        "atlas_adapter.weight": rng.normal(size=(512, 512)),
        "atlas_adapter.bias": rng.normal(size=(512,)),
    }
    out = import_torch_handnet(sd, variables)
    assert set(out["params"].keys()) == set(variables["params"].keys())
    assert "decode_trans" not in out["params"]["atlas_branch"]
