"""`import_torch --imagenet_encoder`: bootstrap the encoder(s) from a BARE
torchvision ResNet state_dict — the reference's pretrained=True path
(mano_train/networks/bases/resnet.py:191-224) for training from scratch in
an image with no model-zoo egress.  torchvision itself is not installed, so
the file is synthesized in the torchvision layout from the flax shapes
(the inverse mapping also used by tests/test_torch_import.py)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax  # noqa: E402
import jax  # noqa: E402


def _torchvision_state_dict(variables, rng):
    """A torchvision-layout resnet18 state dict matching ``variables``."""
    flat_p = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    flat_s = flax.traverse_util.flatten_dict(
        variables["batch_stats"], sep="/"
    )
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
            state[key] = rng.normal(
                0, 0.1, np.transpose(val, (3, 2, 0, 1)).shape
            ).astype(np.float32)
        elif field == "scale":
            state[key + ".weight"] = rng.normal(1, 0.1, val.shape).astype(
                np.float32
            )
        elif field == "bias":
            state[key + ".bias"] = rng.normal(0, 0.1, val.shape).astype(
                np.float32
            )
    for path, val in flat_s.items():
        key = torch_key(path.rsplit("/", 1)[0])
        field = path.rsplit("/", 1)[1]
        tfield = "running_mean" if field == "mean" else "running_var"
        state[key + "." + tfield] = rng.normal(
            0.5, 0.1, np.asarray(val).shape
        ).astype(np.float32)
    # torchvision files also carry the fc head the import must skip
    state["fc.weight"] = rng.normal(0, 0.1, (1000, 512)).astype(np.float32)
    state["fc.bias"] = rng.normal(0, 0.1, (1000,)).astype(np.float32)
    return state


def test_imagenet_encoder_bootstrap(tmp_path, rng):
    import jax.numpy as jnp

    from obman_train_tpu.cli.import_torch import main
    from obman_train_tpu.models import resnet18

    # torchvision-layout weights matching a resnet18 encoder
    enc = resnet18()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc_vars = enc.init(jax.random.PRNGKey(0), x)
    sd = _torchvision_state_dict(enc_vars, rng)
    ckpt = os.path.join(tmp_path, "resnet18-imagenet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    exp_id = os.path.join(tmp_path, "bootstrapped")
    state = main([
        "--torch_checkpoint", ckpt, "--exp_id", exp_id,
        "--mano_assets", "synthetic", "--imagenet_encoder",
        "--atlas_predict_trans", "--atlas_predict_scale",
    ])

    # every encoder conv/bn parameter took the torchvision value...
    flat = flax.traverse_util.flatten_dict(state.params["base_net"], sep="/")
    conv1 = np.asarray(flat["conv1/kernel"])
    np.testing.assert_allclose(
        conv1, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), atol=1e-6
    )
    stats = flax.traverse_util.flatten_dict(
        state.batch_stats["base_net"], sep="/"
    )
    np.testing.assert_allclose(
        np.asarray(stats["bn1/mean"]), sd["bn1.running_mean"], atol=1e-6
    )
    # ...while the branches stayed at their fresh init (not zero/garbage)
    assert "mano_branch" in state.params and "atlas_branch" in state.params

    # and the checkpoint round-trips through the normal restore path
    from obman_train_tpu.train.checkpoint import load_checkpoint

    restored, epoch = load_checkpoint(exp_id, state)
    assert epoch == 0
    rflat = flax.traverse_util.flatten_dict(
        restored.params["base_net"], sep="/"
    )
    np.testing.assert_allclose(np.asarray(rflat["conv1/kernel"]), conv1)


def test_imagenet_encoder_rejects_validate(tmp_path, rng):
    from obman_train_tpu.cli.import_torch import main

    ckpt = os.path.join(tmp_path, "x.pth")
    torch.save({}, ckpt)
    with pytest.raises(SystemExit):
        main([
            "--torch_checkpoint", ckpt, "--exp_id",
            os.path.join(tmp_path, "e"), "--mano_assets", "synthetic",
            "--imagenet_encoder", "--validate",
        ])
