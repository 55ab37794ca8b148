"""ResNet-18/50 image encoder (flax.linen, NHWC).

Functional equivalent of the reference's vendored torchvision-style ResNet
(mano_train/networks/bases/resnet.py:25-224): conv7x7/2 + BN + ReLU +
maxpool3x3/2, four stages of Basic/Bottleneck blocks, global average pool;
``return_inter`` mirrors the reference's per-layer intermediates
(resnet.py:154-188) used by the attention-map demo hooks.

TPU notes: NHWC layout (XLA:TPU native), bfloat16-friendly compute dtype,
frozen-BN mode = inference batch stats (the reference training recipe
freezes BN, README.md:133, netutils.py:14-19); unfrozen BN syncs batch
statistics across the data mesh axis via ``axis_name`` (the pmean
equivalent of torch SyncBN).

No pretrained-download path (the reference pulls model_zoo URLs,
resnet.py:191-224); instead ``import_torch_state_dict`` maps a
user-provided torch checkpoint into flax params.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from obman_train_tpu.ops.maxpool import maxpool_3x3s2, maxpool_3x3s2_applicable
from obman_train_tpu.ops.stemconv import stem_conv7x7, stem_conv_applicable


class StemConv(nn.Module):
    """The 7x7/2 stem conv, with an opt-in space-to-depth backward.

    Parameter path and init match ``nn.Conv(64, (7,7), (2,2), padding=3,
    use_bias=False)`` exactly (same "kernel" param, same initializer, same
    forward numerics), so checkpoints and the torch importer are
    unaffected.  The s2d gradient reroute is OFF by default — measured
    slower inside the full train step (see ops/stemconv.py); set
    ``OBMAN_STEM_S2D=1`` to experiment.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        if stem_conv_applicable(x.shape, kernel.shape, (2, 2),
                                ((3, 3), (3, 3))):
            return stem_conv7x7(x, kernel)
        # Odd spatial dims: plain direct conv (same params, default VJP).
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        residual = x
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="bn2")(y)
        if self.downsample:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is 4x this
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns pooled features (B, 512|2048) and optional intermediates."""

    stage_sizes: Sequence[int]
    block_cls: type
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, x, train: bool = False, return_inter: bool = False
    ) -> Tuple[jnp.ndarray, Optional[list]]:
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )
        x = StemConv(features=64, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x))
        if maxpool_3x3s2_applicable(x.shape):
            # opt-in (OBMAN_POOL_EWBWD=1): identical forward, elementwise
            # backward — measured slower in the full step (ops/maxpool.py)
            x = maxpool_3x3s2(x)
        else:
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

        inters = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(n_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                expansion = 4 if self.block_cls is Bottleneck else 1
                needs_down = block == 0 and (
                    strides != 1 or x.shape[-1] != width * expansion
                )
                x = self.block_cls(
                    features=width,
                    strides=strides,
                    downsample=needs_down,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
            inters.append(x)

        feats = jnp.mean(x, axis=(1, 2))  # global average pool
        return (feats, inters) if return_inter else (feats, None)


def resnet18(dtype=jnp.float32, bn_axis_name=None) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, dtype=dtype,
                  bn_axis_name=bn_axis_name)


def resnet50(dtype=jnp.float32, bn_axis_name=None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, dtype=dtype,
                  bn_axis_name=bn_axis_name)


# ---------------------------------------------------------------------------
# Torch checkpoint import (reference checkpoints use torchvision naming with
# optional DataParallel "module." prefixes, modelio.py:35-41).
# ---------------------------------------------------------------------------

def _stage_block_from_torch(key: str):
    # torchvision: layer{s}.{b}.{rest}
    parts = key.split(".")
    stage, block = int(parts[0][len("layer"):]), int(parts[1])
    rest = ".".join(parts[2:])
    return f"layer{stage}_{block}", rest


def import_torch_state_dict(
    state: dict, variables: dict, prefix: str = ""
) -> dict:
    """Map a torchvision-style ResNet state_dict onto flax variables.

    Args:
      state: dict of numpy arrays (torch tensors already .numpy()'d),
        possibly prefixed (e.g. "base_net." or "module.base_net.").
      variables: flax variables {'params': ..., 'batch_stats': ...} from init.
      prefix: key prefix to strip.
    Returns: new variables dict with imported values.
    """
    import flax

    flat_p = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    flat_s = flax.traverse_util.flatten_dict(variables["batch_stats"], sep="/")

    def put(table, path, val, transform=None):
        if transform:
            val = transform(val)
        assert table[path].shape == val.shape, (path, table[path].shape, val.shape)
        table[path] = jnp.asarray(val)

    conv_t = lambda w: np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO

    for key, val in state.items():
        if prefix and not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        val = np.asarray(val)
        if k.startswith("fc."):
            continue  # classification head unused (reference drops it too)
        if k.startswith("conv1."):
            put(flat_p, "conv1/kernel", val, conv_t)
        elif k.startswith("bn1."):
            field = k.split(".")[1]
            _import_bn(flat_p, flat_s, "bn1", field, val)
        elif k.startswith("layer"):
            block_name, rest = _stage_block_from_torch(k)
            if rest.startswith("conv"):
                cname = rest.split(".")[0]
                put(flat_p, f"{block_name}/{cname}/kernel", val, conv_t)
            elif rest.startswith("bn"):
                bname, field = rest.split(".")[:2]
                _import_bn(flat_p, flat_s, f"{block_name}/{bname}", field, val)
            elif rest.startswith("downsample.0."):
                put(flat_p, f"{block_name}/downsample_conv/kernel", val, conv_t)
            elif rest.startswith("downsample.1."):
                field = rest.split(".")[2]
                _import_bn(
                    flat_p, flat_s, f"{block_name}/downsample_bn", field, val
                )
    params = flax.traverse_util.unflatten_dict(flat_p, sep="/")
    stats = flax.traverse_util.unflatten_dict(flat_s, sep="/")
    return {"params": params, "batch_stats": stats}


def _import_bn(flat_p, flat_s, base, field, val):
    val = jnp.asarray(val)
    if field == "weight":
        flat_p[f"{base}/scale"] = val
    elif field == "bias":
        flat_p[f"{base}/bias"] = val
    elif field == "running_mean":
        flat_s[f"{base}/mean"] = val
    elif field == "running_var":
        flat_s[f"{base}/var"] = val
    # num_batches_tracked ignored
