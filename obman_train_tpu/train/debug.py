"""Training-diagnostics utilities.

``inspect_feature_grads`` reproduces the reference's ``inspect_weights``
mode (mano_train/netscripts/epochpass3d.py:92-108): the gradient norm of
each individual loss w.r.t. the encoder's image features, useful for
balancing the multi-task lambdas.  Instead of torch's retain_grad +
repeated backward, each loss is differentiated w.r.t. a zero-valued feature
probe in one jit program per loss.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

DEFAULT_INSPECT_LOSSES = (
    "atlas_trans3d",
    "atlas_objpoints3d",
    "mano_verts3d",
    "mano_shape",
    "atlas_edge_regul",
    "total_loss",
)


def inspect_feature_grads(
    net,
    state,
    batch: Dict,
    spec,
    loss_names: Sequence[str] = DEFAULT_INSPECT_LOSSES,
    rng: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Returns {loss_name: ||d loss / d features||} for available losses."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    feat_dim = net.cfg.img_feature_size
    B = batch["images"].shape[0]
    probe0 = jnp.zeros((B, feat_dim), jnp.float32)

    def loss_value(probe, name):
        _, _, losses = net.apply(
            variables, batch, spec, train=False,
            rngs={"points": rng}, feature_probe=probe,
        )
        return losses[name]

    # discover which losses exist for this spec/config
    _, _, losses = net.apply(
        variables, batch, spec, train=False, rngs={"points": rng},
        feature_probe=probe0,
    )
    out = {}
    for name in loss_names:
        if name not in losses or losses[name] is None:
            continue
        g = jax.grad(loss_value)(probe0, name)
        out[name] = float(jnp.linalg.norm(g))
    return out
