"""Parity against goldens captured from the reference's OWN torch code.

Fixtures in ``goldens/reference_goldens.npz`` were produced by
``tools/capture_reference_goldens.py``, which executes /root/reference's
pure-torch ops on CPU in float64 (ChamferLoss atlasutils.py:6-39,
batch_mesh_contains_points contactutils.py:62-159, compute_contact_loss
contactloss.py:149-308 incl. gradients, edge_loss atlasbranch.py:153-167,
cotangent Laplacian laplacianloss.py:80-185, get_affine_transform
handutils.py:63-101).  These tests run the JAX implementations on the same
inputs (under x64 for a clean numeric comparison) and assert agreement to
well below the 1e-4 target.  Hermetic: only the committed npz is read.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_goldens.npz")

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDENS)


@pytest.fixture(scope="module")
def x64():
    with jax.enable_x64(True):
        yield


def test_chamfer_matches_reference(g, x64):
    from obman_train_tpu.ops.chamfer import chamfer_loss

    l1, l2 = chamfer_loss(jnp.asarray(g["chamfer_preds"]), jnp.asarray(g["chamfer_gts"]))
    np.testing.assert_allclose(np.asarray(l1), g["chamfer_loss1"], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(l2), g["chamfer_loss2"], rtol=1e-9)


def test_chamfer_matches_reference_f32(g):
    """The production (f32) path stays within the 1e-4 relative target."""
    from obman_train_tpu.ops.chamfer import chamfer_loss

    l1, l2 = chamfer_loss(
        jnp.asarray(g["chamfer_preds"], jnp.float32),
        jnp.asarray(g["chamfer_gts"], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(l1), g["chamfer_loss1"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l2), g["chamfer_loss2"], rtol=1e-4)


def test_inside_outside_matches_reference(g, x64):
    from obman_train_tpu.ops.inside import batch_mesh_contains_points

    tris = jnp.asarray(g["inside_obj_verts"])[:, g["ico_faces"]]
    ext = batch_mesh_contains_points(jnp.asarray(g["inside_points"]), tris)
    np.testing.assert_array_equal(np.asarray(ext), g["inside_exterior"])


def test_inside_outside_matches_reference_f32(g):
    from obman_train_tpu.ops.inside import batch_mesh_contains_points

    tris = jnp.asarray(g["inside_obj_verts"], jnp.float32)[:, g["ico_faces"]]
    ext = batch_mesh_contains_points(
        jnp.asarray(g["inside_points"], jnp.float32), tris
    )
    np.testing.assert_array_equal(np.asarray(ext), g["inside_exterior"])


@pytest.mark.parametrize("mode", ["dist_sq", "dist", "dist_tanh"])
@pytest.mark.parametrize("zones", ["all", "tips", "zones"])
def test_contact_loss_matches_reference(g, x64, mode, zones):
    from obman_train_tpu.ops.contact import compute_contact_loss

    missed, penetr, _info, metrics = compute_contact_loss(
        jnp.asarray(g["contact_hand"]),
        jnp.asarray(g["contact_obj"]),
        jnp.asarray(g["ico_faces"]),
        contact_thresh=10.0,
        contact_mode=mode,
        collision_thresh=20.0,
        collision_mode="dist_tanh" if mode == "dist_tanh" else mode,
        contact_target="all",
        contact_sym=False,
        contact_zones=zones,
    )
    pre = f"contact/{mode}/{zones}"
    np.testing.assert_allclose(np.asarray(missed), g[f"{pre}/missed"], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(penetr), g[f"{pre}/penetr"], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(metrics["max_penetr"]), g[f"{pre}/max_penetr"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(metrics["mean_penetr"]), g[f"{pre}/mean_penetr"], rtol=1e-6
    )


@pytest.mark.parametrize("target", ["all", "obj", "hand"])
def test_contact_gradients_match_reference(g, x64, target):
    """stop_gradient placement == the reference's selective .detach()."""
    from obman_train_tpu.ops.contact import compute_contact_loss

    def total(hand, obj):
        missed, penetr, _i, _m = compute_contact_loss(
            hand,
            obj,
            jnp.asarray(g["ico_faces"]),
            contact_thresh=10.0,
            contact_mode="dist_tanh",
            collision_thresh=20.0,
            collision_mode="dist_tanh",
            contact_target=target,
            contact_sym=False,
            contact_zones="all",
        )
        return missed + penetr

    gh, go = jax.grad(total, argnums=(0, 1))(
        jnp.asarray(g["contact_hand"]), jnp.asarray(g["contact_obj"])
    )
    np.testing.assert_allclose(
        np.asarray(gh), g[f"contact_grad/{target}/grad_hand"], rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(go), g[f"contact_grad/{target}/grad_obj"], rtol=1e-6, atol=1e-12
    )


def test_contact_sym_matches_reference(g, x64):
    from obman_train_tpu.ops.contact import compute_contact_loss

    missed, penetr, _i, _m = compute_contact_loss(
        jnp.asarray(g["contact_hand"]),
        jnp.asarray(g["contact_obj"]),
        jnp.asarray(g["ico_faces"]),
        contact_thresh=10.0,
        contact_mode="dist",
        collision_thresh=20.0,
        collision_mode="dist",
        contact_target="all",
        contact_sym=True,
        contact_zones="all",
    )
    np.testing.assert_allclose(np.asarray(missed), g["contact_sym/missed"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(penetr), g["contact_sym/penetr"], rtol=1e-6)


def test_edge_loss_matches_reference(g, x64):
    from obman_train_tpu.ops.mesh import edge_loss

    el = edge_loss(jnp.asarray(g["edge_verts"]), jnp.asarray(g["ico_faces"]))
    np.testing.assert_allclose(np.asarray(el), g["edge_loss"], rtol=1e-9)


def test_cotangent_laplacian_matches_reference(g):
    from obman_train_tpu.assets.laplacian import cotangent_laplacian

    L = cotangent_laplacian(g["ico_verts"], g["ico_faces"].astype(np.int32))
    np.testing.assert_allclose(L, g["lap_L_dense"], rtol=1e-6, atol=1e-9)


def test_laplacian_loss_matches_reference(g, x64):
    from obman_train_tpu.assets.laplacian import cotangent_laplacian
    from obman_train_tpu.ops.mesh import laplacian_loss

    L = cotangent_laplacian(g["ico_verts"], g["ico_faces"].astype(np.int32))
    lx = np.einsum("vw,bwd->bvd", L, g["lap_verts"])
    # the golden Lx passed through the reference's torch.Tensor() f32 cast
    # (laplacianloss.py:135 convert_as), so it is only f32-accurate.
    np.testing.assert_allclose(lx, g["lap_Lx"], rtol=1e-4, atol=1e-4)
    loss = laplacian_loss(jnp.asarray(g["lap_verts"]), jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(loss), g["lap_loss"], rtol=1e-5)


def test_affine_transform_matches_reference(g):
    from obman_train_tpu.data.transforms import get_affine_transform

    for i in range(len(g["affine_scales"])):
        total, post = get_affine_transform(
            g["affine_centers"][i],
            g["affine_scales"][i],
            [256, 256],
            rot=g["affine_rots"][i],
        )
        np.testing.assert_allclose(total, g["affine_total"][i], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(post, g["affine_post"][i], rtol=1e-5, atol=1e-5)


def test_atlas_loss_matches_reference(g, x64):
    """compute_atlas_loss vs the executed reference AtlasLoss.compute_loss
    (atlasbranch.py:170-287): values and gradients, trans/scale/edge path."""
    from obman_train_tpu.config import AtlasConfig
    from obman_train_tpu.models.losses import compute_atlas_loss

    cfg = AtlasConfig(
        lambda_atlas=0.3, final_lambda_atlas=0.25, trans_weight=0.2,
        scale_weight=0.15, lambda_regul_edges=0.1, predict_trans=True,
        predict_scale=True,
    )
    batch = {"objpoints3d": jnp.asarray(g["atlas_target"])}
    faces = jnp.asarray(g["ico_faces"])

    def total(centered, trans, scale, obj):
        preds = {
            "objpointscentered3d": centered,
            "objtrans": trans,
            "objscale": scale,
            "objpoints3d": obj,
        }
        final, losses = compute_atlas_loss(
            preds, batch, cfg, has_objpoints3d=True, has_center3d=False,
            obj_faces=faces, laplacian=None,
        )
        return final, losses

    args = (
        jnp.asarray(g["atlas_pred_centered"]),
        jnp.asarray(g["atlas_pred_trans"]),
        jnp.asarray(g["atlas_pred_scale"]),
        jnp.asarray(g["atlas_pred_obj"]),
    )
    final, losses = total(*args)
    np.testing.assert_allclose(
        np.asarray(final), g["atlas_full/final"], rtol=1e-9
    )
    key_map = {
        "atlas_trans3d": "atlas_trans3d",
        "atlas_scale3d": "atlas_scale3d",
        "final_chamfer_loss": "final_chamfer_loss",
        "atlas_edge_regul": "atlas_edge_regul",
        "atlas_objpoints3d": "atlas_objpoints3d",
    }
    for ours, ref in key_map.items():
        np.testing.assert_allclose(
            np.asarray(losses[ours]), g[f"atlas_full/{ref}"], rtol=1e-9,
            err_msg=ours,
        )
    grads = jax.grad(lambda *a: total(*a)[0], argnums=(0, 1, 2, 3))(*args)
    for got, name in zip(
        grads, ("objpointscentered3d", "objtrans", "objscale", "objpoints3d")
    ):
        np.testing.assert_allclose(
            np.asarray(got), g[f"atlas_full/grad_{name}"],
            rtol=1e-7, atol=1e-12, err_msg=name,
        )


def test_atlas_loss_simple_path_matches_reference(g, x64):
    """The no-trans branch (atlasbranch.py:257-267)."""
    from obman_train_tpu.config import AtlasConfig
    from obman_train_tpu.models.losses import compute_atlas_loss

    cfg = AtlasConfig(lambda_atlas=0.4, final_lambda_atlas=None,
                      predict_trans=False, predict_scale=False)
    batch = {"objpoints3d": jnp.asarray(g["atlas_target"])}

    def total(obj):
        final, losses = compute_atlas_loss(
            {"objpoints3d": obj}, batch, cfg, has_objpoints3d=True,
            has_center3d=False, obj_faces=None, laplacian=None,
        )
        return final, losses

    obj = jnp.asarray(g["atlas_pred_obj"])
    final, losses = total(obj)
    np.testing.assert_allclose(
        np.asarray(final), g["atlas_simple/final"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(losses["atlas_objpoints3d"]),
        g["atlas_simple/atlas_objpoints3d"], rtol=1e-9,
    )
    gobj = jax.grad(lambda o: total(o)[0])(obj)
    np.testing.assert_allclose(
        np.asarray(gobj), g["atlas_simple/grad_objpoints3d"],
        rtol=1e-7, atol=1e-12,
    )


def test_meshiou_matches_reference(g, x64):
    from obman_train_tpu.ops.mesh import meshiou

    ious, auc = meshiou(
        jnp.asarray(g["meshiou_gt"]), jnp.asarray(g["meshiou_pred"])
    )
    # reference batch_ious is per-threshold batch means (contactloss.py:46),
    # computed in f32 -> f32-level tolerance
    np.testing.assert_allclose(
        np.asarray(ious), g["meshiou_batch_ious"], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(auc), g["meshiou_auc"], rtol=1e-6)


def test_annot_helpers_match_reference(g):
    from obman_train_tpu.data.transforms import (
        get_annot_center,
        get_annot_scale,
        transform_coords,
    )

    for i, pts in enumerate(g["annot_pts"]):
        np.testing.assert_allclose(
            get_annot_scale(pts), g["annot_scales"][i], rtol=1e-12
        )
        np.testing.assert_array_equal(
            get_annot_center(pts), g["annot_centers"][i]
        )
    np.testing.assert_array_equal(
        transform_coords(g["annot_pts"][0], g["tc_affine"]), g["tc_fwd"]
    )
    np.testing.assert_array_equal(
        transform_coords(g["annot_pts"][0], g["tc_affine"], invert=True),
        g["tc_inv"],
    )


def test_fast_load_obj_matches_reference(g, tmp_path):
    from obman_train_tpu.data.transforms import fast_load_obj

    text = g["obj_text"].tobytes().decode()
    p = tmp_path / "demo.obj"
    p.write_text(text)
    mesh = fast_load_obj(str(p))[0]
    np.testing.assert_allclose(mesh["vertices"], g["obj_vertices"])
    np.testing.assert_array_equal(mesh["faces"], g["obj_faces"])


def test_evalutil_matches_reference(g):
    """PCK/EPE/AUC protocol vs the executed hand3d EvalUtil (zimeval.py:
    21-129; the GPL original is run to produce fixtures, never copied)."""
    from obman_train_tpu.train.metrics import EvalUtil

    ev = EvalUtil()
    for b in range(len(g["eval_gt"])):
        ev.feed(g["eval_gt"][b], g["eval_pred"][b])
    epe_mean_all, epe_joint, epe_median_all, auc, pck, thresholds = (
        ev.get_measures(0, 50, 20)
    )
    np.testing.assert_allclose(epe_mean_all, g["eval_epe_mean_all"], rtol=1e-9)
    np.testing.assert_allclose(epe_joint, g["eval_epe_mean_joint"], rtol=1e-9)
    np.testing.assert_allclose(
        epe_median_all, g["eval_epe_median_all"], rtol=1e-9
    )
    np.testing.assert_allclose(auc, g["eval_auc"], rtol=1e-9)
    np.testing.assert_allclose(pck, g["eval_pck"], rtol=1e-9)
    np.testing.assert_allclose(thresholds, g["eval_thresholds"], rtol=1e-12)


def test_mano_loss_matches_reference(g, x64):
    """compute_mano_loss vs the executed reference ManoLoss
    (manobranch.py:251-324): verts/joints MSE, shape-vs-zero,
    pose[3:]-vs-zero, and their weighted accumulation.  (The reference's
    pca term is unreachable — it reads preds["pcas"], never set by
    ManoBranch.forward — so it has no golden; ours fixes the bug.)"""
    from obman_train_tpu.config import ManoConfig
    from obman_train_tpu.models.losses import compute_mano_loss

    lv, lj, ls, lp = (float(x) for x in g["manoloss_lambdas"])
    cfg = ManoConfig(
        lambda_verts=lv, lambda_joints3d=lj, lambda_shape=ls,
        lambda_pose_reg=lp, lambda_pca=None,
    )
    preds = {
        k: jnp.asarray(g[f"manoloss_pred_{k}"])
        for k in ("verts", "joints", "shape", "pose")
    }
    batch = {
        "verts3d": jnp.asarray(g["manoloss_gt_verts3d"]),
        "joints3d": jnp.asarray(g["manoloss_gt_joints3d"]),
    }
    total, losses = compute_mano_loss(
        preds, batch, cfg,
        has_verts3d=True, has_joints3d=True, has_pcas=False,
    )
    # the reference accumulates into torch.Tensor([0]) — float32 — so the
    # total golden carries f32 rounding; the per-term goldens are f64
    np.testing.assert_allclose(float(total), g["manoloss_total"], rtol=1e-6)
    for name in ("mano_verts3d", "mano_joints3d", "mano_shape", "pose_reg"):
        np.testing.assert_allclose(
            float(losses[name]), g[f"manoloss_{name}"], rtol=1e-9
        )


def test_pil_nearest_warp_matches_reference(g):
    """transform_img(resample='nearest') reproduces the reference's PIL
    Image.transform(AFFINE) warp bit-exactly (handutils.py:48-60)."""
    from obman_train_tpu.data.transforms import transform_img

    out = transform_img(
        g["warp_img"], g["warp_affine"], (48, 48), resample="nearest"
    )
    np.testing.assert_array_equal(
        np.round(out).astype(np.uint8), g["warp_out"]
    )
