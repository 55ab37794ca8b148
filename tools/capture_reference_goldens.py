"""Capture golden fixtures by EXECUTING the reference's torch ops on CPU.

Runs the pure-torch parts of /root/reference (ChamferLoss, ray-parity
inside/outside test, compute_contact_loss over mode/target/zone combos,
edge_loss, cotangent Laplacian, get_affine_transform) on deterministic
inputs and saves inputs+outputs to ``tests/goldens/reference_goldens.npz``.

``tests/test_reference_goldens.py`` then asserts the JAX implementations
match these fixtures to <=1e-4 — i.e. parity against the *actual* reference
code, not a re-derivation. The fixture file is committed so the test suite
stays hermetic; re-run this script only to regenerate it.

Usage:  python tools/capture_reference_goldens.py

The reference imports trimesh (not installed) and builds CUDA tensors at
import/def time; we stub/neuter both — neither affects the math captured
here (all captured ops are CPU torch; trimesh is only used by code paths we
don't call).
"""

from __future__ import annotations

import os
import sys
import types
import warnings

import numpy as np

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "goldens", "reference_goldens.npz")


def _setup_reference_imports():
    os.environ.setdefault("MPLBACKEND", "Agg")
    # Stub trimesh: imported at module level by contactloss/atlasbranch but
    # unused by the functions we capture.
    tm = types.ModuleType("trimesh")
    tm.creation = types.SimpleNamespace(icosphere=None)
    tm.proximity = types.SimpleNamespace(closest_point=None)
    sys.modules["trimesh"] = tm
    # Stub manopth (not installed): manobranch imports ManoLayer at module
    # level, but ManoLoss (what we capture) never touches it.
    manopth = types.ModuleType("manopth")
    manolayer = types.ModuleType("manopth.manolayer")
    manolayer.ManoLayer = object
    manopth.manolayer = manolayer
    sys.modules["manopth"] = manopth
    sys.modules["manopth.manolayer"] = manolayer
    import torch

    # The reference calls .cuda() at def/ctor time (contactutils.py:65,
    # laplacianloss.py:76); neuter it so CPU torch runs the same math.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    # this image's torch reports CUDA available without a usable ATen CUDA
    # lib; the reference branches on it (contactloss.py:66-69).
    torch.cuda.is_available = lambda: False  # type: ignore[assignment]
    # contactloss.batch_pairwise_dist hard-codes use_cuda=True (:60-69).
    torch.cuda.LongTensor = torch.LongTensor  # type: ignore[attr-defined]
    # contactloss.py:216 builds a byte mask then &'s it with a bool mask,
    # which modern torch rejects; bool has identical mask semantics here.
    torch.Tensor.byte = lambda self: self.to(torch.bool)  # type: ignore[assignment]
    if not hasattr(torch, "range"):
        torch.range = lambda a, b, **k: torch.arange(a, b + 1, **k)
    warnings.filterwarnings("ignore")
    sys.path.insert(0, REFERENCE)
    # contact zones pkl is loaded relative to CWD (contactloss.py:265).
    os.chdir(REFERENCE)


def main():
    _setup_reference_imports()
    import torch

    from mano_train.networks.branches import atlasutils  # noqa: E402
    from mano_train.networks.branches import contactloss  # noqa: E402
    from mano_train.networks.branches import laplacianloss  # noqa: E402
    from mano_train.networks.branches.atlasbranch import edge_loss  # noqa: E402
    from mano_train.networks.branches.contactutils import (  # noqa: E402
        batch_mesh_contains_points,
    )
    from handobjectdatasets import handutils  # noqa: E402

    sys.path.insert(0, REPO)
    from obman_train_tpu.assets.icosphere import icosphere

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    out: dict[str, np.ndarray] = {}

    ico_verts, ico_faces = icosphere(3)  # (642,3), (1280,3)
    out["ico_verts"] = ico_verts.astype(np.float64)
    out["ico_faces"] = ico_faces.astype(np.int64)

    # ---- ChamferLoss (atlasutils.py:6-39) --------------------------------
    preds = rng.normal(scale=40.0, size=(3, 600, 3))
    gts = rng.normal(scale=40.0, size=(3, 642, 3)) + np.array([5.0, -3.0, 60.0])
    ch = atlasutils.ChamferLoss()
    l1, l2 = ch(torch.tensor(preds), torch.tensor(gts))
    out["chamfer_preds"] = preds
    out["chamfer_gts"] = gts
    out["chamfer_loss1"] = l1.numpy()
    out["chamfer_loss2"] = l2.numpy()

    # ---- inside/outside ray parity (contactutils.py:62-159) --------------
    # Object: icosphere scaled to ~40mm, offset; points: mixture of interior
    # (scaled-down sphere verts) and exterior (scaled-up + noise).
    B = 2
    centers = np.array([[10.0, -5.0, 60.0], [-20.0, 8.0, 45.0]])
    obj_verts = ico_verts[None] * np.array([38.0, 45.0])[:, None, None]
    obj_verts = obj_verts + centers[:, None, :]
    radii = rng.uniform(0.3, 1.8, size=(B, 778, 1))
    dirs = rng.normal(size=(B, 778, 3))
    dirs /= np.linalg.norm(dirs, axis=2, keepdims=True)
    pts = dirs * radii * np.array([38.0, 45.0])[:, None, None]
    pts = pts + centers[:, None, :]
    # numpy fancy indexing yields a non-C-contiguous array whose strides
    # torch keeps, breaking the reference's .view() calls; the reference
    # itself builds triangles with torch indexing (contiguous).
    tris = np.ascontiguousarray(obj_verts[:, ico_faces])  # (B, 1280, 3, 3)
    ext64 = batch_mesh_contains_points(
        torch.tensor(pts, dtype=torch.float64),
        torch.tensor(tris, dtype=torch.float64),
        direction=torch.tensor([0.4395064455, 0.617598629942, 0.652231566745],
                               dtype=torch.float64),
    )
    ext32 = batch_mesh_contains_points(
        torch.tensor(pts, dtype=torch.float32),
        torch.tensor(tris, dtype=torch.float32),
    )
    assert (ext64.numpy() == ext32.numpy()).all(), "precision-sensitive fixture"
    frac_in = 1.0 - ext64.numpy().mean()
    assert 0.15 < frac_in < 0.85, f"degenerate inside fraction {frac_in}"
    out["inside_points"] = pts
    out["inside_obj_verts"] = obj_verts
    out["inside_exterior"] = ext64.numpy()

    # ---- compute_contact_loss (contactloss.py:149-308) --------------------
    # Hand verts: a blob overlapping the object surface so attraction,
    # repulsion, and zone selection all engage.
    hand = rng.normal(scale=25.0, size=(B, 778, 3)) + centers[:, None, :]
    hand = hand + np.array([20.0, 0.0, 0.0])  # straddle the surface
    out["contact_hand"] = hand
    out["contact_obj"] = obj_verts

    # compute_contact_loss uses the module-default f32 ray direction; give
    # it a f64 one so the whole capture runs in double precision.
    _dir64 = torch.tensor(
        [0.4395064455, 0.617598629942, 0.652231566745], dtype=torch.float64
    )
    contactloss.batch_mesh_contains_points = (
        lambda pts, tris: batch_mesh_contains_points(pts, tris, direction=_dir64)
    )

    def run_contact(mode, zones, target, sym, want_grad):
        hv = torch.tensor(hand, dtype=torch.float64, requires_grad=want_grad)
        ov = torch.tensor(obj_verts, dtype=torch.float64, requires_grad=want_grad)
        missed, penetr, _info, metrics = contactloss.compute_contact_loss(
            hv,
            None,  # hand_faces unused by the reference implementation
            ov,
            torch.tensor(ico_faces, dtype=torch.long),
            contact_thresh=10.0,
            contact_mode=mode,
            collision_thresh=20.0,
            collision_mode="dist_tanh" if mode == "dist_tanh" else mode,
            contact_target=target,
            contact_sym=sym,
            contact_zones=zones,
        )
        rec = {
            "missed": missed.detach().numpy(),
            "penetr": penetr.detach().numpy(),
            "max_penetr": metrics["max_penetr"].detach().numpy(),
            "mean_penetr": metrics["mean_penetr"].detach().numpy(),
        }
        if want_grad:
            (missed + penetr).backward()
            # a fully-detached side (target obj/hand) legitimately has no
            # grad — record zeros, matching stop_gradient semantics.
            rec["grad_hand"] = (
                hv.grad.numpy() if hv.grad is not None else np.zeros_like(hand)
            )
            rec["grad_obj"] = (
                ov.grad.numpy() if ov.grad is not None else np.zeros_like(obj_verts)
            )
        return rec

    for mode in ("dist_sq", "dist", "dist_tanh"):
        for zones in ("all", "tips", "zones"):
            rec = run_contact(mode, zones, "all", False, want_grad=False)
            for k, v in rec.items():
                out[f"contact/{mode}/{zones}/{k}"] = v
    for target in ("all", "obj", "hand"):
        rec = run_contact("dist_tanh", "all", target, False, want_grad=True)
        for k, v in rec.items():
            out[f"contact_grad/{target}/{k}"] = v
    rec = run_contact("dist", "all", "all", True, want_grad=False)
    for k, v in rec.items():
        out[f"contact_sym/{k}"] = v

    # ---- edge_loss (atlasbranch.py:153-167) -------------------------------
    ev = rng.normal(scale=30.0, size=(2, 642, 3))
    el = edge_loss(torch.tensor(ev), torch.tensor(ico_faces, dtype=torch.long))
    out["edge_verts"] = ev
    out["edge_loss"] = el.numpy()

    # ---- cotangent Laplacian (laplacianloss.py:80-185) --------------------
    lap = laplacianloss.Laplacian(
        ico_faces.astype(np.int64), torch.tensor(ico_verts, dtype=torch.float64)
    )
    lv = rng.normal(scale=30.0, size=(2, 642, 3))
    Lx = lap.forward(torch.tensor(lv, dtype=torch.float64))
    # loss formula from LaplacianLoss.__call__ (laplacianloss.py:36-41);
    # the legacy autograd Function can't be __call__'d in modern torch.
    lap_loss = torch.norm(Lx.view(-1, 3), p=2, dim=1).mean()
    out["lap_verts"] = lv
    out["lap_Lx"] = Lx.numpy()
    out["lap_loss"] = lap_loss.numpy()
    out["lap_L_dense"] = np.asarray(lap.L[:642, :642].todense())

    # ---- AtlasLoss.compute_loss (atlasbranch.py:170-287) ------------------
    # lambda_laplacian stays 0: the legacy autograd Function can't be called
    # in modern torch; the Laplacian operator itself is captured above.
    from mano_train.networks.branches.atlasbranch import AtlasLoss
    from handobjectdatasets.queries import TransQueries

    Bq = 2
    target_obj = rng.normal(scale=30.0, size=(Bq, 600, 3)) + np.array(
        [4.0, -2.0, 55.0]
    )
    pred_centered = rng.normal(scale=28.0, size=(Bq, 642, 3))
    pred_trans = rng.normal(scale=10.0, size=(Bq, 3))
    pred_scale = rng.uniform(0.8, 1.3, size=(Bq, 1))
    pred_obj = pred_scale[:, :, None] * pred_centered + pred_trans[:, None, :]
    out["atlas_target"] = target_obj
    out["atlas_pred_centered"] = pred_centered
    out["atlas_pred_trans"] = pred_trans
    out["atlas_pred_scale"] = pred_scale
    out["atlas_pred_obj"] = pred_obj

    atlas_loss = AtlasLoss(
        lambda_atlas=0.3, final_lambda_atlas=0.25, trans_weight=0.2,
        scale_weight=0.15, edge_regul_lambda=0.1,
    )
    t_preds = {
        "objpointscentered3d": torch.tensor(pred_centered, requires_grad=True),
        "objtrans": torch.tensor(pred_trans, requires_grad=True),
        "objscale": torch.tensor(pred_scale, requires_grad=True),
        "objpoints3d": torch.tensor(pred_obj, requires_grad=True),
        "objfaces": torch.tensor(ico_faces, dtype=torch.long),
    }
    t_target = {TransQueries.objpoints3d: torch.tensor(target_obj)}
    final, alosses = atlas_loss.compute_loss(t_preds, t_target)
    final.backward()
    out["atlas_full/final"] = final.detach().numpy()
    for k in ("atlas_trans3d", "atlas_scale3d", "final_chamfer_loss",
              "atlas_edge_regul", "atlas_objpoints3d"):
        out[f"atlas_full/{k}"] = alosses[k].detach().numpy()
    for name in ("objpointscentered3d", "objtrans", "objscale", "objpoints3d"):
        out[f"atlas_full/grad_{name}"] = t_preds[name].grad.numpy()

    # no-trans path (atlasbranch.py:257-267)
    simple_loss = AtlasLoss(lambda_atlas=0.4, final_lambda_atlas=0)
    s_pred = {"objpoints3d": torch.tensor(pred_obj, requires_grad=True)}
    final_s, slosses = simple_loss.compute_loss(s_pred, t_target)
    final_s.backward()
    out["atlas_simple/final"] = final_s.detach().numpy()
    out["atlas_simple/atlas_objpoints3d"] = (
        slosses["atlas_objpoints3d"].detach().numpy()
    )
    out["atlas_simple/grad_objpoints3d"] = s_pred["objpoints3d"].grad.numpy()

    # ---- meshiou / thresh_ious (contactloss.py:20-47) ----------------------
    gt_d = rng.uniform(0, 150, size=(3, 778)) ** 1.2  # squared-mm-like range
    pr_d = gt_d * rng.uniform(0.3, 3.0, size=(3, 778))
    batch_ious, iou_auc = contactloss.meshiou(
        torch.tensor(gt_d), torch.tensor(pr_d)
    )
    out["meshiou_gt"] = gt_d
    out["meshiou_pred"] = pr_d
    out["meshiou_batch_ious"] = batch_ious.numpy()
    out["meshiou_auc"] = np.float64(iou_auc)

    # ---- handutils annot helpers + transform_coords (handutils.py:8-60) ---
    annots = rng.uniform(10, 240, size=(5, 21, 2))
    out["annot_pts"] = annots
    out["annot_scales"] = np.array(
        [handutils.get_annot_scale(a) for a in annots]
    )
    out["annot_centers"] = np.stack(
        [handutils.get_annot_center(a) for a in annots]
    )
    aff = out_affine = np.array(
        [[1.3, -0.2, 14.0], [0.25, 0.9, -7.0], [0.0, 0.0, 1.0]]
    )
    out["tc_affine"] = aff
    out["tc_fwd"] = handutils.transform_coords(annots[0], aff)
    out["tc_inv"] = handutils.transform_coords(annots[0], aff, invert=True)

    # ---- fast_load_obj (loadutils.py:3-123) --------------------------------
    import io as _io

    from handobjectdatasets import loadutils

    obj_text = (
        "# demo\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0.5\n"
        "vn 0 0 1\nf 1//1 2//1 3//1\nf 1 3 4\n"
    )
    mesh = loadutils.fast_load_obj(_io.StringIO(obj_text))[0]
    out["obj_text"] = np.frombuffer(obj_text.encode(), dtype=np.uint8)
    out["obj_vertices"] = np.asarray(mesh["vertices"], np.float64)
    out["obj_faces"] = np.asarray(mesh["faces"], np.int64)

    # ---- EvalUtil protocol (evaluation/zimeval.py:21-129; GPL code is
    # EXECUTED here to produce numeric fixtures — none of it is copied) ----
    from mano_train.evaluation.zimeval import EvalUtil as RefEvalUtil

    ev = RefEvalUtil()
    kp_gt = rng.normal(0, 30, size=(4, 21, 3))
    kp_pred = kp_gt + rng.normal(0, 12, size=(4, 21, 3))
    for b in range(4):
        ev.feed(torch.tensor(kp_gt[b]), torch.tensor(kp_pred[b]))
    (epe_mean_all, epe_mean_joint, epe_median_all, auc_all, pck, thresholds) = (
        ev.get_measures(0, 50, 20)
    )
    out["eval_gt"] = kp_gt
    out["eval_pred"] = kp_pred
    out["eval_epe_mean_all"] = np.asarray(epe_mean_all)
    out["eval_epe_mean_joint"] = np.asarray(epe_mean_joint)
    out["eval_epe_median_all"] = np.asarray(epe_median_all)
    out["eval_auc"] = np.asarray(auc_all)
    out["eval_pck"] = np.asarray(pck)
    out["eval_thresholds"] = np.asarray(thresholds)

    # ---- transform_img: the reference's PIL AFFINE warp (handutils.py:
    # 48-60, default NEAREST resampling) ------------------------------------
    from PIL import Image

    warp_img = rng.integers(0, 256, size=(64, 80, 3)).astype(np.uint8)
    warp_total, _ = handutils.get_affine_transform(
        np.array([40.0, 30.0]), 55.0, [48, 48], rot=0.35
    )
    warped = handutils.transform_img(
        Image.fromarray(warp_img), warp_total, [48, 48]
    )
    out["warp_img"] = warp_img
    out["warp_affine"] = warp_total
    out["warp_out"] = np.asarray(warped)

    # ---- get_affine_transform (handutils.py:63-101) -----------------------
    K = 16
    centers2d = rng.uniform(40, 220, size=(K, 2))
    scales = rng.uniform(80, 300, size=(K,))
    rots = rng.uniform(-np.pi, np.pi, size=(K,))
    rots[0] = 0.0
    totals, posts = [], []
    for i in range(K):
        total, post = handutils.get_affine_transform(
            centers2d[i], scales[i], [256, 256], rot=rots[i]
        )
        totals.append(total)
        posts.append(post)
    out["affine_centers"] = centers2d
    out["affine_scales"] = scales
    out["affine_rots"] = rots
    out["affine_total"] = np.stack(totals)
    out["affine_post"] = np.stack(posts)

    # ---- ManoLoss (manobranch.py:251-324) ---------------------------------
    # The pca term is unreachable in the reference: it reads preds["pcas"],
    # a key ManoBranch.forward never sets (manobranch.py:211-218) — enabling
    # it with hand_pcas in the target would KeyError.  Captured terms:
    # verts/joints MSE, shape-vs-zero, pose[3:]-vs-zero.
    from mano_train.networks.branches.manobranch import ManoLoss
    from handobjectdatasets.queries import TransQueries

    B, ncomps = 4, 30
    ml_preds = {
        "verts": rng.normal(0, 30, size=(B, 778, 3)),
        "joints": rng.normal(0, 30, size=(B, 21, 3)),
        "shape": rng.normal(0, 1, size=(B, 10)),
        "pose": rng.normal(0, 0.8, size=(B, 3 + ncomps)),
    }
    ml_target = {
        TransQueries.verts3d: rng.normal(0, 30, size=(B, 778, 3)),
        TransQueries.joints3d: rng.normal(0, 30, size=(B, 21, 3)),
    }
    lambdas = dict(
        lambda_verts=0.167,
        lambda_joints3d=0.167,
        lambda_shape=0.077,
        lambda_pose_reg=0.033,
    )
    ml = ManoLoss(**lambdas)
    final, terms = ml.compute_loss(
        {k: torch.tensor(v) for k, v in ml_preds.items()},
        {k: torch.tensor(v) for k, v in ml_target.items()},
    )
    for k, v in ml_preds.items():
        out[f"manoloss_pred_{k}"] = v
    out["manoloss_gt_verts3d"] = ml_target[TransQueries.verts3d]
    out["manoloss_gt_joints3d"] = ml_target[TransQueries.joints3d]
    out["manoloss_lambdas"] = np.array(
        [lambdas["lambda_verts"], lambdas["lambda_joints3d"],
         lambdas["lambda_shape"], lambdas["lambda_pose_reg"]]
    )
    out["manoloss_total"] = final.detach().numpy().reshape(())
    for name in ("mano_verts3d", "mano_joints3d", "mano_shape", "pose_reg"):
        out[f"manoloss_{name}"] = terms[name].detach().numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")


if __name__ == "__main__":
    main()
