"""The composite PSI training objective.

One pure function computes all six loss terms of the reference's
TrainOP.cal_loss (stage-1: source/train_s1.py:95-207; stage-2:
source/train_s2.py:102-210, which differs only in the model forward and
the two KL terms). The whole chain — perspective normalization, CVAE
forward, VPoser decode, SMPL-X LBS, camera transform, Chamfer contact,
SDF collision — traces into a single XLA program.

Scene geometry comes from a ``SceneAssets`` registry resident on
device: SDF grids stacked [S, D, D, D] and scene point clouds stacked
[S, P, 3] (padded with far-away points), indexed by the batch's
scene_idx. This replaces the reference's per-batch python loop that
re-uploads every scene's mesh + SDF to the GPU on every step
(batch_gen_hdf5.py:222-250) — the dominant data-movement cost there.

Epoch-dependent gates are traced scalars (no recompilation per epoch):
  fca      KL annealing factor min(1, ep/(0.75*epochs))   (train_s1.py:123-125)
  f_scene  contact/collision gate 1[ep > 0.75*epochs]     (train_s1.py:171-173,200-202)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.body.smplx_model import SMPLXModel
from psi_tpu.geometry.bodyvec import convert_to_3D_rot, convert_to_6D_rot
from psi_tpu.geometry.camera import normalize_global_T, recover_global_T
from psi_tpu.losses.terms import (
    collision_loss,
    contact_robust_loss,
    kl_normal_loss,
    l1_loss,
    vposer_reg_loss,
)
from psi_tpu.ops.chamfer import chamfer_one_sided
from psi_tpu.ops.sdf import sdf_trilinear_packed
from psi_tpu.utils.config import LossConfig


@flax.struct.dataclass
class SceneAssets:
    """Device-resident assets shared by every training/fitting step."""

    smplx: SMPLXModel
    vposer_params: Any
    contact_vids: jax.Array  # [C] int32 static contact-vertex indices
    sdf_packed: jax.Array  # [S, D, H, W, 8] corner-packed (ops.sdf.pack_sdf_corners)
    grid_mins: jax.Array  # [S, 3]
    grid_maxs: jax.Array  # [S, 3]
    scene_verts: jax.Array  # [S, P, 3] (padded with far points)


def scene_geometry_losses(
    assets: SceneAssets,
    xh_rec: jax.Array,
    cam_ext: jax.Array,
    scene_idx: jax.Array,
    contact_denom_offset: float,
    prune_scene_points: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """(raw contact loss, raw collision loss) for reconstructed bodies.

    The body-decode -> chamfer -> SDF chain shared verbatim between the
    training objective and the fitting objective. prune_scene_points > 0
    restricts the contact NN search to the K scene points nearest each
    body's contact centroid (LossConfig.prune_scene_points; 0 = exact)."""
    verts, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, xh_rec, cam_ext)
    contact_verts = verts[:, assets.contact_vids, :]
    scene_pts = assets.scene_verts[scene_idx]  # [B, P, 3]
    if prune_scene_points and prune_scene_points < scene_pts.shape[1]:
        from psi_tpu.ops.prune import select_near_tiles

        centroid = jnp.mean(contact_verts, axis=1)  # [B, 3]
        scene_pts = select_near_tiles(scene_pts, centroid, prune_scene_points)
    # only the body->scene direction enters the loss (train_s1.py:165-169)
    d1 = chamfer_one_sided(contact_verts, scene_pts)
    loss_contact = contact_robust_loss(d1, contact_denom_offset)

    body_sdf = sdf_trilinear_packed(
        assets.sdf_packed, scene_idx, verts, assets.grid_mins, assets.grid_maxs
    )
    loss_collision = collision_loss(body_sdf)
    return loss_contact, loss_collision


def cvae_loss(
    model,
    variables: Dict[str, Any],
    batch: Dict[str, jax.Array],
    assets: SceneAssets,
    key: jax.Array,
    fca: jax.Array,
    f_scene: jax.Array,
    cfg: LossConfig,
    model_type: str = "s1",
    train: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array], Optional[Dict[str, Any]]]:
    """Returns (total_loss, per-term metrics, updated mutable state).

    batch keys: xs [B,H,W,2], xh [B,72], cam_ext [B,4,4], cam_int [B,3,3],
    max_d [B], scene_idx [B].
    """
    xh = batch["xh"]
    cam_int = batch["cam_int"]
    cam_ext = batch["cam_ext"]
    max_d = batch["max_d"]
    if batch["xs"].dtype != jnp.float32:
        # bf16-staged snapshots (TrainConfig.stage_bf16): model math
        # stays f32, only the host->device wire format is narrowed
        batch = dict(batch, xs=batch["xs"].astype(jnp.float32))

    xhn = normalize_global_T(xh, cam_int, max_d)
    xhnr = convert_to_6D_rot(xhn)

    mutable = ["batch_stats"] if train else False
    if model_type == "s1":
        out = model.apply(variables, xhnr, batch["xs"], key, train=train, mutable=mutable)
        (xhnr_rec, mu, logvar), new_state = out if train else (out, None)
        loss_kl = fca**2 * cfg.weight_loss_kl * kl_normal_loss(mu, logvar)
        kl_metrics = {"kl": loss_kl}
    elif model_type == "s2":
        out = model.apply(variables, xhnr, batch["xs"], key, train=train, mutable=mutable)
        (xhnr_rec, mu_g, lv_g, mu_l, lv_l), new_state = out if train else (out, None)
        loss_kl_g = fca**2 * cfg.weight_loss_kl * kl_normal_loss(mu_g, lv_g)
        loss_kl_l = fca**2 * cfg.weight_loss_kl * kl_normal_loss(mu_l, lv_l)
        loss_kl = loss_kl_g + loss_kl_l
        kl_metrics = {"kl": loss_kl, "kl_g": loss_kl_g, "kl_l": loss_kl_l}
    else:  # pragma: no cover
        raise ValueError(f"unknown model_type {model_type}")

    xhn_rec = convert_to_3D_rot(xhnr_rec)
    xh_rec = recover_global_T(xhn_rec, cam_int, max_d)

    loss_rec_t = cfg.weight_loss_rec_h * (
        0.5 * l1_loss(xhnr_rec[:, :3], xhnr[:, :3]) + 0.5 * l1_loss(xh_rec[:, :3], xh[:, :3])
    )
    loss_rec_p = cfg.weight_loss_rec_h * l1_loss(xhnr_rec[:, 3:], xhnr[:, 3:])
    loss_vposer = cfg.weight_loss_vposer * vposer_reg_loss(xh_rec[:, 16:48])

    raw_contact, raw_collision = scene_geometry_losses(
        assets, xh_rec, cam_ext, batch["scene_idx"], cfg.contact_denom_offset,
        prune_scene_points=cfg.prune_scene_points,
    )
    loss_contact = f_scene * cfg.weight_contact * raw_contact
    loss_collision = f_scene * cfg.weight_collision * raw_collision

    total = loss_rec_t + loss_rec_p + loss_kl + loss_vposer + loss_contact + loss_collision
    metrics = {
        "loss": total,
        "rec_t": loss_rec_t,
        "rec_p": loss_rec_p,
        "vposer": loss_vposer,
        "contact": loss_contact,
        "collision": loss_collision,
        **kl_metrics,
    }
    return total, metrics, new_state
