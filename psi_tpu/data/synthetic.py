"""Synthetic data fixtures: batches + full asset bundles.

The reference has no CI-runnable data (PROX requires registration); the
framework's tests and benchmarks run on structurally-faithful synthetic
fixtures: random scenes (SDF + point cloud), random SMPL-X/VPoser
weights, and body vectors with valid camera geometry. Real data drops
in through the same interfaces.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from psi_tpu.body.smplx_model import SMPLXModel, synthetic_smplx
from psi_tpu.body.vposer import synthetic_vposer_params
from psi_tpu.data.scenes import SceneRegistry, synthetic_scene_registry
from psi_tpu.geometry.contact import synthetic_contact_ids
from psi_tpu.train.objective import SceneAssets


def registry_to_device(registry: SceneRegistry):
    return (
        jnp.asarray(registry.sdf_stack),
        jnp.asarray(registry.grid_mins),
        jnp.asarray(registry.grid_maxs),
        jnp.asarray(registry.verts_stack),
    )


def make_assets(
    smplx: SMPLXModel,
    vposer_params,
    contact_vids: np.ndarray,
    registry: SceneRegistry,
    sdf_dtype=None,
) -> SceneAssets:
    """sdf_dtype: pack the SDF corner grid in this dtype (e.g. jnp.bfloat16
    to halve HBM for large registries; lerp still accumulates f32)."""
    from psi_tpu.ops.sdf import pack_sdf_corners

    sdf, gmin, gmax, verts = registry_to_device(registry)
    packed = pack_sdf_corners(sdf)
    if sdf_dtype is not None:
        packed = packed.astype(sdf_dtype)
    return SceneAssets(
        smplx=smplx,
        vposer_params=vposer_params,
        contact_vids=jnp.asarray(contact_vids),
        sdf_packed=packed,
        grid_mins=gmin,
        grid_maxs=gmax,
        scene_verts=verts,
    )


def make_synthetic_assets(
    num_verts: int = 10475,
    num_joints: int = 55,
    num_scenes: int = 4,
    sdf_dim: int = 32,
    scene_points: int = 2000,
    n_contact: int = 1024,
    seed: int = 0,
    sdf_dtype=None,
) -> Tuple[SceneAssets, SceneRegistry]:
    smplx = synthetic_smplx(num_verts=num_verts, num_joints=num_joints, seed=seed)
    vposer = synthetic_vposer_params(seed=seed)
    contact = synthetic_contact_ids(num_verts, n_contact=n_contact, seed=seed)
    registry = synthetic_scene_registry(
        num_scenes=num_scenes, dim=sdf_dim, num_verts=scene_points, seed=seed
    )
    return make_assets(smplx, vposer, contact, registry, sdf_dtype=sdf_dtype), registry


def random_body_batch(rng: np.random.Generator, batch_size: int, max_d: np.ndarray) -> np.ndarray:
    """[B, 72] body vectors with positive camera-frame depth."""
    xh = (rng.normal(size=(batch_size, 72)) * 0.3).astype(np.float32)
    xh[:, 2] = rng.uniform(0.5, 0.9, batch_size).astype(np.float32) * max_d
    return xh


def random_camera_batch(rng: np.random.Generator, batch_size: int):
    cam_int = np.zeros((batch_size, 3, 3), np.float32)
    cam_int[:, 0, 0] = rng.uniform(500, 1100, batch_size)
    cam_int[:, 1, 1] = rng.uniform(500, 1100, batch_size)
    cam_int[:, 0, 2] = rng.uniform(250, 550, batch_size)
    cam_int[:, 1, 2] = rng.uniform(250, 550, batch_size)
    cam_int[:, 2, 2] = 1.0

    cam_ext = np.tile(np.eye(4, dtype=np.float32), (batch_size, 1, 1))
    # small random rigid transform
    from psi_tpu.geometry.rot6d import aa_to_matrix

    aa = rng.normal(0, 0.3, size=(batch_size, 3)).astype(np.float32)
    cam_ext[:, :3, :3] = np.asarray(aa_to_matrix(jnp.asarray(aa)))
    cam_ext[:, :3, 3] = rng.normal(0, 0.5, size=(batch_size, 3))
    return cam_ext, cam_int


class SyntheticBatchGenerator:
    """Drop-in replacement for BatchGeneratorWithSceneMesh on random data."""

    def __init__(
        self,
        num_scenes: int = 4,
        batches_per_epoch: int = 4,
        seed: int = 0,
        image_size: int = 128,
    ):
        self.num_scenes = num_scenes
        self.batches_per_epoch = batches_per_epoch
        self.image_size = image_size
        self._rng = np.random.default_rng(seed)
        self._count = 0

    def reset(self):
        self._count = 0

    def has_next_batch(self) -> bool:
        return self._count < self.batches_per_epoch

    def next_batch(self, batch_size: int) -> Optional[Dict[str, np.ndarray]]:
        if not self.has_next_batch():
            return None
        self._count += 1
        rng = self._rng
        s = self.image_size
        max_d = rng.uniform(4.0, 6.0, batch_size).astype(np.float32)
        cam_ext, cam_int = random_camera_batch(rng, batch_size)
        return {
            "xs": rng.uniform(-1, 1, size=(batch_size, s, s, 2)).astype(np.float32),
            "xh": random_body_batch(rng, batch_size, max_d),
            "cam_ext": cam_ext,
            "cam_int": cam_int,
            "max_d": max_d,
            "scene_idx": rng.integers(0, self.num_scenes, batch_size).astype(np.int32),
        }
