"""BodyModel / BodyModelWithPoser — high-level body-model wrappers.

Rebuild of the vendored wrappers (reference: human_body_prior/
body_model/body_model.py:34-458): a unified front over
SMPL/SMPL-H/SMPL-X/MANO npz assets returning a result struct with
vertices/faces/joints, plus the VPoser-latent variant whose body pose
lives in the prior's latent space, with pose randomization and a
self-interpenetration untangler.

Differences by design:
* state is explicit (a params dict), not nn.Parameter mutation;
* the untangler optimizes with our L-BFGS strong-Wolfe
  (psi_tpu.utils.lbfgs) over a *sphere-proxy* self-penetration loss on
  subsampled vertices — the reference's path needs an external BVH CUDA
  extension (body_model.py:468-475) that has no TPU analogue; the
  proxy reproduces the behavior (push apart interpenetrating,
  non-adjacent body parts) with an O(K^2) distance check that maps to
  the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.body.smplx_model import SMPLXModel, load_smplx_npz, smplx_forward, synthetic_smplx
from psi_tpu.body.vposer import vposer_decode


@dataclasses.dataclass
class BodyResult:
    v: jax.Array  # [B, V, 3]
    f: np.ndarray  # [F, 3]
    Jtr: jax.Array  # [B, J, 3]


class BodyModel:
    """Callable body model over explicit pose/shape params.

    params keys (all optional, zeros by default): transl, root_orient,
    betas, pose_body [B, 63], pose_hand (left+right PCA), expression.
    """

    def __init__(self, model: SMPLXModel, batch_size: int = 1):
        self.model = model
        self.batch_size = batch_size

    @classmethod
    def from_npz(cls, npz_path: str, batch_size: int = 1, **kw) -> "BodyModel":
        return cls(load_smplx_npz(npz_path, **kw), batch_size=batch_size)

    @classmethod
    def synthetic(cls, batch_size: int = 1, **kw) -> "BodyModel":
        return cls(synthetic_smplx(**kw), batch_size=batch_size)

    def _default(self, params: Dict[str, Any], key: str, dim: int) -> jax.Array:
        if key in params and params[key] is not None:
            return jnp.asarray(params[key])
        return jnp.zeros((self.batch_size, dim), jnp.float32)

    def __call__(self, **params) -> BodyResult:
        b = self.batch_size
        n_pca = self.model.hands_components_l.shape[0]
        pose_hand = params.get("pose_hand")
        if pose_hand is not None:
            lh, rh = jnp.split(jnp.asarray(pose_hand), 2, axis=-1)
        else:
            lh = self._default(params, "left_hand_pose", n_pca)
            rh = self._default(params, "right_hand_pose", n_pca)
        verts, joints = smplx_forward(
            self.model,
            transl=self._default(params, "transl", 3),
            global_orient=self._default(params, "root_orient", 3),
            betas=self._default(params, "betas", self.model.shapedirs.shape[-1]),
            body_pose=self._default(params, "pose_body", 63),
            left_hand_pose=lh,
            right_hand_pose=rh,
        )
        return BodyResult(v=verts, f=self.model.faces, Jtr=joints)


class BodyModelWithPoser(BodyModel):
    """Body pose expressed as a VPoser latent (reference
    body_model.py:281-400): forward decodes poZ_body through the prior."""

    def __init__(self, model: SMPLXModel, vposer_params: Dict[str, Any], batch_size: int = 1):
        super().__init__(model, batch_size)
        self.vposer_params = vposer_params
        self.poZ_body = jnp.zeros((batch_size, 32), jnp.float32)

    def __call__(self, **params) -> BodyResult:
        poZ = jnp.asarray(params.pop("poZ_body", self.poZ_body))
        pose_body = vposer_decode(self.vposer_params, poZ)
        return super().__call__(pose_body=pose_body, **params)

    def randomize_pose(self, key: Optional[jax.Array] = None) -> None:
        """Draw poZ_body ~ N(0, 1) (reference body_model.py:381-400)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        self.poZ_body = jax.random.normal(key, self.poZ_body.shape)

    def untangle_interpenetrations(
        self,
        max_iter: int = 30,
        n_samples: int = 512,
        radius: float = 0.04,
        prior_weight: float = 0.1,
        seed: int = 0,
    ) -> None:
        """Resolve self-interpenetration by LBFGS over poZ_body.

        Proxy objective: subsample vertices, penalize pairs closer than
        ``radius`` that are farther apart in the rest pose (so adjacent
        surface stays untouched), plus a latent prior pull. Replaces the
        reference's BVH-CUDA pathway (body_model.py:402-458)."""
        from psi_tpu.utils.lbfgs import lbfgs_minimize

        rng = np.random.default_rng(seed)
        sel = jnp.asarray(
            np.sort(rng.choice(self.model.num_verts, size=min(n_samples, self.model.num_verts), replace=False))
        )
        rest = self.model.v_template[sel]
        rest_d2 = jnp.sum((rest[:, None, :] - rest[None, :, :]) ** 2, axis=-1)
        # pairs that are separated at rest but could collide when posed
        mask = rest_d2 > (4.0 * radius) ** 2

        z0 = self.poZ_body

        def objective(z):
            pose_body = vposer_decode(self.vposer_params, z)
            verts, _ = smplx_forward(
                self.model,
                transl=jnp.zeros((self.batch_size, 3)),
                global_orient=jnp.zeros((self.batch_size, 3)),
                betas=jnp.zeros((self.batch_size, self.model.shapedirs.shape[-1])),
                body_pose=pose_body,
            )
            p = verts[:, sel, :]
            d2 = jnp.sum((p[:, :, None, :] - p[:, None, :, :]) ** 2, axis=-1)
            pen = jnp.maximum(radius**2 - d2, 0.0) * mask[None]
            return jnp.sum(pen) + prior_weight * jnp.mean(z**2)

        res = lbfgs_minimize(objective, z0, max_iter=max_iter)
        self.poZ_body = res.x
