"""The canonical 72/75-D body parameter vector: layout, codecs, packing.

TPU-native equivalent of the reference's ``BodyParamParser`` plus the
6D-rotation body-vector converters in ``GeometryTransformer``
(reference: source/cvae.py:117-137, 217-334).

Layout of the 72-D vector (reference: source/cvae.py:227-232):
    [0:3]   transl          global translation (camera frame)
    [3:6]   global_orient   axis-angle global rotation
    [6:16]  betas           SMPL-X shape coefficients
    [16:48] body_pose_vp    VPoser 32-D latent
    [48:60] left_hand_pose  12 PCA coefficients
    [60:72] right_hand_pose 12 PCA coefficients

The 75-D variant replaces the 3-D axis-angle at [3:6] by the 6D
continuous rotation at [3:9]; everything after shifts by +3.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.geometry.rot6d import aa_to_rot6d, rot6d_to_aa

# name -> (start, stop) in the 72-D vector
BODY72_LAYOUT: Dict[str, tuple] = {
    "transl": (0, 3),
    "global_orient": (3, 6),
    "betas": (6, 16),
    "body_pose_vp": (16, 48),
    "left_hand_pose": (48, 60),
    "right_hand_pose": (60, 72),
}


def convert_to_6D_rot(x: jax.Array) -> jax.Array:
    """72-D body vector (axis-angle rot at [3:6]) -> 75-D (6D rot at [3:9]).

    Mirrors reference source/cvae.py:117-126.
    """
    xt = x[..., :3]
    xr = x[..., 3:6]
    xb = x[..., 6:]
    return jnp.concatenate([xt, aa_to_rot6d(xr), xb], axis=-1)


def convert_to_3D_rot(x: jax.Array) -> jax.Array:
    """75-D body vector (6D rot at [3:9]) -> 72-D (axis-angle at [3:6]).

    Mirrors reference source/cvae.py:128-137.
    """
    xt = x[..., :3]
    xr = x[..., 3:9]
    xb = x[..., 9:]
    return jnp.concatenate([xt, rot6d_to_aa(xr), xb], axis=-1)


def body_params_encapsulate(x72: jax.Array) -> Dict[str, jax.Array]:
    """Split a [B, 72] body vector into the named SMPL-X kwargs dict.

    Batched equivalent of BodyParamParser.body_params_encapsulate_batch
    (reference: source/cvae.py:238-249).
    """
    return {k: x72[..., a:b] for k, (a, b) in BODY72_LAYOUT.items()}


def body_params_parse(params: Dict[str, "np.ndarray | jax.Array"]) -> jax.Array:
    """Concatenate a SMPL-X kwargs dict back into the [B, 72] body vector.

    Equivalent of BodyParamParser.body_params_parse
    (reference: source/cvae.py:273-301); device placement is the
    caller's concern in JAX.
    """
    order = ["transl", "global_orient", "betas", "body_pose_vp", "left_hand_pose", "right_hand_pose"]
    # Accept the reference's pickle key 'body_pose' as an alias for the
    # VPoser latent slot (reference pickles use 'body_pose' for the 32-D
    # latent, source/cvae.py:230).
    def get(k):
        if k == "body_pose_vp" and k not in params:
            return params["body_pose"]
        return params[k]

    parts = [jnp.asarray(get(k), dtype=jnp.float32) for k in order]
    return jnp.concatenate(parts, axis=-1)


def body_params_encapsulate_list(x72: np.ndarray) -> list:
    """Per-sample list of numpy dicts for pickling results.

    Equivalent of BodyParamParser.body_params_encapsulate
    (reference: source/cvae.py:219-235): uses key 'body_pose' for the
    VPoser latent to stay pickle-compatible with the reference tooling.
    """
    x = np.asarray(x72)
    out = []
    for b in range(x.shape[0]):
        row = x[b : b + 1]
        out.append(
            {
                "transl": row[:, 0:3],
                "global_orient": row[:, 3:6],
                "betas": row[:, 6:16],
                "body_pose": row[:, 16:48],
                "left_hand_pose": row[:, 48:60],
                "right_hand_pose": row[:, 60:72],
            }
        )
    return out


def body_params_encapsulate_latent(x72: np.ndarray, eps: np.ndarray) -> list:
    """Per-sample list of numpy dicts with the latent code attached.

    Equivalent of BodyParamParser.body_params_encapsulate_latent
    (reference: source/cvae.py:251-271): like body_params_encapsulate_list
    but each dict carries the [1, zdim] latent under key 'z', used when
    logging which noise produced which body.
    """
    eps_np = np.asarray(eps)
    if eps_np.shape[0] != np.asarray(x72).shape[0]:
        raise ValueError(
            f"eps batch {eps_np.shape[0]} != body batch {np.asarray(x72).shape[0]}"
        )
    out = body_params_encapsulate_list(x72)
    for b, d in enumerate(out):
        d["z"] = eps_np[b : b + 1, :]
    return out
