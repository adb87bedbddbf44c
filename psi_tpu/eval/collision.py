"""Physical plausibility: non-collision and contact scores.

Protocol parity with utils/utils_eval_collision_habitat.py:121-140:
per body, decode the SMPL-X mesh, look up every vertex in the scene
SDF; non-collision = fraction of vertices with sdf > 0, contact
indicator = 1 if any vertex has sdf < 0. Scores are means over the
population. One jit program evaluates the whole population.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from psi_tpu.body.decode import body_vec_to_verts
from psi_tpu.ops.sdf import sdf_trilinear_packed
from psi_tpu.train.objective import SceneAssets


@jax.jit
def _scores(assets: SceneAssets, x72: jax.Array, cam_ext: jax.Array, scene_idx: jax.Array):
    verts, _ = body_vec_to_verts(assets.smplx, assets.vposer_params, x72, cam_ext)
    sdf = sdf_trilinear_packed(
        assets.sdf_packed, scene_idx, verts, assets.grid_mins, assets.grid_maxs
    )  # [N, V]
    non_collision = jnp.mean((sdf > 0).astype(jnp.float32), axis=1)  # [N]
    contact = (jnp.sum((sdf < 0).astype(jnp.float32), axis=1) > 0).astype(jnp.float32)
    return non_collision, contact


def collision_contact_scores(
    assets: SceneAssets,
    x72: np.ndarray,
    cam_ext: np.ndarray,
    scene_idx: np.ndarray,
) -> Tuple[float, float]:
    """Returns (mean non-collision score, mean contact score)."""
    nc, ct = _scores(
        assets, jnp.asarray(x72), jnp.asarray(cam_ext), jnp.asarray(scene_idx, dtype=jnp.int32)
    )
    return float(jnp.mean(nc)), float(jnp.mean(ct))
