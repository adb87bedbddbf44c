"""Individual loss terms of the PSI objective.

Semantics pinned to the reference (source/train_s1.py:95-207,
fitting_proxe.py:101-162); each term is a pure scalar function so the
composite losses in psi_tpu.train / psi_tpu.fit just weight and sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from psi_tpu.ops.sdf import sdf_penetration_loss


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    """mean |a - b| (torch F.l1_loss default reduction)."""
    return jnp.mean(jnp.abs(a - b))


def kl_normal_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """0.5 * mean(exp(logvar) + mu^2 - 1 - logvar)  (train_s1.py:127-128)."""
    return 0.5 * jnp.mean(jnp.exp(logvar) + mu**2 - 1.0 - logvar)


def vposer_reg_loss(pose_vp: jax.Array) -> jax.Array:
    """mean(z^2) on the VPoser latent slice (train_s1.py:132-133)."""
    return jnp.mean(pose_vp**2)


def contact_robust_loss(contact_dist: jax.Array, denom_offset: float = 1.0) -> jax.Array:
    """mean( sqrt(d + 1e-4) / (sqrt(d + 1e-4) + denom_offset) ).

    The robust saturating contact distance. denom_offset is 1.0 in
    training (train_s1.py:175-177), 0.01 in PROX-E fitting
    (fitting_proxe.py:139), 1.0 in MP3D-R fitting (fitting_habitat.py:141).
    """
    s = jnp.sqrt(contact_dist + 1e-4)
    return jnp.mean(s / (s + denom_offset))


def collision_loss(body_sdf: jax.Array) -> jax.Array:
    """mean |sdf| over penetrating vertices, 0 when none (train_s1.py:193-198)."""
    return sdf_penetration_loss(body_sdf)
