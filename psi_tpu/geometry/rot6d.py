"""Rotation representations: 6D continuous <-> rotation matrix <-> axis-angle.

TPU-native re-derivation of the reference's ``ContinousRotReprDecoder``
(reference: source/cvae.py:36-89) and the torchgeometry conversions it
calls (``tgm.angle_axis_to_rotation_matrix`` /
``tgm.rotation_matrix_to_angle_axis``). Everything here is pure jnp,
batched over leading axes, fully differentiable, and safe at the
singularities (angle -> 0, angle -> pi) via smooth Taylor fallbacks so
gradients never produce NaNs under jit.

Conventions (matching the reference):
* The 6D representation is the first two *columns* of the rotation
  matrix, flattened row-major: [r00, r01, r10, r11, r20, r21]
  (reference: source/cvae.py:117-126 packs ``mat[:, :, :2]``).
* Decoding Gram-Schmidts column 0, orthogonalizes column 1, and takes
  the cross product for column 2 (reference: source/cvae.py:58-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    """L2-normalize, matching torch.nn.functional.normalize (eps=1e-12)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-12)


def rot6d_to_matrix(x6: jax.Array) -> jax.Array:
    """[..., 6] continuous 6D representation -> [..., 3, 3] rotation matrix.

    Mirrors ContinousRotReprDecoder.decode (reference: source/cvae.py:58-68):
    view as [..., 3, 2] (two matrix columns), Gram-Schmidt.
    """
    batch_shape = x6.shape[:-1]
    m = x6.reshape(batch_shape + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = _normalize(a1)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = _normalize(a2 - dot * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 6] (first two columns, row-major)."""
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))


def aa_to_matrix(aa: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Smooth at theta=0 via Taylor expansion of sin(t)/t and (1-cos t)/t^2,
    so it is differentiable everywhere (the reference relies on
    tgm.angle_axis_to_rotation_matrix which has the same behavior).
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # [..., 1]

    # sin(t)/t and (1 - cos t)/t^2 with Taylor fallback near 0. The
    # unselected branch of a jnp.where still contributes to gradients
    # (NaN * 0 = NaN), so divide by a sanitized theta2 (double-where).
    small = theta2 < 1e-8
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )  # [..., 3, 3] skew of the *unnormalized* axis-angle
    # 3x3 matmul in full precision (TPU matmuls default to bf16 inputs).
    K2 = jnp.matmul(K, K, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=aa.dtype)
    return eye + sinc[..., None] * K + cosc[..., None] * K2


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> unit quaternion [..., 4] (w, x, y, z).

    Branchless Shepperd's method: compute all four candidate quaternions
    and select the numerically largest pivot with jnp.where — jit/vmap
    friendly and stable at angle=pi where trace-based formulas blow up.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four pivot magnitudes: 4w^2, 4x^2, 4y^2, 4z^2 (shifted by +1).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions, each scaled by its pivot (computed safely).
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    sw = safe_sqrt(qw2)  # = 2|w|
    sx = safe_sqrt(qx2)
    sy = safe_sqrt(qy2)
    sz = safe_sqrt(qz2)

    # pivot w
    q_w = jnp.stack(
        [0.5 * sw, (m21 - m12) / (2.0 * sw), (m02 - m20) / (2.0 * sw), (m10 - m01) / (2.0 * sw)],
        axis=-1,
    )
    # pivot x
    q_x = jnp.stack(
        [(m21 - m12) / (2.0 * sx), 0.5 * sx, (m01 + m10) / (2.0 * sx), (m02 + m20) / (2.0 * sx)],
        axis=-1,
    )
    # pivot y
    q_y = jnp.stack(
        [(m02 - m20) / (2.0 * sy), (m01 + m10) / (2.0 * sy), 0.5 * sy, (m12 + m21) / (2.0 * sy)],
        axis=-1,
    )
    # pivot z
    q_z = jnp.stack(
        [(m10 - m01) / (2.0 * sz), (m02 + m20) / (2.0 * sz), (m12 + m21) / (2.0 * sz), 0.5 * sz],
        axis=-1,
    )

    # Select the candidate with the largest pivot.
    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # [..., 4]
    best = jnp.argmax(pivots, axis=-1)[..., None]  # [..., 1]
    q = jnp.where(
        best == 0,
        q_w,
        jnp.where(best == 1, q_x, jnp.where(best == 2, q_y, q_z)),
    )
    # Canonicalize sign: w >= 0 (matches tgm's effective convention for
    # recovering the minimal-angle axis-angle).
    q = jnp.where(q[..., :1] < 0, -q, q)
    return _normalize(q)


def quat_to_aa(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (w,x,y,z) -> axis-angle [..., 3]."""
    w = q[..., 0]
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1)  # |sin(theta/2)|
    theta = 2.0 * jnp.arctan2(sin_half, w)
    # aa = v * theta / sin_half; near zero use 2/w Taylor: theta/sin_half ~ 2/w.
    small = sin_half < 1e-6
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(jnp.abs(w), _EPS),
        theta / jnp.maximum(sin_half, _EPS),
    )
    return v * scale[..., None]


def matrix_to_aa(R: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> axis-angle [..., 3].

    Equivalent of tgm.rotation_matrix_to_angle_axis as used at
    reference source/cvae.py:71-80 (matrix -> quaternion -> angle-axis).
    """
    return quat_to_aa(matrix_to_quat(R))


def aa_to_rot6d(aa: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> 6D representation [..., 6]."""
    return matrix_to_rot6d(aa_to_matrix(aa))


def rot6d_to_aa(x6: jax.Array) -> jax.Array:
    """6D representation [..., 6] -> axis-angle [..., 3]."""
    return matrix_to_aa(rot6d_to_matrix(x6))
