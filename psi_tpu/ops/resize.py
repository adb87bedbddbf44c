"""Bilinear image resize with torch F.interpolate(align_corners=False) parity.

Used by the snapshot preprocessing (reference: source/batch_gen_hdf5.py:
359-441 resizes depth/seg maps onto a 128x128 canvas with
``F.interpolate(mode='bilinear', align_corners=False)``).

``jax.image.resize(method='linear')`` uses the same half-pixel-center
convention and, like torch's default, applies no antialiasing filter —
so it is numerically equivalent; the test suite pins this against torch.
"""

from __future__ import annotations

import jax


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize the last two axes of ``img`` to (out_h, out_w), bilinear,
    half-pixel centers (torch align_corners=False)."""
    out_shape = img.shape[:-2] + (out_h, out_w)
    return jax.image.resize(img, out_shape, method="linear", antialias=False)
