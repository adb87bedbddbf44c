"""Split-bf16 matmuls: ~f32 accuracy at bf16 MXU throughput.

TPU MXUs multiply in bf16; f32-HIGHEST emulates f32 with 6 passes. The
classic alternative decomposes each operand into high/low bf16 halves
(x = xh + xl exactly up to ~2^-16 relative) and evaluates

    a.b  ~=  ah.bh + al.bh + ah.bl        (drops the ~2^-32 al.bl term)

as ONE bf16 contraction over a 3x-widened K axis — ~2x fewer MXU cycles
than HIGHEST with ~16-bit-mantissa accuracy, plenty for vertex-grade
geometry (sub-0.1mm at metre scale).

The hi half MUST round via jax.lax.reduce_precision: a plain
f32->bf16->f32 cast round-trip is elided by XLA's allow-excess-precision
pass, which silently zeroes the lo half (discovered the hard way; see
ops/chamfer.py which uses the same trick inside the Pallas NN kernel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hi_lo(x: jax.Array):
    hi_f = jax.lax.reduce_precision(x, 8, 7)
    return hi_f.astype(jnp.bfloat16), (x - hi_f).astype(jnp.bfloat16)


def split3(x: jax.Array, axis: int) -> jax.Array:
    """Widen the contraction axis 3x with (hi, lo, hi) blocks (lhs form)."""
    hi, lo = _hi_lo(x)
    return jnp.concatenate([hi, lo, hi], axis=axis)


def split3_rhs(x: jax.Array, axis: int) -> jax.Array:
    """(hi, hi, lo) blocks — pairs with split3 so the contraction yields
    ah.bh + al.bh + ah.bl."""
    hi, lo = _hi_lo(x)
    return jnp.concatenate([hi, hi, lo], axis=axis)


def matmul_f32x3(a: jax.Array, b: jax.Array) -> jax.Array:
    """jnp.matmul(a, b) (contraction: a's last axis x b's second-to-last,
    standard batching) with split-bf16 accuracy. Output f32."""
    a3 = split3(a, axis=-1)
    b3 = split3_rhs(b, axis=-2)
    return jnp.matmul(a3, b3, preferred_element_type=jnp.float32)


def einsum_f32x3(spec: str, a: jax.Array, b: jax.Array, a_axis: int, b_axis: int) -> jax.Array:
    """jnp.einsum(spec, a, b) with the contraction axes (a_axis in a,
    b_axis in b) split-widened. The spec must contract exactly that one
    shared index."""
    a3 = split3(a, axis=a_axis)
    b3 = split3_rhs(b, axis=b_axis)
    return jnp.einsum(spec, a3, b3, preferred_element_type=jnp.float32)
