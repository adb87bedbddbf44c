"""Fused Pallas skinning: the whole vertex path of LBS in one kernel.

The LBS vertex chain (reference: human_body_prior/body_model/lbs.py:91-116
plus the camera application at source/cvae.py:141-149) is, per vertex v
and body b:

    v_posed[b,v]  = v_template[v] + shapedirs[v]·betas[b] + posedirs[v]·pf[b]
    T[b,v]        = sum_j lbs_weights[v,j] * A[b,j]          (3x4 blend)
    verts[b,v]    = T[b,v,:,:3] @ v_posed[b,v] + T[b,v,:,3]
    out[b,v]      = camR[b] @ (verts[b,v] + transl[b]) + camT[b]

Evaluated as separate einsums, XLA materializes every [B,V,*]
intermediate in HBM (v_shaped, pose_offsets, v_posed, the [B,V,12]
blended transforms, verts, the camera product) — ~350 MB of round
trips per forward at B=256/V=10475, and more in the transposed
backward. That HBM traffic, not FLOPs, is the measured floor of the
fitting loop's cheap iterations (scripts/profile_cheap_iter.py,
ROUND_NOTES.md round-3 perf profile).

This kernel re-associates the math so nothing [B,V,*]-shaped touches
HBM except the final output (and, in the backward, the incoming
cotangent). Per 256-vertex tile, with every per-body operand
VMEM-resident across the whole grid:

    cb[b]    = [1 | betas[b] | pf[b]]                  (C = 1+L+(J-1)*9)
    base_y   = [v_template_y | shapedirs_y | posedirs_y]    [C, V]
    vp_y     = cb @ base_y                              [B, Vt]  (MXU)
    T_xy     = A[:, :, 4x+y] @ w                        [B, Vt]  (MXU)
    out_x    = T_x3 + sum_y T_xy * vp_y                 (VPU)
    fin_x    = cam[:, 4x+3] + sum_y cam[:, 4x+y] * out_y

The transl add and the camera extrinsics are folded into the cam rows
outside the kernel (camR@(v+t)+camT == camR@v + (camR@t+camT)), so the
epilogue applies both for free.

Inputs are bf16 with f32 accumulation: the same single-pass-bf16 MXU
tier as ``lbs(precision='fast')`` — ~2^-8-relative vertex error, whose
protocol-score impact is recorded in PARITY.md / EVAL_SYNTH.md.
Exposed as the opt-in ``FitConfig.lbs_precision='fused'``.

The backward is a second Pallas kernel over the same grid that
recomputes vp/T per tile (cheap MXU dots; nothing is saved from the
forward) and accumulates g_cb [B,C], g_A [B,J,12] and g_cam [B,16]
across the sequential grid steps.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Vertex tile (lane-dim multiple of 128). The bwd kernel issues ~30
# MXU dots per tile, so per-dot pipeline overhead matters; the tile
# size trades dot count against VMEM block size and pad waste
# (sweep: scripts/profile_fused_vt.py). Env override for sweeps.
_VT = int(os.environ.get("PSI_FUSED_VT", "256"))

# Merge the 12 per-plane blend dots (T_xy = A[:,:,z] @ w) into ONE
# stacked [12*Bp, Jp] @ [Jp, VT] dot — and, in the backward, the 12
# g_A plane dots into one [12*Bp, VT] @ [VT, Jp] dot with a single
# full-block accumulator RMW. Mathematically identical (each output
# row is the same independent dot product; f32 accumulation either
# way); cuts the per-tile dot count fwd 15->4 / bwd 30->10 where
# per-dot MXU pipeline overhead, not FLOPs, is the measured floor.
_MERGED = os.environ.get("PSI_FUSED_MERGED", "0") == "1"

# Mosaic's default scoped-VMEM budget is 16 MiB; _VT=512 wants ~20.5.
# Set PSI_FUSED_VMEM_MB to raise it for tile-size sweeps.
_VMEM_MB = int(os.environ.get("PSI_FUSED_VMEM_MB", "0"))


def _compiler_params():
    if _VMEM_MB <= 0:
        return None
    from jax.experimental.pallas import tpu as pltpu

    cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    return cls(vmem_limit_bytes=_VMEM_MB * 1024 * 1024)
_JP = 128  # padded joint count (contraction dim of the blend dots)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class SkinningBundle(NamedTuple):
    """Constant operands for the fused kernel (built inside the jitted
    program from the SMPL-X tensors — pure device math, so nothing
    large is baked into the executable as a constant).

    n_verts / n_feat are Python ints (static at trace time)."""

    base_cv: Tuple[jax.Array, jax.Array, jax.Array]  # 3 x [Cp, Vpad] bf16
    base_vc: Tuple[jax.Array, jax.Array, jax.Array]  # 3 x [Vpad, Cp] bf16
    w_jv: jax.Array  # [Jp, Vpad] bf16
    w_vj: jax.Array  # [Vpad, Jp] bf16
    n_verts: int
    n_feat: int


def make_skinning_bundle(
    v_template: jax.Array,  # [V, 3]
    shapedirs: jax.Array,  # [V, 3, L]
    posedirs: Optional[jax.Array],  # [(J-1)*9, V*3] or None
    lbs_weights: jax.Array,  # [V, J]
) -> SkinningBundle:
    V = v_template.shape[0]
    L = shapedirs.shape[-1]
    P = posedirs.shape[0] if posedirs is not None else 0
    C = 1 + L + P
    Vpad, Cp = _ceil_to(V, _VT), _ceil_to(C, 128)
    J = lbs_weights.shape[1]

    # [C, V] per coordinate: row 0 = template, rows 1..L = shapedirs,
    # rows L+1.. = posedirs
    parts = [v_template.T[:, None, :], jnp.transpose(shapedirs, (1, 2, 0))]
    if posedirs is not None:
        parts.append(jnp.transpose(posedirs.reshape(P, V, 3), (2, 0, 1)))
    base = jnp.concatenate(parts, axis=1)  # [3, C, V]
    base = jnp.pad(base, ((0, 0), (0, Cp - C), (0, Vpad - V))).astype(jnp.bfloat16)
    baseT = jnp.transpose(base, (0, 2, 1))

    w = jnp.pad(lbs_weights, ((0, Vpad - V), (0, _JP - J))).astype(jnp.bfloat16)
    return SkinningBundle(
        base_cv=(base[0], base[1], base[2]),
        base_vc=(baseT[0], baseT[1], baseT[2]),
        w_jv=w.T,
        w_vj=w,
        n_verts=V,
        n_feat=C,
    )


def _blend_T(a_ref, w):
    """The 12 blend dots T[x][y] = A[:,:,4x+y] @ w, either as 12 small
    MXU dots or (merged) one [12*Bp, Jp] @ [Jp, VT] dot — per-row
    results are identical; the merged form amortizes per-dot MXU
    pipeline overhead (see _MERGED)."""
    if _MERGED:
        a = a_ref[...]  # [12, Bp, Jp]
        t = jnp.dot(
            a.reshape(a.shape[0] * a.shape[1], a.shape[2]), w,
            preferred_element_type=jnp.float32,
        ).reshape(a.shape[0], a.shape[1], w.shape[1])
        return [[t[4 * x + y] for y in range(4)] for x in range(3)]
    return [
        [jnp.dot(a_ref[4 * x + y], w, preferred_element_type=jnp.float32) for y in range(4)]
        for x in range(3)
    ]


def _fwd_kernel(cb_ref, a_ref, cam_ref, bx_ref, by_ref, bz_ref, w_ref, out_ref):
    vp = [
        jnp.dot(cb_ref[...], b[...], preferred_element_type=jnp.float32)
        for b in (bx_ref, by_ref, bz_ref)
    ]
    T = _blend_T(a_ref, w_ref[...])
    out = [T[x][3] + T[x][0] * vp[0] + T[x][1] * vp[1] + T[x][2] * vp[2] for x in range(3)]
    for x in range(3):
        out_ref[x] = cam_ref[:, 4 * x + 3 : 4 * x + 4] + sum(
            cam_ref[:, 4 * x + y : 4 * x + y + 1] * out[y] for y in range(3)
        )


def _bwd_kernel(
    cb_ref, a_ref, cam_ref, bx_ref, by_ref, bz_ref, wjv_ref,
    bvx_ref, bvy_ref, bvz_ref, wvj_ref, g_ref,
    gcb_ref, ga_ref, gcam_ref,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gcb_ref[...] = jnp.zeros_like(gcb_ref)
        ga_ref[...] = jnp.zeros_like(ga_ref)
        gcam_ref[...] = jnp.zeros_like(gcam_ref)

    # recompute the tile's vp / T / out (nothing was saved)
    vp = [
        jnp.dot(cb_ref[...], b[...], preferred_element_type=jnp.float32)
        for b in (bx_ref, by_ref, bz_ref)
    ]
    T = _blend_T(a_ref, wjv_ref[...])
    out = [T[x][3] + T[x][0] * vp[0] + T[x][1] * vp[1] + T[x][2] * vp[2] for x in range(3)]

    g = [g_ref[x] for x in range(3)]
    # epilogue grads: fin_x = cam[:,4x+3] + sum_y cam[:,4x+y] * out_y.
    # Column placement via an iota mask instead of .at[col].add — the
    # value-level scatter-add primitive has no Pallas TPU lowering
    # (NotImplementedError: scatter-add, measured on hardware round 4);
    # a lane-iota compare + where is pure dense VPU math.
    lane = jax.lax.broadcasted_iota(jnp.int32, gcam_ref.shape, 1)
    gcam = gcam_ref[...]
    for x in range(3):
        for y in range(3):
            col = jnp.sum(g[x] * out[y], axis=1, keepdims=True)
            gcam = gcam + jnp.where(lane == 4 * x + y, col, 0.0)
        gcam = gcam + jnp.where(
            lane == 4 * x + 3, jnp.sum(g[x], axis=1, keepdims=True), 0.0
        )
    gcam_ref[...] = gcam
    gout = [
        sum(cam_ref[:, 4 * x + y : 4 * x + y + 1] * g[x] for x in range(3)) for y in range(3)
    ]

    # g_vp_y = sum_x gout_x * T_xy ; g_cb += sum_y g_vp_y @ base_y^T
    gcb = gcb_ref[...]
    for y, bv in enumerate((bvx_ref, bvy_ref, bvz_ref)):
        g_vp = gout[0] * T[0][y] + gout[1] * T[1][y] + gout[2] * T[2][y]
        gcb = gcb + jnp.dot(
            g_vp.astype(jnp.bfloat16), bv[...], preferred_element_type=jnp.float32
        )
    gcb_ref[...] = gcb

    # g_A[:, :, 4x+y] += (gout_x * vp_y) @ w_vj ; g_A[:, :, 4x+3] += gout_x @ w_vj.
    # Per-plane ref read-modify-write with a STATIC leading index (the
    # same addressing the forward's a_ref[4x+y] loads use) — the
    # value-level .at[plane].add form lowers to scatter-add, which
    # Pallas TPU does not implement. In merged mode the 12 planes stack
    # into ONE [12*Bp, VT] @ [VT, Jp] dot and a single full-block RMW.
    wvj = wvj_ref[...]
    if _MERGED:
        planes = []
        for x in range(3):
            planes.extend(gout[x] * vp[y] for y in range(3))
            planes.append(gout[x])
        stk = jnp.stack(planes).astype(jnp.bfloat16)  # [12, Bp, VT], plane 4x+y
        ga = jnp.dot(
            stk.reshape(12 * stk.shape[1], stk.shape[2]), wvj,
            preferred_element_type=jnp.float32,
        ).reshape(12, stk.shape[1], wvj.shape[1])
        ga_ref[...] = ga_ref[...] + ga
    else:
        for x in range(3):
            for y in range(3):
                ga_ref[4 * x + y] = ga_ref[4 * x + y] + jnp.dot(
                    (gout[x] * vp[y]).astype(jnp.bfloat16), wvj,
                    preferred_element_type=jnp.float32,
                )
            ga_ref[4 * x + 3] = ga_ref[4 * x + 3] + jnp.dot(
                gout[x].astype(jnp.bfloat16), wvj, preferred_element_type=jnp.float32
            )


def _pad_operands(cb, A12, cam12, Cp):
    B, C = cb.shape
    J = A12.shape[1]
    Bp = _ceil_to(B, 8)
    cb_p = jnp.pad(cb, ((0, Bp - B), (0, Cp - C))).astype(jnp.bfloat16)
    a_p = jnp.pad(  # [12, Bp, Jp] planes: a_p[z] = A12[:, :, z]
        jnp.transpose(A12, (2, 0, 1)), ((0, 0), (0, Bp - B), (0, _JP - J))
    ).astype(jnp.bfloat16)
    cam_p = jnp.pad(cam12.astype(jnp.float32), ((0, Bp - B), (0, 4)))  # [Bp, 16]
    return cb_p, a_p, cam_p, Bp


def _full(*shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _apply(n_verts, interpret, cb, A12, cam12, bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj):
    out, _ = _apply_fwd(
        n_verts, interpret, cb, A12, cam12, bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj
    )
    return out


def _apply_fwd(n_verts, interpret, cb, A12, cam12, bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj):
    B = cb.shape[0]
    Cp, Vpad = bcx.shape
    cb_p, a_p, cam_p, Bp = _pad_operands(cb, A12, cam12, Cp)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(Vpad // _VT,),
        in_specs=[
            _full(Bp, Cp),
            _full(12, Bp, _JP),
            _full(Bp, 16),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((_JP, _VT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((3, Bp, _VT), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((3, Bp, Vpad), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(cb_p, a_p, cam_p, bcx, bcy, bcz, w_jv)
    verts = jnp.transpose(out, (1, 2, 0))[:B, :n_verts]
    return verts, (cb, A12, cam12, bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj)


def _apply_bwd(n_verts, interpret, res, g):
    cb, A12, cam12, bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj = res
    B, C = cb.shape
    J = A12.shape[1]
    Cp, Vpad = bcx.shape
    cb_p, a_p, cam_p, Bp = _pad_operands(cb, A12, cam12, Cp)
    g_p = jnp.zeros((3, Bp, Vpad), jnp.float32)
    g_p = g_p.at[:, :B, :n_verts].set(jnp.transpose(g.astype(jnp.float32), (2, 0, 1)))

    gcb, ga, gcam = pl.pallas_call(
        _bwd_kernel,
        grid=(Vpad // _VT,),
        in_specs=[
            _full(Bp, Cp),
            _full(12, Bp, _JP),
            _full(Bp, 16),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((Cp, _VT), lambda i: (0, i)),
            pl.BlockSpec((_JP, _VT), lambda i: (0, i)),
            pl.BlockSpec((_VT, Cp), lambda i: (i, 0)),
            pl.BlockSpec((_VT, Cp), lambda i: (i, 0)),
            pl.BlockSpec((_VT, Cp), lambda i: (i, 0)),
            pl.BlockSpec((_VT, _JP), lambda i: (i, 0)),
            pl.BlockSpec((3, Bp, _VT), lambda i: (0, 0, i)),
        ],
        out_specs=[_full(Bp, Cp), _full(12, Bp, _JP), _full(Bp, 16)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((12, Bp, _JP), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 16), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(cb_p, a_p, cam_p, bcx, bcy, bcz, w_jv, bvx, bvy, bvz, w_vj, g_p)

    g_cb = gcb[:B, :C].astype(cb.dtype)
    g_A12 = jnp.transpose(ga, (1, 2, 0))[:B, :J].astype(A12.dtype)
    g_cam = gcam[:B, :12].astype(cam12.dtype)
    zeros = [jnp.zeros_like(x) for x in (bcx, bcy, bcz, bvx, bvy, bvz, w_jv, w_vj)]
    return (g_cb, g_A12, g_cam, *zeros)


_apply.defvjp(_apply_fwd, _apply_bwd)


def fused_skinning_apply(
    cb: jax.Array,  # [B, C] = [1 | shape_coeffs | pose_feature]
    A12: jax.Array,  # [B, J, 12] rel transforms, rows (R|t)
    cam12: jax.Array,  # [B, 12] 3x4 rows (camR | camR@transl + camT)
    bundle: SkinningBundle,
    mesh=None,
    axis_name: Optional[str] = None,  # default: the mesh's first axis
) -> jax.Array:
    """verts [B, V, 3] (V = bundle.n_verts), transl + camera applied.

    mesh: a 1-axis jax.sharding.Mesh when the body axis B is sharded
    over devices. A pallas_call is an unpartitionable custom call to
    GSPMD — without this, a 'dp'-sharded fit program would all-gather
    the [B, ...] operands and run the FULL batch per chip. shard_map
    over the body axis makes the kernel run on each chip's own rows
    (every body is independent); the bundle operands are replicated.
    """
    args = (cb, A12, cam12, *bundle.base_cv, *bundle.base_vc, bundle.w_jv, bundle.w_vj)
    if mesh is None:
        return _apply(bundle.n_verts, not _on_tpu(), *args)

    from jax.sharding import PartitionSpec as P

    row, rep = P(axis_name or mesh.axis_names[0]), P()
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-
    # axes annotation, so jax's replication checker cannot see through it
    return jax.shard_map(
        partial(_apply, bundle.n_verts, not _on_tpu()),
        mesh=mesh,
        in_specs=(row, row, row) + (rep,) * 8,
        out_specs=row,
        check_vma=False,
    )(*args)
