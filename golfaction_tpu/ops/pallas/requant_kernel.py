"""Pallas TPU kernel: fused int8 GroupNorm + requant epilogue.

The int8 pose path (models/pose_quant.py) runs convs as int8 MXU matmuls
(2.18x bf16 in isolation) but round-1 measurement showed the *glue* between
convs — dequantize (f32 multiply), GroupNorm, residual add, relu, and
re-quantize — capping the end-to-end win at 1.09x: each step is a separate
VPU/HBM pass over the activation tensor.  This kernel fuses the whole
epilogue into ONE VMEM-resident pass, so between two convs the activation
touches HBM exactly twice (int32 conv output in, int8 next input out — a
4x+ traffic cut vs the unfused chain of f32/bf16 intermediates).

Supported epilogue shapes (static flags):
    y_i32 --dequant--> GN --> [+ residual] --> [relu] --> quant int8
where the optional residual is either
    * an int8 tensor with a scalar scale (identity shortcut), or
    * an int32 conv output with per-channel scales + its own GN
      (projection shortcut: the ResBlock Conv_2 branch).

GroupNorm stats are computed in-kernel with MXU-friendly matmuls:
row-sum via a ones-vector matmul, channel->group reduction and group->
channel broadcast via tiny one-hot matmuls (no reshapes, no gathers).

Oracle: `requant_epilogue_reference` (pure jnp); parity is pinned by
tests/test_pallas_requant.py in interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # flax.linen.GroupNorm default epsilon


def _group_matrices(C: int, groups: int):
    """([C, G] channel->group one-hot, [G, C] group->channel one-hot)."""
    g_of = np.arange(C) * groups // C  # flax GroupNorm: contiguous groups
    cg = np.zeros((C, groups), np.float32)
    cg[np.arange(C), g_of] = 1.0
    return jnp.asarray(cg), jnp.asarray(cg.T)


def _gn_rows(rows_f32, cg, gc, gamma, beta, n_rows, cpg):
    """GroupNorm over [R, C] rows (stats over all rows x channels-in-group)."""
    ones = jnp.ones((1, rows_f32.shape[0]), jnp.float32)
    csum = jax.lax.dot_general(  # [1, C] per-channel sums
        ones, rows_f32, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    csq = jax.lax.dot_general(
        ones, rows_f32 * rows_f32,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    n = float(n_rows * cpg)
    gsum = jax.lax.dot_general(csum, cg,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [1, G]
    gsq = jax.lax.dot_general(csq, cg,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    mu = gsum / n
    var = jnp.maximum(gsq / n - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + _EPS)                                # [1, G]
    mu_c = jax.lax.dot_general(mu, gc,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # [1, C]
    rstd_c = jax.lax.dot_general(rstd, gc,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    return (rows_f32 - mu_c) * rstd_c * gamma + beta


def _epilogue_kernel(
    y_ref,           # [1, R, C] int32 conv output rows (R = H*W)
    sy_ref,          # [1, C] f32 per-channel dequant scales (sx * sw)
    gam_ref,         # [1, C]
    bet_ref,         # [1, C]
    cg_ref,          # [C, G] channel->group one-hot (input, not a capture —
    gc_ref,          # [G, C] Mosaic rejects captured array constants)
    *rest,           # optional residual refs + out_ref (always last)
    C: int, R: int, groups: int,
    res_mode: str,   # "none" | "int8" | "conv"
    relu: bool,
    out_scale: float | None,  # None -> bf16 out; else int8 out
):
    out_ref = rest[-1]
    cg, gc = cg_ref[:], gc_ref[:]
    cpg = C // groups
    y = y_ref[0].astype(jnp.float32) * sy_ref[0]                # [R, C]
    x = _gn_rows(y, cg, gc, gam_ref[0], bet_ref[0], R, cpg)

    if res_mode == "int8":
        r_ref, rs_ref = rest[0], rest[1]
        x = x + r_ref[0].astype(jnp.float32) * rs_ref[0, 0]
    elif res_mode == "conv":
        r_ref, rs_ref, rg_ref, rb_ref = rest[0], rest[1], rest[2], rest[3]
        r = r_ref[0].astype(jnp.float32) * rs_ref[0]
        x = x + _gn_rows(r, cg, gc, rg_ref[0], rb_ref[0], R, cpg)

    if relu:
        x = jnp.maximum(x, 0.0)
    if out_scale is None:
        out_ref[0] = x.astype(out_ref.dtype)
    else:
        q = jnp.clip(jnp.round(x * (1.0 / out_scale)), -127, 127)
        out_ref[0] = q.astype(jnp.int8)


def requant_epilogue_pallas(
    y_i32: jnp.ndarray,                    # [N, H, W, C] int32
    sy: jnp.ndarray,                       # [C] f32
    gamma: jnp.ndarray, beta: jnp.ndarray,  # [C]
    groups: int,
    residual=None,                         # int8 [N,H,W,C] | int32 [N,H,W,C]
    res_scale=None,                        # scalar (int8) | [C] (conv)
    res_gamma=None, res_beta=None,         # conv-residual GN params
    relu: bool = True,
    out_scale: float | None = None,        # None -> bf16; else int8/out_scale
    interpret=None,
) -> jnp.ndarray:
    """Fused dequant+GN+residual+relu+quant epilogue (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, H, W, C = y_i32.shape
    R = H * W
    # VMEM budget: the kernel holds ~4.5 f32 copies of the [R, C] block
    # (int32 in, f32 dequant, squares, GN result, int8 out + temps).  The
    # stem layer (R=12288, C=64) measures ~18 MB and trips the 16 MB scoped
    # limit — route oversized layers through the XLA epilogue (jit fuses it
    # into 2-3 HBM passes; still far fewer than the unfused chain).
    if 6.0 * R * C * 4 > 14 * 2**20:  # measured: stem uses ~5.7 copies
        return requant_epilogue_reference(
            y_i32, sy, gamma, beta, groups, residual=residual,
            res_scale=res_scale, res_gamma=res_gamma, res_beta=res_beta,
            relu=relu, out_scale=out_scale)
    rows = y_i32.reshape(N, R, C)

    res_mode = "none"
    extra_in, extra_specs = [], []

    def spec2(r, c):
        return pl.BlockSpec((r, c), lambda n: (0, 0), memory_space=pltpu.VMEM)

    def spec3(c):
        return pl.BlockSpec((1, R, c), lambda n: (n, 0, 0),
                            memory_space=pltpu.VMEM)

    if residual is not None:
        if residual.dtype == jnp.int8:
            res_mode = "int8"
            extra_in = [residual.reshape(N, R, C),
                        jnp.full((1, 1), res_scale, jnp.float32)]
            extra_specs = [spec3(C), spec2(1, 1)]
        else:
            res_mode = "conv"
            extra_in = [residual.reshape(N, R, C),
                        jnp.asarray(res_scale, jnp.float32).reshape(1, C),
                        jnp.asarray(res_gamma, jnp.float32).reshape(1, C),
                        jnp.asarray(res_beta, jnp.float32).reshape(1, C)]
            extra_specs = [spec3(C), spec2(1, C), spec2(1, C), spec2(1, C)]

    out_dtype = jnp.bfloat16 if out_scale is None else jnp.int8
    cg, gc = _group_matrices(C, groups)
    out = pl.pallas_call(
        functools.partial(
            _epilogue_kernel, C=C, R=R, groups=groups,
            res_mode=res_mode, relu=relu,
            out_scale=None if out_scale is None else float(out_scale),
        ),
        grid=(N,),
        in_specs=[spec3(C), spec2(1, C), spec2(1, C), spec2(1, C),
                  spec2(C, groups), spec2(groups, C), *extra_specs],
        out_specs=spec3(C),
        out_shape=jax.ShapeDtypeStruct((N, R, C), out_dtype),
        interpret=bool(interpret),
    )(rows, jnp.asarray(sy, jnp.float32).reshape(1, C),
      jnp.asarray(gamma, jnp.float32).reshape(1, C),
      jnp.asarray(beta, jnp.float32).reshape(1, C), cg, gc, *extra_in)
    return out.reshape(N, H, W, C)


def requant_epilogue_reference(
    y_i32, sy, gamma, beta, groups,
    residual=None, res_scale=None, res_gamma=None, res_beta=None,
    relu=True, out_scale=None,
):
    """Pure-jnp oracle with identical semantics (flax GroupNorm convention)."""
    import flax.linen as nn

    x = y_i32.astype(jnp.float32) * jnp.asarray(sy, jnp.float32)
    gn = nn.GroupNorm(num_groups=groups)
    x = gn.apply({"params": {"scale": jnp.asarray(gamma, jnp.float32),
                             "bias": jnp.asarray(beta, jnp.float32)}}, x)
    if residual is not None:
        if residual.dtype == jnp.int8:
            x = x + residual.astype(jnp.float32) * res_scale
        else:
            r = residual.astype(jnp.float32) * jnp.asarray(res_scale, jnp.float32)
            r = nn.GroupNorm(num_groups=groups).apply(
                {"params": {"scale": jnp.asarray(res_gamma, jnp.float32),
                            "bias": jnp.asarray(res_beta, jnp.float32)}}, r)
            x = x + r
    if relu:
        x = jnp.maximum(x, 0.0)
    if out_scale is None:
        return x.astype(jnp.bfloat16)
    return jnp.clip(jnp.round(x / out_scale), -127, 127).astype(jnp.int8)
