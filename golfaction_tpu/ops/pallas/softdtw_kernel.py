"""Pallas TPU kernel: soft-DTW anti-diagonal wavefront.

The Pallas fast path for ops.softdtw (BASELINE north_star: "soft-DTW style
sequence matching ... as batched scan kernels on-device"; SURVEY.md §2
native component 4).  Parity vs the lax.scan implementation / NumPy oracle
is enforced by tests/test_pallas_softdtw.py.

Design (SURVEY.md §5 long-context):
  * The cost matrix is pre-skewed in XLA into diagonal-major layout
    Dskew[K, Ta] (K = Ta+Tb-1, one cheap parallel gather), so the kernel's
    sequential loop reads contiguous rows — no in-kernel gathers.
  * One kernel invocation computes the ENTIRE K-step wavefront with the
    rolling carry held in registers/VMEM: the lax.scan version pays per-step
    XLA loop overhead on a ~Ta-element update; here each step is a handful
    of fused VPU ops on a [1, Ta] row.
  * grid over the batch dimension -> many alignment pairs run back-to-back
    per core with zero host involvement.
  * The full skewed DP table is written out for the backward pass /
    path backtracking; gradients use the existing XLA E-recursion via
    custom_vjp (cost-only callers still get the fused forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10


def skew(D: jnp.ndarray) -> jnp.ndarray:
    """D [..., Ta, Tb] -> Dskew [..., K, Ta]; out-of-band cells = +INF."""
    *lead, Ta, Tb = D.shape
    K = Ta + Tb - 1
    k = jnp.arange(K)[:, None]
    i = jnp.arange(Ta)[None, :]
    j = k - i
    valid = (j >= 0) & (j < Tb)
    jc = jnp.clip(j, 0, Tb - 1)
    vals = D[..., i, jc]  # broadcast gather over lead dims
    return jnp.where(valid, vals, _INF)


def unskew(S: jnp.ndarray, Ta: int, Tb: int) -> jnp.ndarray:
    """Sskew [..., K, Ta] -> S [..., Ta, Tb]."""
    i = jnp.arange(Ta)[:, None]
    j = jnp.arange(Tb)[None, :]
    return S[..., i + j, i]


def _wavefront_kernel(dskew_ref, rskew_ref, *, Ta: int, K: int, gamma: float,
                      G: int = 1):
    """Sequential wavefront over G pairs; rows are [G, Ta] VPU tiles.

    G > 1 fills the (8, sublane) x (128, lane) vector registers: at
    Ta=128 a single pair's [1, Ta] row uses one sublane in eight, so
    walking G=8 pairs per grid step runs the same K-step loop on 8x the
    data for the same instruction count (measured in BASELINE.md r3)."""
    # Derive the init carry from a ref read (not a splat constant): Mosaic
    # gives splats a replicated layout that conflicts with the loop body's
    # computed layout ("Invalid relayout" compile error otherwise).
    inf_row = dskew_ref[:, 0, :] * 0.0 + _INF          # [G, Ta]
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (G, Ta), 1) == 0)

    def shift(x):
        # x[i] -> x[i-1], x[0] -> INF  (lane roll + mask).
        return jnp.where(col0, _INF, pltpu.roll(x, 1, axis=1))

    def softmin3(a, b, c):
        m = jnp.minimum(jnp.minimum(a, b), c)
        s = (
            jnp.exp(-(a - m) / gamma)
            + jnp.exp(-(b - m) / gamma)
            + jnp.exp(-(c - m) / gamma)
        )
        return m - gamma * jnp.log(s)

    def body(k, carry):
        r1, r2 = carry
        d = dskew_ref[:, pl.ds(k, 1), :].reshape(G, Ta)
        if gamma > 0:
            sm = softmin3(r1, shift(r1), shift(r2))
        else:
            sm = jnp.minimum(jnp.minimum(r1, shift(r1)), shift(r2))
        # Virtual R[-1,-1]=0 feeds only cell (0,0) (k==0, i==0).
        sm = jnp.where(col0 & (k == 0), 0.0, sm)
        r0 = jnp.where(d >= _INF, _INF, d + sm)
        rskew_ref[:, pl.ds(k, 1), :] = r0.reshape(G, 1, Ta)
        return (r0, r1)

    jax.lax.fori_loop(0, K, body, (inf_row, inf_row))


def _backward_kernel(dskew_ref, rskew_ref, eskew_ref, *, Ta: int, K: int,
                     gamma: float, G: int = 1):
    """Reverse wavefront (E-recursion) over G pairs (rows [G, Ta]).

    Same skewed diagonal-major layout as the forward kernel, walked in
    descending k.  Cell (i, j=k-i) on diagonal k pulls from its successors:
      down  (i+1, j)   = diag k+1, index i+1
      right (i, j+1)   = diag k+1, index i
      diag  (i+1, j+1) = diag k+2, index i+1
    with weights exp((R[succ] - R[cur] - D[succ]) / gamma).  Out-of-band
    successors (Dskew padding = +INF) get weight 0 via explicit masking —
    the exponents are sanitized BEFORE exp so no INF-INF NaNs form.
    """
    zero_row = dskew_ref[:, 0, :] * 0.0                # [G, Ta]
    col_last = (jax.lax.broadcasted_iota(jnp.int32, (G, Ta), 1) == Ta - 1)

    def unshift(x, fill):
        # x[i] -> x[i+1]; x[Ta-1] -> fill.  pltpu.roll requires a
        # non-negative shift: left-by-1 == right-by-(Ta-1).
        return jnp.where(col_last, fill, pltpu.roll(x, Ta - 1, axis=1))

    def row(ref, k):
        kc = jnp.clip(k, 0, K - 1)
        return ref[:, pl.ds(kc, 1), :].reshape(G, Ta)

    def body(t, carry):
        e1, e2 = carry  # E diagonals k+1 and k+2
        k = K - 1 - t
        dcur = row(dskew_ref, k)
        r0 = row(rskew_ref, k)
        rd = row(rskew_ref, k + 1)
        dd = row(dskew_ref, k + 1)
        rdd = row(rskew_ref, k + 2)
        ddd = row(dskew_ref, k + 2)

        in_k1 = k + 1 <= K - 1
        in_k2 = k + 2 <= K - 1
        # Successor validity: the successor cell itself must be in-band.
        va = in_k1 & (unshift(dd, _INF) < _INF)     # down
        vb = in_k1 & (dd < _INF)                    # right
        vc = in_k2 & (unshift(ddd, _INF) < _INF)    # diag
        r0s = jnp.where(r0 < _INF, r0, 0.0)

        def w(valid, r_succ, d_succ):
            expo = (jnp.where(valid, r_succ, 0.0) - r0s
                    - jnp.where(valid, d_succ, 0.0)) / gamma
            return jnp.exp(jnp.where(valid, expo, -_INF))

        e0 = (
            w(va, unshift(rd, 0.0), unshift(dd, 0.0)) * unshift(e1, 0.0)
            + w(vb, rd, dd) * e1
            + w(vc, unshift(rdd, 0.0), unshift(ddd, 0.0)) * unshift(e2, 0.0)
        )
        # Seed: E[Ta-1, Tb-1] = 1 (its own diagonal k = K-1).
        e0 = jnp.where(col_last & (k == K - 1), 1.0, e0)
        e0 = jnp.where(dcur < _INF, e0, 0.0)
        eskew_ref[:, pl.ds(jnp.clip(k, 0, K - 1), 1), :] = e0.reshape(G, 1, Ta)
        return (e0, e1)

    jax.lax.fori_loop(0, K, body, (zero_row, zero_row))


def _auto_interpret(interpret) -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere (CPU CI)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


# Dskew + Rskew blocks both live in VMEM (~16 MB/core); beyond this the
# caller falls back to the lax.scan wavefront, which streams D from HBM
# (SURVEY.md §5 long-context: blockwise scaling for multi-minute sequences).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(Ta: int, Tb: int) -> bool:
    K = Ta + Tb - 1
    return 2 * K * Ta * 4 <= _VMEM_BUDGET_BYTES


def fits_vmem_bwd(Ta: int, Tb: int) -> bool:
    # Backward holds three skewed tables (D, R in; E out).
    K = Ta + Tb - 1
    return 3 * K * Ta * 4 <= _VMEM_BUDGET_BYTES


def _lane_group(K: int, Ta: int, tables: int) -> int:
    """Pairs per grid step: largest G in {8,4,2,1} whose `tables` [G,K,Ta]
    f32 blocks fit the VMEM budget.  G=8 fills the (8 sublane, 128 lane)
    vreg — one pair's [1, Ta] row wastes 7/8 of every vector op."""
    for g in (8, 4, 2, 1):
        if tables * g * K * Ta * 4 <= _VMEM_BUDGET_BYTES:
            return g
    return 1


def _pad_batch(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """Pad the batch dim to Bp with +INF tables (all-out-of-band pairs:
    the forward propagates INF, the backward zeroes them — no NaNs)."""
    B = x.shape[0]
    if Bp == B:
        return x
    return jnp.concatenate(
        [x, jnp.full((Bp - B, *x.shape[1:]), _INF, x.dtype)], axis=0)


def _wavefront_batch(Dskew: jnp.ndarray, gamma: float, interpret=None):
    return _wavefront_batch_jit(Dskew, gamma, _auto_interpret(interpret))


@functools.partial(
    jax.jit, static_argnames=("gamma", "interpret")
)
def _wavefront_batch_jit(Dskew: jnp.ndarray, gamma: float, interpret: bool):
    """Dskew [B, K, Ta] -> Rskew [B, K, Ta] (skewed DP table)."""
    B, K, Ta = Dskew.shape
    G = _lane_group(K, Ta, 2)
    Bp = -(-B // G) * G
    spec = pl.BlockSpec((G, K, Ta), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_wavefront_kernel, Ta=Ta, K=K, gamma=gamma, G=G),
        grid=(Bp // G,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K, Ta), jnp.float32),
        interpret=interpret,
    )(_pad_batch(Dskew.astype(jnp.float32), Bp))
    return out[:B]


def _backward_batch(Dskew, Rskew, gamma: float, interpret=None):
    return _backward_batch_jit(Dskew, Rskew, gamma, _auto_interpret(interpret))


@functools.partial(jax.jit, static_argnames=("gamma", "interpret"))
def _backward_batch_jit(Dskew, Rskew, gamma: float, interpret: bool):
    """(Dskew, Rskew) [B, K, Ta] -> Eskew [B, K, Ta] (skewed E matrix)."""
    B, K, Ta = Dskew.shape
    G = _lane_group(K, Ta, 3)
    Bp = -(-B // G) * G
    spec = pl.BlockSpec((G, K, Ta), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_backward_kernel, Ta=Ta, K=K, gamma=gamma, G=G),
        grid=(Bp // G,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, K, Ta), jnp.float32),
        interpret=interpret,
    )(_pad_batch(Dskew.astype(jnp.float32), Bp),
      _pad_batch(Rskew.astype(jnp.float32), Bp))
    return out[:B]


def softdtw_alignment_pallas(D: jnp.ndarray, gamma: float, interpret=None):
    """Batched soft alignment: D [B, Ta, Tb] -> (cost [B], E [B, Ta, Tb]).

    Forward AND backward (E-recursion) run as single-invocation Pallas
    wavefront kernels — the vmapped lax.scan E-recursion compiles
    pathologically slowly at batch on TPU (the round-2 forward-kernel
    motivation, which applied equally to training's backward pass).
    Falls back to the scan pair when the tables exceed VMEM.
    """
    B, Ta, Tb = D.shape
    if not fits_vmem_bwd(Ta, Tb):
        from golfaction_tpu.ops import softdtw as sdtw

        R = jax.vmap(lambda d: sdtw._forward_scan(d, gamma))(D)
        E = jax.vmap(lambda d, r: sdtw._backward_scan(d, r, gamma))(D, R)
        return R[:, -1, -1], E
    Dskew = skew(D)
    Rskew = _wavefront_batch(Dskew, gamma, interpret)
    Eskew = _backward_batch(Dskew, Rskew, gamma, interpret)
    cost = unskew(Rskew, Ta, Tb)[:, -1, -1]
    return cost, unskew(Eskew, Ta, Tb)


def softdtw_table_pallas(D: jnp.ndarray, gamma: float, interpret=None):
    """Batched forward: D [B, Ta, Tb] -> (cost [B], R [B, Ta, Tb]).

    Sequences too long for the VMEM-resident kernel fall back to the
    lax.scan wavefront (identical math, HBM-streamed).
    """
    B, Ta, Tb = D.shape
    if not fits_vmem(Ta, Tb):
        from golfaction_tpu.ops import softdtw as sdtw

        R = jax.vmap(lambda d: sdtw._forward_scan(d, gamma))(D)
        return R[:, -1, -1], R
    Rskew = _wavefront_batch(skew(D), gamma, interpret)
    R = unskew(Rskew, Ta, Tb)
    return R[:, -1, -1], R


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def softdtw_cost_pallas(D: jnp.ndarray, gamma: float, interpret=None):
    """Batched soft-DTW cost via the Pallas wavefront.  D [B, Ta, Tb] -> [B].

    Differentiable: backward is the Pallas reverse-wavefront E-recursion
    when the tables fit VMEM, else the vmapped lax.scan E-recursion.
    """
    cost, _ = softdtw_table_pallas(D, gamma, interpret)
    return cost


def _cost_fwd(D, gamma, interpret):
    cost, R = softdtw_table_pallas(D, gamma, interpret)
    return cost, (D, R)


def _cost_bwd(gamma, interpret, res, g):
    D, R = res
    B, Ta, Tb = D.shape
    if fits_vmem_bwd(Ta, Tb):
        # skew() pads out-of-band cells with +INF — exactly the forward
        # kernel's out-of-band convention for both D and R.
        Eskew = _backward_batch(skew(D), skew(R), gamma, interpret)
        E = unskew(Eskew, Ta, Tb)
    else:
        from golfaction_tpu.ops import softdtw as sdtw

        E = jax.vmap(lambda d, r: sdtw._backward_scan(d, r, gamma))(D, R)
    return (g[:, None, None] * E,)


softdtw_cost_pallas.defvjp(_cost_fwd, _cost_bwd)


def softdtw_cost_masked_pallas(D: jnp.ndarray, la, lb, gamma: float,
                               interpret=None):
    """Batched masked soft-DTW cost: D [B, Ta, Tb], la/lb [B] -> cost [B].

    The DP flows strictly forward, so the cost of the trimmed problem is the
    full padded table read at (la-1, lb-1) (same argument as
    ops.softdtw.softdtw_cost_masked).
    """
    B = D.shape[0]
    _, R = softdtw_table_pallas(D, gamma, interpret)
    la = jnp.broadcast_to(jnp.asarray(la, jnp.int32), (B,))
    lb = jnp.broadcast_to(jnp.asarray(lb, jnp.int32), (B,))
    return R[jnp.arange(B), la - 1, lb - 1]


def dtw_path_pallas(D: jnp.ndarray, la=None, lb=None):
    """Batched hard-DTW path using the Pallas wavefront table (gamma=0).

    D [B, Ta, Tb]; la/lb optional [B] valid lengths.  Returns
    (path [B, Ta+Tb-1, 2] int32 (-1 padded), length [B]).
    """
    from golfaction_tpu.ops import softdtw as sdtw

    B, Ta, Tb = D.shape
    if fits_vmem(Ta, Tb):
        R = unskew(_wavefront_batch(skew(D), 0.0), Ta, Tb)
    else:
        R = jax.vmap(sdtw._hard_forward)(D)
    if la is None:
        la = jnp.full((B,), Ta, jnp.int32)
    if lb is None:
        lb = jnp.full((B,), Tb, jnp.int32)

    def one(Rb, la_b, lb_b):
        return sdtw._backtrack(Rb, la_b, lb_b)

    return jax.vmap(one)(R, la, lb)
