"""Soft-DTW temporal alignment as an on-device anti-diagonal wavefront scan.

The reference's "TEMPORAL ALIGNMENT MODEL" (reference README.md:21,44-52)
matches two swing skeleton sequences with a soft-DTW-style differentiable
alignment (SURVEY.md §2; BASELINE north_star: "soft-DTW style sequence
matching ... batched scan kernels on-device").

Design (SURVEY.md §3.4 / §5 long-context):
  * The O(Ta·Tb) DP table is computed by `lax.scan` over anti-diagonals —
    each scan step updates one diagonal of length min(Ta,Tb)+ on the VPU, so
    the sequential chain is Ta+Tb-1 steps of fully-vectorized work, and the
    whole table lives on-device (no host round-trips).
  * `jax.custom_vjp`: the backward pass is the Cuturi–Blondel E-recursion,
    itself an anti-diagonal scan run in reverse.  E is also the soft
    alignment matrix exposed to users (expected alignment under the Gibbs
    distribution), so gradients and soft assignments share one computation.
  * Batched via `vmap`; static shapes only (variable lengths are handled by
    the `lengths` argument reading the cost at (la-1, lb-1) — callers bucket
    or trim sequences, SURVEY.md §7 hard part (c)).

Oracle: `softdtw_reference` / `softdtw_grad_reference` are O(T²) NumPy loops
used by tests as the parity target (SURVEY.md §6: parity is defined against
these).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e10


# ---------------------------------------------------------------------------
# NumPy oracle
# ---------------------------------------------------------------------------

def softmin_np(values, gamma):
    values = np.asarray(values, dtype=np.float64)
    m = values.min()
    return float(m - gamma * np.log(np.exp(-(values - m) / gamma).sum()))


def softdtw_reference(D: np.ndarray, gamma: float) -> tuple[float, np.ndarray]:
    """O(Ta·Tb) loop DP.  Returns (cost, R) with R the padded DP table."""
    Ta, Tb = D.shape
    R = np.full((Ta + 1, Tb + 1), np.inf, dtype=np.float64)
    R[0, 0] = 0.0
    for i in range(1, Ta + 1):
        for j in range(1, Tb + 1):
            R[i, j] = D[i - 1, j - 1] + softmin_np(
                [R[i - 1, j], R[i, j - 1], R[i - 1, j - 1]], gamma
            )
    return float(R[Ta, Tb]), R


def softdtw_grad_reference(D: np.ndarray, R: np.ndarray, gamma: float) -> np.ndarray:
    """Backward E-recursion (Cuturi & Blondel 2017, Alg. 2).  dcost/dD = E."""
    Ta, Tb = D.shape
    E = np.zeros((Ta + 2, Tb + 2), dtype=np.float64)
    E[Ta + 1, Tb + 1] = 1.0
    Rp = np.full((Ta + 2, Tb + 2), -np.inf, dtype=np.float64)
    Rp[1 : Ta + 1, 1 : Tb + 1] = R[1:, 1:]
    Rp[Ta + 1, Tb + 1] = R[Ta, Tb]
    Dp = np.zeros((Ta + 2, Tb + 2), dtype=np.float64)
    Dp[1 : Ta + 1, 1 : Tb + 1] = D
    for i in range(Ta, 0, -1):
        for j in range(Tb, 0, -1):
            a = np.exp((Rp[i + 1, j] - Rp[i, j] - Dp[i + 1, j]) / gamma)
            b = np.exp((Rp[i, j + 1] - Rp[i, j] - Dp[i, j + 1]) / gamma)
            c = np.exp((Rp[i + 1, j + 1] - Rp[i, j] - Dp[i + 1, j + 1]) / gamma)
            E[i, j] = a * E[i + 1, j] + b * E[i, j + 1] + c * E[i + 1, j + 1]
    return E[1 : Ta + 1, 1 : Tb + 1]


def dtw_path_reference(D: np.ndarray) -> np.ndarray:
    """Classic hard-DTW optimal path (list of (i, j)) by backtracking."""
    Ta, Tb = D.shape
    R = np.full((Ta + 1, Tb + 1), np.inf)
    R[0, 0] = 0.0
    for i in range(1, Ta + 1):
        for j in range(1, Tb + 1):
            R[i, j] = D[i - 1, j - 1] + min(R[i - 1, j], R[i, j - 1], R[i - 1, j - 1])
    path = [(Ta - 1, Tb - 1)]
    i, j = Ta, Tb
    while (i, j) != (1, 1):
        opts = [(R[i - 1, j - 1], (i - 1, j - 1)), (R[i - 1, j], (i - 1, j)),
                (R[i, j - 1], (i, j - 1))]
        _, (i, j) = min(opts, key=lambda t: t[0])
        path.append((i - 1, j - 1))
    return np.array(path[::-1], dtype=np.int32)


# ---------------------------------------------------------------------------
# JAX wavefront implementation
# ---------------------------------------------------------------------------

def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances D[..., Ta, Tb] between embedding rows.

    Computed via one MXU matmul: |a|² + |b|² - 2 a·bᵀ, clamped at 0.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=-1)
    bn = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...td,...sd->...ts", a, b)
    return jnp.maximum(an[..., :, None] + bn[..., None, :] - 2.0 * ab, 0.0)


def _diag_gather(D: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Anti-diagonal k of D [Ta, Tb], indexed by row i: out[i] = D[i, k-i].

    Out-of-range entries (j outside [0, Tb)) return +INF.
    """
    Ta, Tb = D.shape
    i = jnp.arange(Ta)
    j = k - i
    valid = (j >= 0) & (j < Tb)
    jc = jnp.clip(j, 0, Tb - 1)
    vals = D[i, jc]
    return jnp.where(valid, vals, _INF)


def _softmin3(a, b, c, gamma):
    """softmin_γ over three stacked arrays, numerically stable."""
    m = jnp.minimum(jnp.minimum(a, b), c)
    s = (
        jnp.exp(-(a - m) / gamma)
        + jnp.exp(-(b - m) / gamma)
        + jnp.exp(-(c - m) / gamma)
    )
    return m - gamma * jnp.log(s)


def _forward_scan(D: jnp.ndarray, gamma: float):
    """Wavefront forward pass.  Returns (cost, R) with R [Ta, Tb] (= DP table
    in D coordinates, i.e. R_ref[1:,1:]).

    Diagonals are indexed by row i (length Ta); cell (i, j=k-i) on diagonal k
    depends on r1[i] (=up: (i, j-1)... see mapping below), r1[i-1] and r2[i-1].
    """
    Ta, Tb = D.shape
    dtype = jnp.float32
    neg_shift = jnp.full((1,), _INF, dtype)

    def shift(x):
        return jnp.concatenate([neg_shift, x[:-1]])

    def step(carry, k):
        r1, r2 = carry  # diagonals k-1 and k-2, indexed by row i
        d = _diag_gather(D, k).astype(dtype)
        # Predecessors of (i, k-i):
        #   (i,   k-1-i) = left  (j-1): r1[i]
        #   (i-1, k-1-(i-1)) = up (i-1): r1[i-1]
        #   (i-1, k-2-(i-1)) = diag:     r2[i-1]
        sm = _softmin3(r1, shift(r1), shift(r2), gamma)
        # Virtual R[-1,-1] = 0 feeds cell (0,0) only (k==0, i==0); all other
        # out-of-table predecessors are +INF via the diagonal padding.
        sm = jnp.where((jnp.arange(Ta) == 0) & (k == 0), 0.0, sm)
        r0 = jnp.where(d >= _INF, _INF, d + sm)
        return (r0, r1), r0

    ks = jnp.arange(Ta + Tb - 1)
    init = (jnp.full((Ta,), _INF, dtype), jnp.full((Ta,), _INF, dtype))
    (_, _), diags = jax.lax.scan(step, init, ks)  # [Ta+Tb-1, Ta]

    # Scatter diagonals back into an [Ta, Tb] table: R[i, j] = diags[i+j, i].
    i = jnp.arange(Ta)[:, None]
    j = jnp.arange(Tb)[None, :]
    R = diags[(i + j), jnp.broadcast_to(i, (Ta, Tb))]
    return R


def _backward_scan(D: jnp.ndarray, R: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """E-recursion as a reverse wavefront.  Returns E [Ta, Tb]."""
    Ta, Tb = D.shape
    dtype = jnp.float32
    # Pad R/D with sentinel rows so i+1 / j+1 reads are in-bounds:
    # Rp[i, j] = R[i, j] for i<Ta, j<Tb; boundary = -INF (=> zero weight),
    # except Rp[Ta-1+1... ] unused since E starts at the corner.
    Rp = jnp.full((Ta + 1, Tb + 1), -_INF, dtype).at[:Ta, :Tb].set(R)
    Dp = jnp.zeros((Ta + 1, Tb + 1), dtype).at[:Ta, :Tb].set(D.astype(dtype))

    def gather(M, k):
        # diag k of an (Ta+1, Tb+1) matrix, indexed by i in [0, Ta].
        i = jnp.arange(Ta + 1)
        j = k - i
        valid = (j >= 0) & (j <= Tb)
        jc = jnp.clip(j, 0, Tb)
        return jnp.where(valid, M[i, jc], -_INF)

    def unshift(x):
        # x indexed by i -> value at i+1 (shift left), pad with 0/boundary.
        return jnp.concatenate([x[1:], jnp.zeros((1,), x.dtype)])

    def step(carry, k):
        e1, e2 = carry  # E diagonals k+1 and k+2, indexed by row i
        r0 = gather(Rp, k)
        rd = gather(Rp, k + 1)        # diag k+1: holds (i, j+1) at i, (i+1, j) at i+1
        dd = gather(Dp, k + 1)
        rdd = gather(Rp, k + 2)       # diag k+2: (i+1, j+1) at i+1
        ddd = gather(Dp, k + 2)

        # weights: a: down (i+1, j) -> at index i+1 of diag k+1
        wa = jnp.exp((unshift(rd) - r0 - unshift(dd)) / gamma)
        # b: right (i, j+1) -> index i of diag k+1
        wb = jnp.exp((rd - r0 - dd) / gamma)
        # c: diag (i+1, j+1) -> index i+1 of diag k+2
        wc = jnp.exp((unshift(rdd) - r0 - unshift(ddd)) / gamma)

        e0 = wa * unshift(e1) + wb * e1 + wc * unshift(e2)
        # Seed: E[Ta-1, Tb-1] = 1 on its own diagonal.
        corner = (k == (Ta + Tb - 2))
        e0 = jnp.where(corner & (jnp.arange(Ta + 1) == Ta - 1), 1.0, e0)
        e0 = jnp.where(jnp.isfinite(e0), e0, 0.0)
        return (e0, e1), e0

    ks = jnp.arange(Ta + Tb - 2, -1, -1)
    init = (jnp.zeros((Ta + 1,), dtype), jnp.zeros((Ta + 1,), dtype))
    _, diags_rev = jax.lax.scan(step, init, ks)  # [K, Ta+1] for k descending

    # diags_rev[t] corresponds to k = Ta+Tb-2-t; E[i, j] = diag(k=i+j)[i].
    K = Ta + Tb - 1
    i = jnp.arange(Ta)[:, None]
    j = jnp.arange(Tb)[None, :]
    E = diags_rev[K - 1 - (i + j), jnp.broadcast_to(i, (Ta, Tb))]
    return E


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softdtw_cost(D: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Soft-DTW cost of a cost matrix D [Ta, Tb].  Differentiable in D."""
    R = _forward_scan(D, gamma)
    return R[-1, -1]


def _softdtw_fwd(D, gamma):
    R = _forward_scan(D, gamma)
    return R[-1, -1], (D, R)


def _softdtw_bwd(gamma, res, g):
    D, R = res
    E = _backward_scan(D, R, gamma)
    return (g * E,)


softdtw_cost.defvjp(_softdtw_fwd, _softdtw_bwd)


def softdtw_with_alignment(D: jnp.ndarray, gamma: float):
    """Returns (cost, E) where E [Ta, Tb] is the soft alignment matrix."""
    R = _forward_scan(D, gamma)
    E = _backward_scan(D, R, gamma)
    return R[-1, -1], E


def dtw_path(D: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard DTW optimal path by on-device backtracking.

    Returns (path [Ta+Tb-1, 2] int32 with -1 padding, length []).  The path is
    monotonic from (0,0) to (Ta-1, Tb-1) in row-major order.
    """
    Ta, Tb = D.shape
    return _backtrack(_hard_forward(D), Ta, Tb)


def _hard_forward(D: jnp.ndarray) -> jnp.ndarray:
    """Hard-min DTW table (gamma -> 0 limit) via the same wavefront."""
    Ta, Tb = D.shape
    neg_shift = jnp.full((1,), _INF, jnp.float32)

    def shift(x):
        return jnp.concatenate([neg_shift, x[:-1]])

    def step(carry, k):
        r1, r2 = carry
        d = _diag_gather(D, k).astype(jnp.float32)
        m = jnp.minimum(jnp.minimum(r1, shift(r1)), shift(r2))
        m = jnp.where((jnp.arange(Ta) == 0) & (k == 0), 0.0, m)
        r0 = jnp.where(d >= _INF, _INF, d + m)
        return (r0, r1), r0

    ks = jnp.arange(Ta + Tb - 1)
    init = (jnp.full((Ta,), _INF), jnp.full((Ta,), _INF))
    _, diags = jax.lax.scan(step, init, ks)
    i = jnp.arange(Ta)[:, None]
    j = jnp.arange(Tb)[None, :]
    return diags[(i + j), jnp.broadcast_to(i, (Ta, Tb))]


# ---------------------------------------------------------------------------
# Masked-length variants (bucketed/padded sequences)
# ---------------------------------------------------------------------------
# The DP flows strictly forward, so R[0:la, 0:lb] of the full padded table is
# identical to the table of the trimmed problem — reading the corner at
# (la-1, lb-1) gives the exact cost/path without dynamic shapes
# (SURVEY.md §7 hard part (c): variable lengths without recompilation).


def softdtw_cost_masked(D: jnp.ndarray, la, lb, gamma: float) -> jnp.ndarray:
    """Soft-DTW cost of D[:la, :lb] with static D shape. Forward-only."""
    R = _forward_scan(D, gamma)
    return R[la - 1, lb - 1]


def dtw_path_masked(D: jnp.ndarray, la, lb):
    """Hard DTW path of D[:la, :lb]; path padded with -1 to [Ta+Tb-1, 2]."""
    return _backtrack(_hard_forward(D), la, lb)


def _backtrack(R: jnp.ndarray, la, lb):
    """Backtrack the optimal path from (la-1, lb-1) over a hard-min table R."""
    Ta, Tb = R.shape
    L = Ta + Tb - 1

    def get(i, j):
        ok = (i >= 0) & (j >= 0)
        return jnp.where(ok, R[jnp.maximum(i, 0), jnp.maximum(j, 0)], _INF)

    def step(carry, _):
        i, j, done = carry
        rd = get(i - 1, j - 1)
        ru = get(i - 1, j)
        rl = get(i, j - 1)
        best = jnp.argmin(jnp.stack([rd, ru, rl]))
        ni = jnp.where(best != 2, i - 1, i)
        nj = jnp.where(best != 1, j - 1, j)
        at_origin = (i == 0) & (j == 0)
        ni = jnp.where(done | at_origin, i, ni)
        nj = jnp.where(done | at_origin, j, nj)
        emit = jnp.where(done, jnp.array([-1, -1]), jnp.stack([i, j]))
        return (ni, nj, done | at_origin), emit

    start = (jnp.asarray(la - 1, jnp.int32), jnp.asarray(lb - 1, jnp.int32),
             jnp.bool_(False))
    _, rev = jax.lax.scan(step, start, None, length=L)
    length = jnp.sum(jnp.int32(rev[:, 0] >= 0))
    idx = jnp.arange(L)
    src = jnp.where(idx < length, length - 1 - idx, idx)
    return rev[src].astype(jnp.int32), length


def warp_by_path(ref_vals: jnp.ndarray, path: jnp.ndarray, length, T: int):
    """Warp per-frame reference values onto the clip timeline via a DTW path.

    ref_vals [Tr, ...], path [L, 2] int32 rows (clip_idx, ref_idx) with -1
    padding beyond `length`, T = clip timeline length (static).  Returns
    [T, ...]: for each clip frame t, the mean of all reference frames the
    path aligns to t (zeros for frames the path never visits, e.g. bucket
    padding).  Static shapes throughout — scatter-add + count.
    """
    L = path.shape[0]
    lmask = jnp.arange(L) < length
    ti = jnp.where(lmask, path[:, 0], T)  # out-of-range bucket collects pads
    rj = jnp.clip(jnp.where(lmask, path[:, 1], 0), 0, ref_vals.shape[0] - 1)
    extra = (1,) * (ref_vals.ndim - 1)
    w = lmask.astype(jnp.float32).reshape(L, *extra)
    acc = jnp.zeros((T + 1, *ref_vals.shape[1:]), jnp.float32)
    acc = acc.at[ti].add(ref_vals[rj].astype(jnp.float32) * w)
    cnt = jnp.zeros((T + 1,), jnp.float32).at[ti].add(lmask.astype(jnp.float32))
    return acc[:T] / jnp.maximum(cnt[:T], 1.0).reshape(T, *extra)


# Batched convenience wrappers.
softdtw_cost_batch = jax.vmap(softdtw_cost, in_axes=(0, None))
softdtw_with_alignment_batch = jax.vmap(softdtw_with_alignment, in_axes=(0, None))
dtw_path_batch = jax.vmap(dtw_path, in_axes=0)
