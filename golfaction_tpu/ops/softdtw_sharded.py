"""Multi-device soft-DTW: the DP table sharded in row bands over a mesh.

SURVEY.md §5 (long-context): swing clips normally fit one chip, but the
only quadratic-in-T computation in the system is soft-DTW — "if sequences
ever exceed a chip, the DP table shards along ... bands over the `data`
mesh axis with neighbor `ppermute` exchanges".  This module is that
mechanism: a systolic row-band pipeline.

Layout + schedule
-----------------
D [Ta, Tb] is sharded into P row bands (device p owns rows
[p·Ra, (p+1)·Ra)); columns are walked in C chunks of width W.  Device p
computes the [Ra, W] tile of column chunk c at outer step s = p + c — a
wavefront of tiles.  The recursion R[i,j] = D[i,j] + softmin_γ(up, left,
diag) needs, per tile, (a) the band above's LAST ROW restricted to the
chunk — exactly what device p-1 produced one step earlier, forwarded by a
single `lax.ppermute` of W floats per outer step — and (b) the device's
own previous chunk's last column, a local carry.  Total latency is
P + C - 1 tile steps; per-device utilization C/(P+C-1) (pick C ≥ P).

Inside a tile the standard anti-diagonal scan runs (same softmin/sentinel
conventions as ops/softdtw._forward_scan: +1e10 marks unreachable cells,
so no inf-inf NaNs).  Arbitrary (non-multiple) Ta/Tb are padded with
sentinel rows/columns; the cost is read at the true corner cell, which
padding can never influence (DP dependencies only point up/left).

Scope: ONE long pair (the long-context regime); batched normal-length
training uses the single-device Pallas lane-batched wavefront
(ops/pallas/softdtw_kernel).  The sharded path IS differentiable: the
outer pipeline is a `lax.scan`, so `jax.grad` reverse-runs the exact
schedule (boundary cotangents ride the transposed ppermute back up the
mesh) and reproduces the Cuturi–Blondel E-matrix gradient — parity-tested
against the hand-derived oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from golfaction_tpu.ops.softdtw import _INF, _softmin3


def _tile_dp(Dtile, top, left, corner, gamma):
    """DP over one [Ra, W] tile with explicit boundary rows/cols.

    top [W]: R values of the row just above the tile (R[i0-1, j0:j0+W]).
    left [Ra]: R values of the column just left (R[i0:i0+Ra, j0-1]).
    corner: R[i0-1, j0-1].  All use the +_INF sentinel for "unreachable"
    (and corner == 0.0 seeds the global (0, 0) cell).

    Returns the full tile R [Ra, W].
    """
    Ra, W = Dtile.shape
    dtype = jnp.float32
    top = top.astype(dtype)
    left = left.astype(dtype)
    rows = jnp.arange(Ra)

    def diag_gather(M, k):
        j = k - rows
        valid = (j >= 0) & (j < W)
        return jnp.where(valid, M[rows, jnp.clip(j, 0, W - 1)], _INF)

    def shift(x):
        return jnp.concatenate([jnp.full((1,), _INF, dtype), x[:-1]])

    left_sh = shift(left)   # left[i-1] aligned at i

    def step(carry, k):
        r1, r2 = carry      # tile diagonals k-1, k-2 indexed by tile row i
        d = diag_gather(Dtile, k).astype(dtype)
        j = k - rows
        lft = r1            # (i, j-1) when j-1 >= 0
        up = shift(r1)      # (i-1, j) when i-1 >= 0
        dg = shift(r2)      # (i-1, j-1) interior
        # j == 0: left/diag predecessors live in the boundary column.
        lft = jnp.where(j == 0, left, lft)
        dg = jnp.where((j == 0) & (rows > 0), left_sh, dg)
        # i == 0 (vector index 0): up/diag live in the boundary row.
        up0 = jnp.where((k >= 0) & (k < W), top[jnp.clip(k, 0, W - 1)], _INF)
        dg0 = jnp.where(k == 0, corner,
                        jnp.where((k - 1 >= 0) & (k - 1 < W),
                                  top[jnp.clip(k - 1, 0, W - 1)], _INF))
        up = up.at[0].set(up0)
        dg = dg.at[0].set(dg0)
        sm = _softmin3(lft, up, dg, gamma)
        r0 = jnp.where(d >= _INF, _INF, d + sm)
        r0 = jnp.minimum(r0, _INF).astype(dtype)
        return (r0, r1), r0

    ks = jnp.arange(Ra + W - 1)
    init = (jnp.full((Ra,), _INF, dtype), jnp.full((Ra,), _INF, dtype))
    _, diags = jax.lax.scan(step, init, ks)          # [Ra+W-1, Ra]
    i = rows[:, None]
    j = jnp.arange(W)[None, :]
    return diags[i + j, jnp.broadcast_to(i, (Ra, W))]


def softdtw_cost_sharded(
    D: jnp.ndarray,
    gamma: float,
    mesh: Mesh,
    axis: str = "data",
    col_chunks: int | None = None,
) -> jnp.ndarray:
    """Soft-DTW cost of one (possibly chip-exceeding) pair on a mesh.

    D [Ta, Tb] is row-band sharded over `axis`; returns the replicated
    scalar cost.  col_chunks defaults to the device count (balanced
    systolic pipeline); raise it for finer overlap on very wide D.
    """
    nP = int(mesh.shape[axis])
    Ta, Tb = D.shape
    Ra = -(-Ta // nP)                      # ceil
    C = col_chunks or nP
    W = -(-Tb // C)
    # Sentinel padding: padded cells carry d = +_INF, which _tile_dp turns
    # into unreachable (R = _INF) cells; they sit below/right of the true
    # corner so they cannot feed it.
    Dp = jnp.full((Ra * nP, W * C), _INF, jnp.float32)
    Dp = Dp.at[:Ta, :Tb].set(D.astype(jnp.float32))

    i_star, j_star = Ta - 1, Tb - 1        # true corner (cost cell)
    p_star, r_star = divmod(i_star, Ra)
    c_star, w_star = divmod(j_star, W)

    def local(Dl):
        Dl = Dl.reshape(Ra, W * C)         # this device's row band
        p = jax.lax.axis_index(axis)

        # lax.scan (not fori_loop) so the whole pipeline — including the
        # ppermute exchanges — is reverse-differentiable: jax.grad of the
        # cost w.r.t. D runs the Cuturi–Blondel E-recursion as the exact
        # transpose of this schedule (boundary cotangents flow back UP the
        # mesh through the transposed ppermute).
        def body(state, s):
            left, top, corner_top, cost = state
            c = s - p
            valid = (c >= 0) & (c < C)
            cc = jnp.clip(c, 0, C - 1)
            Dtile = jax.lax.dynamic_slice(Dl, (0, cc * W), (Ra, W))

            top_eff = jnp.where(p == 0, jnp.full((W,), _INF), top)
            seed = (p == 0) & (c == 0)
            corner = jnp.where(
                seed, 0.0,
                jnp.where((c == 0) | (p == 0), _INF, corner_top))
            left_eff = jnp.where(c == 0, jnp.full((Ra,), _INF), left)

            tile = _tile_dp(Dtile, top_eff, left_eff, corner, gamma)

            cost = jnp.where(
                valid & (c == c_star) & (p == p_star),
                tile[r_star, w_star], cost)
            left = jnp.where(valid, tile[:, W - 1], left)
            # Forward my tile's last row to the band below; it is their
            # `top` for the same chunk c, consumed at step s + 1.
            sent = jax.lax.ppermute(
                tile[Ra - 1, :], axis,
                [(q, q + 1) for q in range(nP - 1)])
            # Corner for my NEXT chunk (c+1) is the last element of the
            # top row I used for THIS chunk.
            return (left, sent, top[W - 1], cost), None

        init = (jnp.full((Ra,), _INF, jnp.float32),
                jnp.full((W,), _INF, jnp.float32),
                jnp.float32(_INF),
                jnp.float32(0.0))
        (_, _, _, cost), _ = jax.lax.scan(
            body, init, jnp.arange(nP + C - 1))
        # Replicate the corner device's cost to everyone.
        cost = jax.lax.psum(jnp.where(p == p_star, cost, 0.0), axis)
        return cost[None]

    # check_vma=False: the scan/fori carries start replicated (same inits
    # everywhere) and become device-varying; the check would require
    # pvary-annotating every init, with no semantic difference here.
    try:
        fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                       out_specs=P(axis), check_vma=False)
    except TypeError:                   # pragma: no cover — older jax
        fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                       out_specs=P(axis), check_rep=False)
    # Each device returns the same scalar (as a length-1 chunk of a
    # sharded length-nP vector); take element 0.
    return fn(Dp)[0]
