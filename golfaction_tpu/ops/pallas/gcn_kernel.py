"""Pallas TPU kernel: fused GCN block tail (inference fast path).

BASELINE north_star: "spatial graph conv, multi-branch temporal conv, and
channel/ST-joint attention blocks are fused into single XLA/Pallas kernels"
(reference README.md:26-34).  The spatial graph conv is already a single
adjacency-folded MXU matmul (models/gcn.py); this kernel fuses EVERYTHING
between two spatial convs — LayerNorm+relu, the multi-branch dilated
temporal conv, the max-pool branch, channel attention and ST-joint
attention — into one VMEM-resident Pallas program, eliminating ~10
intermediate HBM round-trips per block.

Layout trick: features live as rows [T·V, C] (row r = frame r//V, joint
r%V).  Then
  * every 1x1 conv / branch reduction is a row matmul (MXU);
  * a temporal shift by dt frames is a row roll by dt·V (VPU), so the
    dilated depthwise convs are three rolls + multiply-adds;
  * joint/temporal poolings and their broadcast-back are tiny matmuls with
    iota-built one-hot matrices — no reshapes, no gathers.
Padding frames are masked in-kernel from the scalar-prefetched valid
length, exactly matching the flax modules' masked semantics.

Numerical parity with the flax block (models/gcn.py) is enforced by
tests/test_pallas_gcn.py.  Forward/inference only — training uses the flax
path (autodiff through the XLA implementation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from golfaction_tpu import graph
from golfaction_tpu.config import GCNConfig

_EPS = 1e-6  # flax.linen.LayerNorm default epsilon


def _ln(x, scale, bias):
    """LayerNorm over the last axis, flax semantics (mean/var in f32)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _EPS)
    return y * scale + bias


def _tail_kernel(
    la_ref,            # SMEM scalar prefetch: [1] valid frame count
    x_ref,             # [1, TVp, C] post-spatial-conv features
    w_ref,             # [1, PW, maxc] packed branch/attention weights
    pt_ref,            # [T, TVp] static frame-average pool matrix (1/V)
    pv_ref,            # [V, TVp] static joint-sum pool matrix (ones)
    out_ref,           # [1, TVp, C]
    *,
    T: int, V: int, C: int, TVp: int,
    branches: tuple[tuple[int, int], ...],
    ca_mid: int, stja_mid: int,
    offsets: dict,
):
    la = la_ref[pl.program_id(0)]               # this clip's valid length
    x = x_ref[0].astype(jnp.float32)            # [TVp, C]
    W = w_ref[:].astype(jnp.float32)            # packed params [PW, maxc]

    def P(name, rows, cols):
        r0 = offsets[name]
        return W[r0:r0 + rows, :cols]

    def vec(name, cols):
        return P(name, 1, cols)                  # [1, cols]

    rows = jax.lax.broadcasted_iota(jnp.int32, (TVp, 1), 0)
    frame = rows // V                            # [TVp, 1]
    valid_row = (frame < la) & (rows < T * V)

    def mask(z):
        return jnp.where(valid_row, z, 0.0)

    # ---- LN0 + relu on the spatial-conv output ----
    y = jnp.maximum(_ln(x, vec("ln0_s", C), vec("ln0_b", C)), 0.0)
    y = mask(y)

    def shift_rows(z, dt_rows, fill):
        """z rows shifted so out[r] = z[r - dt_rows]; vacated rows = fill.

        pltpu.roll requires a non-negative shift; negative shifts roll by
        TVp + dt (same permutation on a TVp-row buffer).
        """
        rolled = pltpu.roll(z, dt_rows % TVp, axis=0)
        if dt_rows >= 0:
            bad = rows < dt_rows
        else:
            bad = rows >= (TVp + dt_rows)
        return jnp.where(bad, fill, rolled)

    nb = len(branches) + 1
    cb = C // nb
    rem = C - cb * nb
    outs = []
    for i, (k, d) in enumerate(branches):
        ch = cb + (rem if i == 0 else 0)
        h = jax.lax.dot_general(
            y, P(f"br{i}_w", C, ch),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = jnp.maximum(_ln(h, vec(f"br{i}_ln_s", ch), vec(f"br{i}_ln_b", ch)), 0.0)
        h = mask(h)
        # Depthwise temporal conv, k taps at dilation d (k is 3 in configs).
        taps = P(f"br{i}_tw", k, ch)             # [k, ch]
        acc = jnp.zeros_like(h)
        half = (k - 1) // 2
        for j in range(k):
            off = (j - half) * d                 # frame offset of tap j
            # out[t] += w[j] * h[t + off]  =>  rows shifted by -off*V
            acc = acc + taps[j:j + 1, :] * shift_rows(h, -off * V, 0.0)
        outs.append(acc)

    # Max-pool branch: 1x1 reduce + LN (no relu — matches the flax module),
    # then temporal max over 3 frames.
    g = jax.lax.dot_general(
        y, P("mp_w", C, cb),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = _ln(g, vec("mp_ln_s", cb), vec("mp_ln_b", cb))
    g = mask(g)
    g = jnp.where(valid_row, g, -1e4)            # flax: invalid rows -> -1e4
    gm = jnp.maximum(
        jnp.maximum(g, shift_rows(g, V, -jnp.inf)),
        shift_rows(g, -V, -jnp.inf),
    )
    outs.append(gm)

    z = jnp.concatenate(outs, axis=-1)           # [TVp, C]
    z = jnp.maximum(_ln(z, vec("lnf_s", C), vec("lnf_b", C)), 0.0)
    z = mask(z)

    # ---- Channel attention (SE) ----
    denom = jnp.maximum(la.astype(jnp.float32), 1.0) * V
    s = jnp.sum(mask(z), axis=0, keepdims=True) / denom          # [1, C]
    h1 = jnp.maximum(
        jax.lax.dot_general(s, P("ca_w1", C, ca_mid),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + vec("ca_b1", ca_mid), 0.0)
    gate_c = jax.nn.sigmoid(
        jax.lax.dot_general(h1, P("ca_w2", ca_mid, C),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + vec("ca_b2", C))
    z = z * gate_c                                                # [TVp, C]

    # ---- ST-Joint attention ----
    # Pool matrices come in as static inputs (building them in-kernel from
    # iota/compare chains made Mosaic compiles take minutes).  zm's rows are
    # already zero beyond la, so the joint pool uses a static ones matrix
    # with a scalar 1/la correction instead of an la-dependent one-hot.
    zm = mask(z)
    Pt = pt_ref[:]                                                # [T, TVp]
    t_pool = jax.lax.dot_general(Pt, zm,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [T, C]
    v_pool = jax.lax.dot_general(pv_ref[:], zm,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ) / jnp.maximum(la.astype(jnp.float32), 1.0)

    def fused_emb(p):
        e = jax.lax.dot_general(p, P("stja_wf", C, stja_mid),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e = _ln(e, vec("stja_ln_s", stja_mid), vec("stja_ln_b", stja_mid))
        return jnp.clip(e, -1.0, 1.0)            # hard_tanh

    t_emb = fused_emb(t_pool)
    v_emb = fused_emb(v_pool)
    t_gate = jax.nn.sigmoid(
        jax.lax.dot_general(t_emb, P("stja_wt", stja_mid, C),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + vec("stja_bt", C))                     # [T, C]
    v_gate = jax.nn.sigmoid(
        jax.lax.dot_general(v_emb, P("stja_wv", stja_mid, C),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + vec("stja_bv", C))                     # [V, C]

    # Broadcast gates back to rows by contracting the SAME pool matrices on
    # their other axis: Bt == (V * Pt)^T and Bv == pv^T exactly.
    Gt = jax.lax.dot_general(Pt, t_gate,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * float(V)
    Gv = jax.lax.dot_general(pv_ref[:], v_gate,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out_ref[0] = (z * Gt * Gv).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Param packing: flax GCNBlock subtree -> one [PW, maxc] f32 matrix
# ---------------------------------------------------------------------------

def pack_block_params(block_params: dict, cfg: GCNConfig, C: int):
    """Flatten the tail parameters of one flax GCNBlock into a packed matrix.

    Returns (packed [PW, maxc] f32, offsets, meta) where offsets maps each
    tensor name to its starting row.  Row layout keeps every tensor's last
    dim in columns (padded to maxc).
    """
    branches = cfg.temporal_branches
    nb = len(branches) + 1
    cb = C // nb
    rem = C - cb * nb
    ca_mid = max(C // cfg.channel_att_reduction, 8)
    stja_mid = max(C // cfg.channel_att_reduction, 8)

    mbtc = block_params["MultiBranchTemporalConv_0"]
    ca = block_params["ChannelAtt_0"]
    stja = block_params["STJointAtt_0"]

    entries = []  # (name, array[rows, cols]) — jnp ops only (jit-traceable)

    def add(name, arr):
        arr = jnp.asarray(arr, jnp.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        entries.append((name, arr))

    add("ln0_s", block_params["LayerNorm_0"]["scale"])
    add("ln0_b", block_params["LayerNorm_0"]["bias"])
    for i, (k, d) in enumerate(branches):
        ch = cb + (rem if i == 0 else 0)
        add(f"br{i}_w", mbtc[f"Dense_{i}"]["kernel"])            # [C, ch]
        add(f"br{i}_ln_s", mbtc[f"LayerNorm_{i}"]["scale"])
        add(f"br{i}_ln_b", mbtc[f"LayerNorm_{i}"]["bias"])
        tw = jnp.asarray(mbtc[f"Conv_{i}"]["kernel"], jnp.float32)  # [k,1,1,ch]
        add(f"br{i}_tw", tw.reshape(k, ch))
    add("mp_w", mbtc[f"Dense_{len(branches)}"]["kernel"])
    add("mp_ln_s", mbtc[f"LayerNorm_{len(branches)}"]["scale"])
    add("mp_ln_b", mbtc[f"LayerNorm_{len(branches)}"]["bias"])
    add("lnf_s", mbtc[f"LayerNorm_{len(branches) + 1}"]["scale"])
    add("lnf_b", mbtc[f"LayerNorm_{len(branches) + 1}"]["bias"])
    add("ca_w1", ca["Dense_0"]["kernel"])
    add("ca_b1", ca["Dense_0"]["bias"])
    add("ca_w2", ca["Dense_1"]["kernel"])
    add("ca_b2", ca["Dense_1"]["bias"])
    add("stja_wf", stja["Dense_0"]["kernel"])
    add("stja_ln_s", stja["LayerNorm_0"]["scale"])
    add("stja_ln_b", stja["LayerNorm_0"]["bias"])
    add("stja_wt", stja["Dense_1"]["kernel"])
    add("stja_bt", stja["Dense_1"]["bias"])
    add("stja_wv", stja["Dense_2"]["kernel"])
    add("stja_bv", stja["Dense_2"]["bias"])

    maxc = max(a.shape[1] for _, a in entries)
    offsets = {}
    row = 0
    blocks = []
    for name, a in entries:
        offsets[name] = row
        blocks.append(jnp.pad(a, ((0, 0), (0, maxc - a.shape[1]))))
        row += a.shape[0]
    packed = jnp.concatenate(blocks, axis=0)
    meta = {"ca_mid": ca_mid, "stja_mid": stja_mid}
    return packed, offsets, meta


def gcn_block_tail_pallas(
    x: jnp.ndarray,            # [B, T, V, C] post-spatial-conv (pre-LN0)
    la: jnp.ndarray,           # [B] int32 valid frame counts
    packed_w: jnp.ndarray,     # from pack_block_params
    offsets: dict,
    cfg: GCNConfig,
    meta: dict,
    interpret=None,
) -> jnp.ndarray:
    """Run the fused tail for a batch.  Returns [B, T, V, C] (pre-residual)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, V, C = x.shape
    TV = T * V
    TVp = ((TV + 7) // 8) * 8
    rows = x.reshape(B, TV, C)
    if TVp != TV:
        rows = jnp.pad(rows, ((0, 0), (0, TVp - TV), (0, 0)))
    PW = packed_w.shape[0]
    maxc = packed_w.shape[1]

    # Static pool matrices (see _tail_kernel comment): frame-average and
    # joint-sum over the [TVp] row layout, reused transposed for the
    # gate broadcast-back.
    r_idx = np.arange(TVp)
    Pt = np.zeros((T, TVp), np.float32)
    in_range = r_idx < TV
    Pt[(r_idx // V)[in_range], r_idx[in_range]] = 1.0 / V
    Pv = np.zeros((V, TVp), np.float32)
    Pv[(r_idx % V)[in_range], r_idx[in_range]] = 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, TVp, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PW, maxc), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, TVp), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, TVp), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TVp, C), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _tail_kernel, T=T, V=V, C=C, TVp=TVp,
            branches=cfg.temporal_branches,
            ca_mid=meta["ca_mid"], stja_mid=meta["stja_mid"],
            offsets=offsets,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, TVp, C), x.dtype),
        interpret=bool(interpret),
    )(la.astype(jnp.int32), rows, packed_w, jnp.asarray(Pt), jnp.asarray(Pv))
    return out[:, :TV].reshape(B, T, V, C)


def gcn_forward_pallas(params, cfg: GCNConfig, x, valid, interpret=None):
    """Full GCN inference with Pallas-fused block tails.

    Mirrors models.gcn.ActionSegmentationGCN.apply (deterministic) with the
    spatial conv + residual in XLA and everything else in the fused kernel.
    Parity: tests/test_pallas_gcn.py.
    """
    from golfaction_tpu.models import gcn as gcn_mod

    B, T, V, Cin = x.shape
    la = valid.astype(jnp.int32).sum(axis=1)
    A = graph.build_adjacency(cfg.graph_strategy)
    p = params["params"]
    h = x.astype(jnp.float32)
    for bi, Cout in enumerate(cfg.block_channels):
        bp = p[f"GCNBlock_{bi}"]
        sgc = bp["SpatialGraphConv_0"]
        Wk = jnp.asarray(sgc["kernel"], jnp.float32)              # [P, Cin, Cout]
        M = jnp.asarray(sgc["edge_importance"], jnp.float32)
        Am = jnp.asarray(A, jnp.float32) * M
        wbig = jnp.einsum("pvw,pco->wcvo", Am, Wk)
        Cb = h.shape[-1]
        y = jax.lax.dot_general(
            h.reshape(B, T, V * Cb), wbig.reshape(V * Cb, V * Cout),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, T, V, Cout)
        packed, offsets, meta = pack_block_params(bp, cfg, Cout)
        z = gcn_block_tail_pallas(y, la, packed, offsets, cfg, meta, interpret)
        residual = h
        if residual.shape[-1] != Cout:
            residual = jax.lax.dot_general(
                residual, jnp.asarray(bp["Dense_0"]["kernel"], jnp.float32),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        h = (z + residual) * valid.astype(jnp.float32)[:, :, None, None]

    # Per-frame head (XLA; tiny).
    feat = h.mean(axis=2)
    d0, d1 = p["Dense_0"], p["Dense_1"]
    feat = jnp.maximum(
        feat @ jnp.asarray(d0["kernel"], jnp.float32)
        + jnp.asarray(d0["bias"], jnp.float32), 0.0)
    return (feat @ jnp.asarray(d1["kernel"], jnp.float32)
            + jnp.asarray(d1["bias"], jnp.float32))
