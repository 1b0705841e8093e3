"""Skeleton-GCN action-segmentation model.

Implements the four modules the reference names for its action-segmentation
network (reference README.md:26-34): Spatial Graph Convolution (:27),
Multi-branch Temporal Convolution (:29), Channel Attention (:31) and ST-Joint
Attention (:33), in the EfficientGCN family (SURVEY.md §2), with a per-frame
swing-phase head (README.md:17; BASELINE config 3).

TPU-first design:
  * Features are [B, T, V, C] with channels last: every 1x1 "conv" is a dense
    matmul on the MXU and the graph contraction is a single einsum with the
    static normalized adjacency A[P, V, V] — XLA fuses the whole block chain.
  * Temporal convs are Conv with feature_group_count=1 over the T axis only
    (kernel (k, 1)), static shapes, no dynamic control flow.
  * LayerNorm (not BatchNorm): purely functional, padding-mask friendly.
  * A `valid` [B, T] mask gates features before every temporal mixing op so
    bucket padding never leaks into real frames (SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from golfaction_tpu import graph
from golfaction_tpu.config import GCNConfig


def _dtype(cfg: GCNConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _mask(x: jnp.ndarray, valid: jnp.ndarray | None) -> jnp.ndarray:
    """Zero features at padded frames.  x [B,T,V,C] or [B,T,C]; valid [B,T]."""
    if valid is None:
        return x
    v = valid.astype(x.dtype)
    return x * v.reshape(v.shape + (1,) * (x.ndim - 2))


class SpatialGraphConv(nn.Module):
    """y[v] = Σ_p Σ_w A[p,v,w] · (x[w] W_p)  — reference README.md:27.

    TPU formulation: the adjacency contraction is folded into the weights,
    Wbig[(w,ci),(v,co)] = Σ_p A[p,v,w]·M[p,v,w]·W[p,ci,co], so the whole
    layer is ONE [B·T, V·Ci] @ [V·Ci, V·Co] matmul — MXU-sized (V·C ≈ 1–4k)
    instead of a V=17-wide contraction that would waste the 128-lane
    systolic array.  Wbig costs P·V²·Ci·Co flops to build (negligible) and
    is identical math to the per-partition form.
    """

    out_channels: int
    adjacency: Any  # np.ndarray [P, V, V], static
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        P, V, _ = self.adjacency.shape
        B, T, _, C = x.shape
        Co = self.out_channels
        W = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (P, C, Co),
            jnp.float32,
        )
        # Learnable edge-importance mask (ST-GCN trick), initialized to 1.
        M = self.param("edge_importance", nn.initializers.ones, (P, V, V),
                       jnp.float32)
        A = jnp.asarray(self.adjacency, jnp.float32) * M
        wbig = jnp.einsum("pvw,pco->wcvo", A, W).astype(self.dtype)
        y = jax.lax.dot_general(
            x.astype(self.dtype).reshape(B, T, V * C),
            wbig.reshape(V * C, V * Co),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(B, T, V, Co).astype(self.dtype)


class MultiBranchTemporalConv(nn.Module):
    """Parallel dilated temporal branches + max-pool branch — README.md:29."""

    out_channels: int
    branches: tuple[tuple[int, int], ...]  # (kernel, dilation) pairs
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid=None):
        n_branch = len(self.branches) + 1  # + maxpool branch
        cb = self.out_channels // n_branch
        rem = self.out_channels - cb * n_branch
        x = _mask(x, valid)
        outs = []
        for i, (k, d) in enumerate(self.branches):
            ch = cb + (rem if i == 0 else 0)
            b = nn.Dense(ch, use_bias=False, dtype=self.dtype)(x)
            b = nn.LayerNorm(dtype=self.dtype)(b)
            b = nn.relu(b)
            b = _mask(b, valid)
            b = nn.Conv(
                ch, kernel_size=(k, 1), kernel_dilation=(d, 1), padding="SAME",
                feature_group_count=ch, use_bias=False, dtype=self.dtype,
            )(b)
            outs.append(b)
        # Max-pool branch: 1x1 reduce + temporal max-pool(3).
        mp = nn.Dense(cb, use_bias=False, dtype=self.dtype)(x)
        mp = nn.LayerNorm(dtype=self.dtype)(mp)
        mp = _mask(mp, valid)
        if valid is not None:
            # Padded frames must not win the max: push them to -inf-ish.
            v = valid.astype(self.dtype)[..., None, None]
            mp = mp + (1.0 - v) * jnp.asarray(-1e4, self.dtype)
        mp = nn.max_pool(mp, (3, 1), strides=(1, 1), padding="SAME")
        outs.append(mp)
        y = jnp.concatenate(outs, axis=-1)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        return _mask(nn.relu(y), valid)


class ChannelAtt(nn.Module):
    """SE-style squeeze-excitation over channels — README.md:31."""

    reduction: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid=None):
        B, T, V, C = x.shape
        if valid is None:
            s = x.mean(axis=(1, 2))
        else:
            v = valid.astype(x.dtype)
            denom = jnp.maximum(v.sum(axis=1), 1.0) * V          # [B]
            s = (_mask(x, valid)).sum(axis=(1, 2)) / denom[:, None]
        g = nn.Dense(max(C // self.reduction, 8), dtype=self.dtype)(s)
        g = nn.relu(g)
        g = nn.Dense(C, dtype=self.dtype)(g)
        g = nn.sigmoid(g)
        return x * g[:, None, None, :]


class STJointAtt(nn.Module):
    """Factorized spatial(joint) × temporal attention gate — README.md:33.

    Pool over joints and over time, embed jointly, then emit a temporal gate
    [B,T,1,C] and a joint gate [B,1,V,C] whose product modulates the features
    (EfficientGCN's ST-JointAtt, reconstructed — SURVEY.md §2).
    """

    reduction: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid=None):
        B, T, V, C = x.shape
        xm = _mask(x, valid)
        if valid is None:
            t_pool = xm.mean(axis=2)            # [B, T, C]
            v_pool = xm.mean(axis=1)            # [B, V, C]
        else:
            v = valid.astype(x.dtype)
            t_pool = xm.mean(axis=2)
            denom = jnp.maximum(v.sum(axis=1), 1.0)[:, None, None]
            v_pool = xm.sum(axis=1) / denom
        mid = max(C // self.reduction, 8)
        fused = nn.Dense(mid, use_bias=False, dtype=self.dtype)
        norm = nn.LayerNorm(dtype=self.dtype)
        t_emb = nn.hard_tanh(norm(fused(t_pool)))
        v_emb = nn.hard_tanh(norm(fused(v_pool)))
        t_gate = nn.sigmoid(nn.Dense(C, dtype=self.dtype)(t_emb))  # [B, T, C]
        v_gate = nn.sigmoid(nn.Dense(C, dtype=self.dtype)(v_emb))  # [B, V, C]
        return x * t_gate[:, :, None, :] * v_gate[:, None, :, :]


class GCNBlock(nn.Module):
    """Spatial conv → multi-branch temporal conv → channel + ST-joint attention,
    with a residual connection (1x1-projected when widths change)."""

    out_channels: int
    cfg: GCNConfig
    adjacency: Any
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        residual = x
        y = SpatialGraphConv(self.out_channels, self.adjacency, self.dtype)(x)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        y = nn.relu(y)
        y = MultiBranchTemporalConv(
            self.out_channels, self.cfg.temporal_branches, self.dtype
        )(y, valid)
        y = ChannelAtt(self.cfg.channel_att_reduction, self.dtype)(y, valid)
        y = STJointAtt(self.cfg.channel_att_reduction, self.dtype)(y, valid)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Dense(self.out_channels, use_bias=False,
                                dtype=self.dtype)(residual)
        y = y + residual
        if self.cfg.dropout > 0:
            y = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(y)
        return _mask(y, valid)


class ActionSegmentationGCN(nn.Module):
    """Full trunk + per-frame swing-phase head.

    Input:  skeletons [B, T, V, C_in] (normalized; see `normalize_skeleton`),
            valid [B, T] bool mask.
    Output: phase logits [B, T, num_phases] float32.
    """

    cfg: GCNConfig = GCNConfig()

    @nn.compact
    def __call__(self, x, valid=None, deterministic=True):
        cfg = self.cfg
        dt = _dtype(cfg)
        A = graph.build_adjacency(cfg.graph_strategy)
        x = x.astype(dt)
        for ch in cfg.block_channels:
            x = GCNBlock(ch, cfg, A, dt)(x, valid, deterministic)
        # Per-frame head: joint-mean pool keeps T resolution.
        x = x.mean(axis=2)                       # [B, T, C]
        x = nn.Dense(cfg.block_channels[-1], dtype=dt)(x)
        x = nn.relu(x)
        logits = nn.Dense(cfg.num_phases, dtype=jnp.float32)(x)
        return logits


def normalize_skeleton(kpts: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Canonicalize keypoints for the GCN (SURVEY.md §3.3 "normalize skeleton").

    kpts [..., T, V, 3] in image px -> hip-centered, torso-scaled (x, y, score).
    Uses the mid-hip as origin and the mean hip→shoulder distance as scale so
    the representation is translation/scale invariant across camera setups.
    """
    xy = kpts[..., :2]
    score = kpts[..., 2:]
    hips = (xy[..., 11, :] + xy[..., 12, :]) / 2.0          # [..., T, 2]
    shoulders = (xy[..., 5, :] + xy[..., 6, :]) / 2.0
    torso = jnp.linalg.norm(shoulders - hips, axis=-1)       # [..., T]
    # Robust per-sequence scale: mean over frames (masked if provided).
    if valid is not None:
        v = valid.astype(torso.dtype)
        scale = (torso * v).sum(-1) / jnp.maximum(v.sum(-1), 1.0)
    else:
        scale = torso.mean(-1)
    scale = jnp.maximum(scale, 1e-3)[..., None, None, None]
    centered = (xy - hips[..., None, :]) / scale
    return jnp.concatenate([centered, score], axis=-1)


def normalize_skeleton_clip(kpts: jnp.ndarray, valid=None,
                            return_scale: bool = False):
    """Like normalize_skeleton but centered on the CLIP-mean mid-hip.

    Per-frame hip centering erases within-clip global drift — exactly the
    signal that defines translation faults (swaying, hanging back, head
    movement): measured round 2, an error head fed per-frame-centered
    skeletons could not detect them at any threshold.  Centering on the
    (masked) clip-mean hip keeps the representation translation/scale
    invariant across cameras while preserving the drift trajectories.
    """
    xy = kpts[..., :2]
    score = kpts[..., 2:]
    hips = (xy[..., 11, :] + xy[..., 12, :]) / 2.0          # [..., T, 2]
    shoulders = (xy[..., 5, :] + xy[..., 6, :]) / 2.0
    torso = jnp.linalg.norm(shoulders - hips, axis=-1)       # [..., T]
    if valid is not None:
        v = valid.astype(torso.dtype)
        denom = jnp.maximum(v.sum(-1), 1.0)
        scale = (torso * v).sum(-1) / denom
        center = (hips * v[..., None]).sum(-2) / denom[..., None]
    else:
        scale = torso.mean(-1)
        center = hips.mean(-2)
    scale = jnp.maximum(scale, 1e-3)[..., None, None, None]
    centered = (xy - center[..., None, None, :]) / scale
    out = jnp.concatenate([centered, score], axis=-1)
    if return_scale:
        # The clip scale (mean torso length, image px) — callers that
        # normalize auxiliary pixel-unit statistics (e.g. heatmap-spread
        # covariances) must divide by the SAME scale.
        return out, scale[..., 0, 0, 0]
    return out


def create_gcn_model(cfg: GCNConfig = GCNConfig()):
    return ActionSegmentationGCN(cfg)
