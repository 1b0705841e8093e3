"""Swing-error detection classifier.

The reference's "ERROR DETECTION MODEL" (reference README.md:19): flags swing
faults from the phase-segmented skeleton sequence (SURVEY.md §2
"Error-detection classifier"; BASELINE north_star: "error flags ... batched
scan kernels on-device").

Design: the phase posteriors from the segmentation head act as a *soft
temporal pooling matrix* — skeleton features are aggregated per swing phase
with one matmul ([P, T] @ [T, F]), giving a fixed-size phase-conditioned
summary regardless of clip length.  An MLP over the flattened summary emits
one logit per fault (multi-label).  This keeps the whole classifier a couple
of MXU matmuls with no dynamic shapes, and is padding-mask exact.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from golfaction_tpu.config import ErrorConfig


def _dtype(cfg: ErrorConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ErrorClassifier(nn.Module):
    """(skeletons [B,T,V,C], phase_logits [B,T,P], valid [B,T]) -> logits [B,E]."""

    cfg: ErrorConfig = ErrorConfig()

    @nn.compact
    def __call__(self, skeletons, phase_logits, valid=None):
        cfg = self.cfg
        dt = _dtype(cfg)
        B, T, V, C = skeletons.shape

        # Per-frame features: joints + first temporal difference (velocity),
        # so faults expressed in dynamics (casting, early extension) are
        # visible to a per-phase pooled model.
        x = skeletons.astype(dt).reshape(B, T, V * C)
        vel = jnp.diff(x, axis=1, prepend=x[:, :1])
        feat = jnp.concatenate([x, vel], axis=-1)          # [B, T, 2VC]
        feat = nn.Dense(cfg.hidden_dim, dtype=dt)(feat)
        feat = nn.LayerNorm(dtype=dt)(feat)
        feat = nn.relu(feat)

        # Soft per-phase pooling: weights = phase posterior, masked+normalized.
        w = nn.softmax(phase_logits.astype(jnp.float32), axis=-1)  # [B, T, P]
        if valid is not None:
            w = w * valid.astype(w.dtype)[..., None]
        denom = jnp.maximum(w.sum(axis=1), 1e-3)           # [B, P]
        pooled = jnp.einsum("btp,btf->bpf", w.astype(dt), feat)
        pooled = pooled / denom[..., None].astype(dt)      # [B, P, F]

        h = pooled.reshape(B, -1)
        h = nn.Dense(cfg.hidden_dim, dtype=dt)(h)
        h = nn.LayerNorm(dtype=dt)(h)
        h = nn.relu(h)
        logits = nn.Dense(cfg.num_errors, dtype=jnp.float32)(h)
        return logits


def create_error_model(cfg: ErrorConfig = ErrorConfig()):
    return ErrorClassifier(cfg)
