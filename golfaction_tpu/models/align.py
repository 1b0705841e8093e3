"""Temporal-alignment embedding network.

The encoder half of the reference's "TEMPORAL ALIGNMENT MODEL" (reference
README.md:21,44): each frame's skeleton is embedded so that two swings (pro
vs amateur) can be matched by soft-DTW over embedding distances
(SURVEY.md §2 "Temporal-alignment embedding net", §3.4).

Architecture: per-frame joint MLP + dilated temporal convolutions — a small
TCN. Everything is [B, T, F] dense/conv work that maps straight onto the MXU;
the padding mask gates every temporal op.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from golfaction_tpu.config import AlignConfig


def _dtype(cfg: AlignConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _mask_bt(x: jnp.ndarray, valid: jnp.ndarray | None) -> jnp.ndarray:
    if valid is None:
        return x
    return x * valid.astype(x.dtype)[..., None]


class AlignEncoder(nn.Module):
    """Skeleton sequence [B, T, V, C] -> frame embeddings [B, T, D] float32."""

    cfg: AlignConfig = AlignConfig()

    @nn.compact
    def __call__(self, x, valid=None):
        cfg = self.cfg
        dt = _dtype(cfg)
        B, T, V, C = x.shape
        x = x.astype(dt).reshape(B, T, V * C)

        # Per-frame joint mixer.
        x = nn.Dense(cfg.hidden_channels[0], dtype=dt)(x)
        x = nn.LayerNorm(dtype=dt)(x)
        x = nn.relu(x)

        # Dilated temporal stack: receptive field grows exponentially.
        for i, ch in enumerate(cfg.hidden_channels):
            y = _mask_bt(x, valid)
            y = nn.Conv(ch, kernel_size=(cfg.temporal_kernel,),
                        kernel_dilation=(2**i,), padding="SAME",
                        use_bias=False, dtype=dt)(y)
            y = nn.LayerNorm(dtype=dt)(y)
            y = nn.relu(y)
            if x.shape[-1] != ch:
                x = nn.Dense(ch, use_bias=False, dtype=dt)(x)
            x = x + y

        emb = nn.Dense(cfg.embed_dim, dtype=jnp.float32)(x)
        if cfg.normalize_embeddings:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6
            )
        return _mask_bt(emb, valid)


def create_align_model(cfg: AlignConfig = AlignConfig()):
    return AlignEncoder(cfg)
