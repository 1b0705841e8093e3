"""Top-down heatmap pose-estimation model.

Reconstructs the reference's pose stage (reference README.md:15 "POSE
ESTIMATION MODEL"; SURVEY.md §2 "Pose backbone + heatmap head"): a top-down
CNN over person crops producing one Gaussian heatmap per COCO-17 joint, in the
SimpleBaseline family (ResNet-style backbone + transposed-conv head).

TPU-first design choices:
  * NHWC layout throughout (XLA's native conv layout on TPU).
  * bfloat16 compute / float32 params; the heatmap head output is cast to
    float32 so sub-pixel decode is precision-stable.
  * GroupNorm instead of BatchNorm — keeps the model purely functional (no
    mutable batch stats to thread through pjit) with equivalent capacity at
    these widths.
  * All spatial dims are static; the whole forward is one jitted XLA program
    with every conv mapping onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from golfaction_tpu.config import PoseConfig


def _dtype(cfg: PoseConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class ResBlock(nn.Module):
    """Basic 3x3 residual block (pre-activation style kept simple)."""

    channels: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )(y)
        y = nn.GroupNorm(num_groups=min(32, self.channels), dtype=self.dtype)(y)
        if residual.shape[-1] != self.channels or self.stride != 1:
            residual = nn.Conv(
                self.channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(residual)
            residual = nn.GroupNorm(
                num_groups=min(32, self.channels), dtype=self.dtype
            )(residual)
        return nn.relu(y + residual)


class PoseNet(nn.Module):
    """ResNet-style backbone + deconv heatmap head.

    Input:  crops [B, H, W, 3] float (normalized), H,W = cfg.input_hw.
    Output: heatmaps [B, K, Hh, Wh] float32, Hh,Wh = cfg.heatmap_hw.
    """

    cfg: PoseConfig = PoseConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = _dtype(cfg)
        x = x.astype(dt)

        # Stem: 7x7/2 + maxpool/2 (overall stride 4 into stage 1).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=dt)(x)
        x = nn.GroupNorm(num_groups=32, dtype=dt)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        # Stages: stride 1, 2, 2, 2 -> total stride 32 at the deepest map.
        for i, (blocks, ch) in enumerate(zip(cfg.stage_blocks, cfg.stage_channels)):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = ResBlock(ch, stride=stride, dtype=dt)(x)

        # SimpleBaseline head: deconvs back up to stride 4 (= heatmap_hw).
        for ch in cfg.deconv_channels:
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=dt)(x)
            x = nn.GroupNorm(num_groups=min(32, ch), dtype=dt)(x)
            x = nn.relu(x)
        # One more deconv if the head hasn't reached heatmap resolution yet.
        backbone_stride = 4 * 2 ** (len(cfg.stage_blocks) - 1)
        cur_stride = backbone_stride // (2 ** len(cfg.deconv_channels))
        target_stride = cfg.input_hw[0] // cfg.heatmap_hw[0]
        while cur_stride > target_stride:
            x = nn.ConvTranspose(cfg.deconv_channels[-1], (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False, dtype=dt)(x)
            x = nn.GroupNorm(num_groups=32, dtype=dt)(x)
            x = nn.relu(x)
            cur_stride //= 2

        x = nn.Conv(cfg.num_joints, (1, 1), dtype=dt)(x)
        # [B, Hh, Wh, K] -> [B, K, Hh, Wh]; float32 for stable sub-pixel decode.
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)


def create_pose_model(cfg: PoseConfig = PoseConfig()):
    return PoseNet(cfg)
