"""Shared fixture definition for the golden pipeline test."""

import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.pipeline import orchestrator
from golfaction_tpu.train import data

GOLDEN_CFG = cfg_mod.PipelineConfig(
    pose=cfg_mod.PoseConfig(
        input_hw=(64, 48), heatmap_hw=(16, 12),
        stage_blocks=(1, 1, 1), stage_channels=(8, 16, 32),
        deconv_channels=(16, 16), dtype="float32",
    ),
    gcn=cfg_mod.GCNConfig(block_channels=(8, 16), temporal_branches=((3, 1), (3, 2)),
                          dropout=0.0, dtype="float32"),
    align=cfg_mod.AlignConfig(embed_dim=16, hidden_channels=(8, 16), dtype="float32"),
    error=cfg_mod.ErrorConfig(hidden_dim=32, dtype="float32"),
    frame_batch=4,
    length_buckets=(16,),
)


def build_pipeline():
    return orchestrator.Pipeline(GOLDEN_CFG, seed=0)


def fixture_clips():
    """Two deterministic rendered swing clips (different tempo)."""
    s_a = data.swing_keypoints(12, np.random.default_rng(1234), tempo_warp=-0.5)
    s_a = data.place_in_image(s_a, (96, 128), person_height_px=60,
                              rng=np.random.default_rng(1))
    s_a = data.render_frames(s_a, (96, 128), joint_radius=2.5,
                             rng=np.random.default_rng(2))
    s_b = data.swing_keypoints(9, np.random.default_rng(5678), tempo_warp=0.5)
    s_b = data.place_in_image(s_b, (96, 128), person_height_px=60,
                              rng=np.random.default_rng(3))
    s_b = data.render_frames(s_b, (96, 128), joint_radius=2.5,
                             rng=np.random.default_rng(4))
    return s_a.frames, s_b.frames
