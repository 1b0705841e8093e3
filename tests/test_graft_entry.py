"""Driver-contract tests: dryrun_multichip on the 8-device CPU mesh, and
per-clip failure quarantine in the batch orchestrator."""

import numpy as np
import pytest

import __graft_entry__ as graft
from golfaction_tpu import config as cfg_mod
from golfaction_tpu.pipeline import orchestrator


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


@pytest.mark.slow
def test_analyze_batch_quarantines_bad_clips():
    cfg = cfg_mod.PipelineConfig(
        pose=cfg_mod.PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                                stage_blocks=(1, 1, 1), stage_channels=(8, 8, 16),
                                deconv_channels=(8, 8), dtype="float32"),
        gcn=cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                              dropout=0.0, dtype="float32"),
        align=cfg_mod.AlignConfig(embed_dim=8, hidden_channels=(8,), dtype="float32"),
        error=cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32"),
        frame_batch=4, length_buckets=(8,),
    )
    pipe = orchestrator.Pipeline(cfg, seed=0)
    good = np.random.default_rng(0).integers(0, 255, (6, 64, 80, 3)).astype(np.uint8)
    too_long = np.zeros((40, 64, 80, 3), np.uint8)   # exceeds all buckets
    missing = "/nonexistent/clip.mp4"

    out = pipe.analyze_batch([good, too_long, missing, good])
    assert len(out) == 4
    assert hasattr(out[0], "keypoints") and hasattr(out[3], "keypoints")
    assert isinstance(out[1], ValueError)
    assert isinstance(out[2], (FileNotFoundError, RuntimeError))
    np.testing.assert_allclose(
        np.asarray(out[0].keypoints), np.asarray(out[3].keypoints), atol=1e-5
    )
