"""Streaming analyzer: coverage, ordering, parity with offline analysis."""

import numpy as np
import pytest

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.pipeline import orchestrator, streaming
from golfaction_tpu.train import data

CFG = cfg_mod.PipelineConfig(
    pose=cfg_mod.PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                            stage_blocks=(1, 1, 1), stage_channels=(8, 8, 16),
                            deconv_channels=(8, 8), dtype="float32"),
    gcn=cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                          dropout=0.0, dtype="float32"),
    align=cfg_mod.AlignConfig(embed_dim=8, hidden_channels=(8,), dtype="float32"),
    error=cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32"),
    frame_batch=4, length_buckets=(16,),
)


@pytest.fixture(scope="module")
def pipe():
    return orchestrator.Pipeline(CFG, seed=0)


def _clip(t, seed=0):
    s = data.make_swing_batch(1, t, seed=seed, image_hw=(96, 128), render=True)[0]
    return s.frames


@pytest.mark.slow
def test_stream_covers_every_frame_once(pipe):
    frames = _clip(40)
    results = list(streaming.analyze_stream(pipe, iter(frames), window=16, hop=4))
    idxs = [r["frame_index"] for r in results]
    assert idxs == list(range(40))
    for r in results:
        assert r["keypoints"].shape == (17, 3)
        assert 0 <= r["phase_label"] < cfg_mod.NUM_PHASES
        assert isinstance(r["phase"], str)


@pytest.mark.slow
def test_stream_short_clip_flush_only(pipe):
    frames = _clip(7, seed=1)  # shorter than the window: flush path only
    sa = streaming.StreamAnalyzer(pipe, window=16, hop=4)
    mid = [r for f in frames for r in sa.push(f)]
    assert mid == []
    out = sa.flush()
    assert [r["frame_index"] for r in out] == list(range(7))
    assert sa.flush() == []  # idempotent


def test_stream_matches_offline_interior(pipe):
    # Interior frames of a window-sized clip match offline analysis exactly
    # (same compiled program, same boxes when the window == the whole clip).
    frames = _clip(16, seed=2)
    offline = pipe.analyze(frames)
    okpts = np.asarray(offline.keypoints)[:16]
    sa = streaming.StreamAnalyzer(pipe, window=16, hop=16)
    out = [r for f in frames for r in sa.push(f)] + sa.flush()
    assert [r["frame_index"] for r in out] == list(range(16))
    skpts = np.stack([r["keypoints"] for r in out])
    np.testing.assert_allclose(skpts, okpts, atol=1e-4)


def test_stream_validates_window(pipe):
    with pytest.raises(ValueError):
        streaming.StreamAnalyzer(pipe, window=13, hop=4)   # not a bucket
    with pytest.raises(ValueError):
        streaming.StreamAnalyzer(pipe, window=16, hop=0)
