"""Decode-overlap contract tests for `Pipeline.analyze_batch` (CPU).

Pins the threaded dispatch-on-ready semantics added in round 4
(`pipeline/orchestrator.py` analyze_batch; VERDICT r4 task 5):

* `last_batch_stats` telemetry exists and is coherent;
* host decode genuinely overlaps device dispatch — the first chunk is
  dispatched before the decode pool has finished all clips;
* per-clip results are index-stable no matter which order decodes
  complete in (chunk membership follows completion order; outputs must
  not);
* a failing clip is quarantined at its index while the rest of the
  batch completes.
"""

import dataclasses
import time

import numpy as np
import pytest

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.pipeline import orchestrator

from .test_pipeline import TINY, _swing_frames


@pytest.fixture(scope="module")
def opipe():
    # clip_batch=2 so a 6-clip batch dispatches its first chunk while
    # later clips are still decoding (the overlap regime under test).
    cfg = dataclasses.replace(TINY, clip_batch=2)
    return orchestrator.Pipeline(cfg, seed=0)


def _slowed(pipe, delays):
    """Wrap pipe._prepare so clip i's decode takes ~delays[i] seconds
    extra; returns a restore function.  Sleeping inside _prepare puts the
    latency inside the decode pool exactly where OpenCV would."""
    orig = pipe._prepare
    counter = {"n": 0}

    def prep(frames, boxes):
        i = counter["n"]
        counter["n"] += 1
        time.sleep(delays[min(i, len(delays) - 1)])
        return orig(frames, boxes)

    pipe._prepare = prep
    return lambda: setattr(pipe, "_prepare", orig)


def test_last_batch_stats_and_overlap(opipe):
    clips = [_swing_frames(t=6, seed=s) for s in range(6)]
    restore = _slowed(opipe, [0.3] * 6)
    try:
        results = opipe.analyze_batch(clips, decode_workers=2)
    finally:
        restore()
    assert all(not isinstance(r, Exception) for r in results)
    st = opipe.last_batch_stats
    assert st["clips"] == 6 and st["failures"] == 0
    assert st["decode_workers"] == 2
    assert st["decode_s_total"] >= 6 * 0.3
    assert st["first_dispatch_s"] is not None
    assert 0.0 < st["first_dispatch_s"] < st["wall_s"]
    # Overlap: the first chunk (2 clips, 2 workers => ready after ~0.3 s)
    # must dispatch before the pool has spent all ~1.8 s of decode time.
    assert st["first_dispatch_s"] < st["decode_s_total"]


def test_results_index_stable_under_completion_reorder(opipe):
    clips = [_swing_frames(t=6, seed=10 + s) for s in range(4)]
    # Run 1: natural order.  Run 2: first-submitted decode finishes LAST,
    # so chunk membership differs between the runs.
    restore = _slowed(opipe, [0.0, 0.0, 0.0, 0.0])
    try:
        base = opipe.analyze_batch(clips, decode_workers=2)
    finally:
        restore()
    restore = _slowed(opipe, [0.8, 0.0, 0.0, 0.0])
    try:
        reordered = opipe.analyze_batch(clips, decode_workers=2)
    finally:
        restore()
    for rb, rr in zip(base, reordered):
        np.testing.assert_allclose(
            np.asarray(rb.keypoints), np.asarray(rr.keypoints), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(rb.phase_labels), np.asarray(rr.phase_labels)
        )


def test_decode_failure_quarantined_at_index(opipe):
    clips = [
        _swing_frames(t=6, seed=20),
        "/nonexistent/clip.mp4",  # decode raises
        _swing_frames(t=6, seed=21),
    ]
    results = opipe.analyze_batch(clips, decode_workers=2)
    assert isinstance(results[1], Exception)
    for i in (0, 2):
        assert not isinstance(results[i], Exception)
        assert np.isfinite(np.asarray(results[i].keypoints)).all()
    assert opipe.last_batch_stats["failures"] == 1
    assert opipe.last_batch_stats["clips"] == 3
