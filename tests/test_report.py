"""Coach report generation from analysis results."""

import jax.numpy as jnp
import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu import types
from golfaction_tpu.pipeline import report


def _labels(spec):
    """spec: list of (phase_name, count) -> label array."""
    out = []
    for name, n in spec:
        out += [cfg_mod.SWING_PHASES.index(name)] * n
    return np.asarray(out, np.int32)


def _result(labels, probs=None, alignment=None):
    T = len(labels)
    probs = probs if probs is not None else np.zeros(cfg_mod.NUM_ERRORS)
    return types.AnalysisResult(
        keypoints=jnp.zeros((T, 17, 3)),
        phase_labels=jnp.asarray(labels),
        phase_logits=jnp.zeros((T, cfg_mod.NUM_PHASES)),
        error_flags=jnp.asarray(probs) > 0.5,
        error_probs=jnp.asarray(probs, jnp.float32),
        valid=jnp.ones((T,), bool),
        alignment=alignment,
    )


def test_phase_segments_and_tempo():
    labels = _labels([("address", 6), ("takeaway", 6), ("backswing", 12),
                      ("top", 6), ("downswing", 6), ("impact", 2),
                      ("follow_through", 6), ("finish", 6)])
    rep = report.build_report(_result(labels), fps=30.0)
    assert [s["phase"] for s in rep["phases"]] == [
        "address", "takeaway", "backswing", "top", "downswing", "impact",
        "follow_through", "finish"]
    # backswing side = 6+12+6 = 24 frames; downswing side = 8 frames -> 3.0
    assert rep["tempo_ratio"] == 3.0
    assert "3:1" in rep["tempo_note"]


def test_faults_sorted_and_described():
    probs = np.zeros(cfg_mod.NUM_ERRORS)
    probs[cfg_mod.SWING_ERRORS.index("casting")] = 0.9
    probs[cfg_mod.SWING_ERRORS.index("swaying")] = 0.7
    rep = report.build_report(_result(_labels([("address", 4)]), probs))
    assert [f["fault"] for f in rep["faults"]] == ["casting", "swaying"]
    assert "wrist" in rep["faults"][0]["description"]
    txt = report.format_report(rep)
    assert "casting" in txt and "90%" in txt


def test_comparison_section():
    path = np.stack([np.arange(10), np.clip(np.arange(10) - 2, 0, 9)], -1)
    al = types.AlignmentResult(cost=jnp.float32(1.5),
                               path=jnp.asarray(path, jnp.int32),
                               path_length=jnp.int32(10))
    rep = report.build_report(_result(_labels([("address", 10)]), alignment=al),
                              reference_name="pro.mp4")
    cmp_ = rep["comparison"]
    assert cmp_["against"] == "pro.mp4"
    assert cmp_["max_lag_frames"] == 2
    assert "reference" in cmp_["pacing_note"]
    assert "pro.mp4" in report.format_report(rep)


def test_report_json_safe():
    import json

    rep = report.build_report(_result(_labels([("address", 3), ("finish", 3)])))
    json.dumps(rep)  # must not raise
