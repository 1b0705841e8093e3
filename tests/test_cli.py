"""CLI surface tests (tiny models via --set overrides, synthetic mp4)."""

import io
import contextlib
import json
import os

import numpy as np
import pytest

from golfaction_tpu import cli
from golfaction_tpu.pipeline import visualize
from golfaction_tpu.train import data

cv2 = pytest.importorskip("cv2")

TINY_SETS = [
    "--set", "pose.stage_blocks=(1,1,1)",
    "--set", "pose.stage_channels=(8,8,16)",
    "--set", "pose.deconv_channels=(8,8)",
    "--set", "pose.input_hw=(64,48)",
    "--set", "pose.heatmap_hw=(16,12)",
    "--set", "pose.dtype='float32'",
    "--set", "gcn.block_channels=(8,)",
    "--set", "gcn.temporal_branches=((3,1),)",
    "--set", "gcn.dtype='float32'",
    "--set", "align.hidden_channels=(8,)",
    "--set", "align.embed_dim=8",
    "--set", "error.hidden_dim=16",
    "--set", "frame_batch=4",
    "--set", "length_buckets=(16,)",
]


@pytest.fixture(scope="module")
def swing_mp4(tmp_path_factory):
    d = tmp_path_factory.mktemp("clips")
    s = data.make_swing_batch(1, 12, seed=0, image_hw=(96, 128), render=True)[0]
    p = str(d / "swing.mp4")
    visualize.write_video(p, s.frames, fps=30)
    return p


def _run(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(argv)
    return buf.getvalue()


@pytest.mark.slow
def test_cli_analyze_json_contract(swing_mp4, tmp_path):
    out_file = str(tmp_path / "res.json")
    _run(["analyze", swing_mp4, *TINY_SETS, "--out", out_file])
    r = json.load(open(out_file))
    assert r["num_frames"] == 12
    assert len(r["keypoints"]) == 12 and len(r["keypoints"][0]) == 17
    assert all(isinstance(p, str) for p in r["phase_labels"])
    assert set(r["error_probs"]) == set(
        __import__("golfaction_tpu.config", fromlist=["c"]).SWING_ERRORS
    )
    assert "alignment" not in r  # no reference given


@pytest.mark.slow
def test_cli_analyze_with_reference(swing_mp4):
    out = json.loads(_run(["analyze", swing_mp4, "--reference", swing_mp4,
                           *TINY_SETS]))
    al = out["alignment"]
    # Self-alignment: path is the diagonal.
    assert al["path"][0] == [0, 0] and al["path"][-1] == [11, 11]


def test_cli_rejects_unknown_model():
    with pytest.raises(SystemExit):
        _run(["train", "nonexistent"])


@pytest.mark.slow
def test_cli_analyze_render(swing_mp4, tmp_path):
    out_mp4 = str(tmp_path / "overlay.mp4")
    _run(["analyze", swing_mp4, *TINY_SETS, "--render", out_mp4])
    cap = cv2.VideoCapture(out_mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


@pytest.mark.slow
def test_cli_compare(swing_mp4, tmp_path):
    out_mp4 = str(tmp_path / "cmp.mp4")
    out = json.loads(_run(["compare", swing_mp4, swing_mp4, *TINY_SETS,
                           "--out-video", out_mp4, "--max-pairs", "6"]))
    assert out["comparison"]["against"] == swing_mp4
    # Self-comparison: perfectly even pacing.
    assert out["comparison"]["max_lag_frames"] == 0
    assert out["comparison_video"] == out_mp4
    cap = cv2.VideoCapture(out_mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


@pytest.mark.slow
def test_cli_stream_jsonl_and_latency_summary(swing_mp4, capsys):
    out = _run(["stream", swing_mp4, *TINY_SETS,
                "--window", "16", "--hop", "8"])
    lines = [json.loads(l) for l in out.strip().splitlines()]
    assert len(lines) == 12  # every decoded frame emitted exactly once
    assert [l["frame_index"] for l in lines] == list(range(12))
    assert all("phase" in l and "latency_ms" in l for l in lines)
