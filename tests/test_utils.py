"""Profiling and structured-logging utilities."""

import json
import time

import jax.numpy as jnp
import numpy as np

from golfaction_tpu.utils import logging as glog
from golfaction_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    x = jnp.arange(8.0)
    with t.stage("prep", fence=x):
        time.sleep(0.01)
    with t.stage("prep", fence=x):
        time.sleep(0.01)
    with t.stage("pose"):
        pass
    b = t.breakdown()
    assert b["prep"]["count"] == 2
    assert b["prep"]["total_s"] >= 0.02
    assert "pose" in b
    json.loads(t.report())  # valid JSON


def test_timed_blocked_returns_positive():
    f = lambda x: x * 2
    dt = profiling.timed_blocked(f, jnp.ones((4,)), warmup=1, iters=3)
    assert dt > 0


def test_jsonl_logger_round_trip(tmp_path):
    p = str(tmp_path / "events.jsonl")
    log = glog.JsonlLogger(p)
    log.log("bench", fps=jnp.float32(12.5), arr=np.arange(3), nested={"a": 1})
    log.log("done")
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 2
    assert lines[0]["event"] == "bench"
    assert lines[0]["fps"] == 12.5
    assert lines[0]["arr"] == [0, 1, 2]
    assert "ts" in lines[1]


def test_apply_overrides_nested():
    from golfaction_tpu import config as cfg_mod

    cfg = cfg_mod.get_config("full_pipeline")
    out = cfg_mod.apply_overrides(
        cfg, ["frame_batch=16", "pose.dtype=float32", "length_buckets=(32, 64)"]
    )
    assert out.frame_batch == 16
    assert out.pose.dtype == "float32"
    assert out.length_buckets == (32, 64)
    # Original untouched (frozen dataclasses).
    assert cfg.frame_batch != 16 or cfg.pose.dtype == "bfloat16"
    import pytest

    with pytest.raises(AttributeError):
        cfg_mod.apply_overrides(cfg, ["nope.nope=1"])
    with pytest.raises(ValueError):
        cfg_mod.apply_overrides(cfg, ["missing_equals"])
