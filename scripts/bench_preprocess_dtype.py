"""Measure PipelineConfig.preprocess_dtype (f32 vs bf16 separable warp).

The 1080p warp is two MXU matmuls (~2.4 GFLOP/frame); bf16 is the MXU's
native rate.  This times the full config-5 device program both ways on
the same trained params and synthetic clip, and reports the keypoint
delta between the two dtypes (uint8 pixels are exact in bf16; only
interp weights round).

    python scripts/bench_preprocess_dtype.py [--clips 2] [--frames 64]

Emits one JSON line: {"fps_f32": ..., "fps_bf16": ..., "speedup": ...,
"kpt_med_px": ..., "kpt_p99_px": ...}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--artifacts", default="artifacts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/golfaction_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint, data

    T = args.frames
    cfg = cfg_mod.get_config("full_pipeline")
    cfg = dataclasses.replace(cfg, length_buckets=(T,))
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)

    # Synthetic 1080p clip (rendered golfer so boxes/crops are realistic).
    rng = np.random.default_rng(0)
    s = data.swing_keypoints(T, rng)
    s = data.place_in_image(s, (1080, 1920), person_height_px=700, rng=rng)
    s = data.render_frames(s, (1080, 1920), rng=rng)
    frames = jnp.asarray(np.broadcast_to(
        s.frames, (args.clips,) + s.frames.shape).copy())
    boxes = jnp.asarray(np.broadcast_to(
        s.boxes, (args.clips,) + s.boxes.shape).copy())
    valid = jnp.ones((args.clips, T), bool)

    def fence(out):
        return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]

    results = {}
    kpts = {}
    for dt in ("float32", "bfloat16"):
        c = dataclasses.replace(cfg, preprocess_dtype=dt)
        pipe = orchestrator.Pipeline(c)
        pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                      like=pipe.params)
        t0 = time.time()
        out = pipe._core_batch(pipe.params, frames, boxes, valid)
        fence(out)
        log(f"[{dt}] compile+first run {time.time() - t0:.1f}s")
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = pipe._core_batch(pipe.params, frames, boxes, valid)
            fence(out)
            ts.append(time.perf_counter() - t0)
        dtm = min(ts)
        fps = args.clips * T / dtm
        results[dt] = fps
        kpts[dt] = np.asarray(out["keypoints"])
        log(f"[{dt}] {fps:,.1f} fps ({dtm*1e3:.1f} ms / {args.clips*T} frames)")

    d = np.abs(kpts["bfloat16"][..., :2] - kpts["float32"][..., :2])
    print(json.dumps({
        "fps_f32": round(results["float32"], 1),
        "fps_bf16": round(results["bfloat16"], 1),
        "speedup": round(results["bfloat16"] / results["float32"], 3),
        "kpt_med_px": round(float(np.median(d)), 4),
        "kpt_p99_px": round(float(np.percentile(d, 99)), 3),
        "clips": args.clips, "frames": T,
    }))


if __name__ == "__main__":
    main()
