"""Calibrate per-fault decision thresholds through the real pipeline.

Renders a STRATIFIED held-out set (every fault represented `--per-fault`
times plus clean clips), runs both analyze modes (with/without a reference
swing) with the trained artifacts, and picks the per-fault threshold
maximizing F1 on the pooled probabilities.  Writes
<artifacts>/error_thresholds.json (consumed by the CLI and demo_e2e).

    python scripts/calibrate_thresholds.py --per-fault 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--per-fault", type=int, default=10,
                    help="positive clips per fault; thresholds fitted on "
                         "n=4 flipped with single clips (VERDICT r3 #4)")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint, data, metrics

    def log(m):
        print(m, file=sys.stderr, flush=True)

    cfg = cfg_mod.get_config("full_pipeline", video_hw=tuple(args.hw),
                             length_buckets=(args.frames,))
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                  like=pipe.params)
    T = args.frames
    cal = data.make_fault_balanced_batch(
        args.per_fault, T, seed=580_000, image_hw=tuple(args.hw),
        render=True, clean=2 * args.per_fault,
        scene_families=data.TRAIN_SCENE_FAMILIES)
    ref_cal = data.make_swing_batch(1, T, seed=581_000,
                                    image_hw=tuple(args.hw), render=True,
                                    scene_families=data.TRAIN_SCENE_FAMILIES,
                                    fault_prob=0.0)[0]
    ref_skel = pipe.extract_skeleton(pipe.analyze(ref_cal.frames))
    log(f"calibrating on {len(cal)} stratified clips x 2 modes ...")
    probs, truth = [], []
    for s in cal:
        a = pipe.analyze(s.frames)
        b = pipe.analyze(s.frames, reference=ref_skel)
        probs += [np.asarray(a.error_probs), np.asarray(b.error_probs)]
        truth += [s.error_flags, s.error_flags]
    probs = np.stack(probs)
    truth = np.stack(truth)
    thresholds = metrics.calibrate_error_thresholds(probs, truth, log=log)
    path = os.path.join(args.artifacts, "error_thresholds.json")
    with open(path, "w") as f:
        json.dump(thresholds, f, indent=2)
    print(json.dumps({"thresholds": path}))


if __name__ == "__main__":
    main()
