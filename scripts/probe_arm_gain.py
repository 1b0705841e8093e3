"""Per-joint fault-deflection transfer gain through the REAL pose front.

The error head is at F1 0.98+ on ground-truth keypoints but misses arm
faults end-to-end because the pose stage attenuates fast-arm deflections
(BASELINE.md round-2: gains 0.14-0.52 during the downswing).  This probe
makes that number reproducible and per-intervention comparable:

For every fault class it renders N paired clips — the fault at a fixed
severity and its CLEAN TWIN (same seed: same body style, tempo, scene,
occluders, camera) — runs both through the full pipeline front (estimated
boxes -> preprocess -> pose -> decode), and regresses the predicted
deflection onto the true one over the affected joints/frames:

    gain_j = sum_t(pred_defl . true_defl) / sum_t(|true_defl|^2)

gain 1.0 = the fault survives the pose stage intact; 0.0 = wiped out.

    python scripts/probe_arm_gain.py --pairs 4 --out artifacts/probe_arm_gain.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Joints each fault deflects (train/data.py swing_keypoints fault model).
FAULT_JOINTS = {
    "swaying": [11, 12, 13, 14],
    "hanging_back": [11, 12],
    "early_extension": [11, 12],
    "over_the_top": [7, 9],
    "casting": [9, 10],
    "reverse_spine": [0, 1, 2, 3, 4, 5, 6],
    "chicken_wing": [7],
    "head_movement": [0, 1, 2, 3, 4],
}
ARM_FAULTS = ("over_the_top", "casting", "chicken_wing")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--out", default="artifacts/probe_arm_gain.json")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--severity", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=880_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pose-in-frames", type=int, default=None,
                    help="default: auto-detect from the pose checkpoint")
    ap.add_argument("--pose-dir", default=None,
                    help="override pose checkpoint dir (compare candidates "
                         "without touching artifacts/)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    help="config override key=value (repeatable), e.g. "
                         "--set pose.decode_tracking=4")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint, data

    def log(m):
        print(m, file=sys.stderr, flush=True)

    hw = tuple(args.hw)
    cfg = cfg_mod.get_config(
        "full_pipeline", video_hw=hw, length_buckets=(args.frames,)
    )
    # Match the whole artifacts tree first (incl. error.spread_features:
    # a spread-widened error checkpoint can't restore into the base head),
    # then apply the pose-candidate's own in_frames when given.
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    nf = args.pose_in_frames
    if nf is None and args.pose_dir:
        root = os.path.dirname(os.path.dirname(args.pose_dir.rstrip("/")))
        nf = checkpoint.detect_pose_in_frames(root)
    if nf is not None and nf != cfg.pose.in_frames:
        cfg = cfg_mod.apply_overrides(cfg, [f"pose.in_frames={nf}"])
    if args.overrides:
        cfg = cfg_mod.apply_overrides(cfg, args.overrides)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    if args.pose_dir:
        # Load pose ONLY from pose_dir: the artifacts pose may have a
        # different in_frames (stem channel count) than the candidate and
        # would fail shape-checked restore against this pipeline's `like`.
        like = dict(pipe.params)
        pose_like = like.pop("pose")
        pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                      like=like)
        step = checkpoint.latest_step_dir(args.pose_dir) or args.pose_dir
        pipe.params["pose"] = checkpoint.restore_params(step, like=pose_like)
        log(f"pose params overridden from {step}")
    else:
        pipe.params = checkpoint.load_pipeline_params(
            args.artifacts, like=pipe.params
        )

    def make_pair(fault, sev, seed):
        """Render (faulty, clean) clips that differ ONLY by the deflection."""
        out = []
        for faults in ({fault: sev}, {}):
            s = data.swing_keypoints(
                args.frames, np.random.default_rng(seed),
                tempo_warp=float(
                    np.random.default_rng(seed + 1).uniform(-0.8, 0.8)
                ),
                faults=faults,
            )
            s = data.place_in_image(
                s, hw, person_height_px=0.65 * hw[0],
                rng=np.random.default_rng(seed + 2),
            )
            # In-domain families only: this probe isolates fast-arm pose
            # fidelity; cross-domain transfer is measured separately
            # (demo_e2e --domain-clips).  Drawing the held-out family here
            # would conflate the two axes.
            fam_rng = np.random.default_rng(seed + 4)
            s = data.render_frames_photo(
                s, hw, rng=np.random.default_rng(seed + 3),
                scene_family=int(fam_rng.choice(data.TRAIN_SCENE_FAMILIES)),
            )
            out.append(s)
        return out

    report = {"severity": args.severity, "pairs": args.pairs,
              "hw": list(hw), "faults": {}}
    for fault in cfg_mod.SWING_ERRORS:
        joints = FAULT_JOINTS[fault]
        num = np.zeros(len(joints))
        den = np.zeros(len(joints))
        mag = []
        for p in range(args.pairs):
            seed = args.seed + 977 * (p + 1) + 13 * cfg_mod.SWING_ERRORS.index(fault)
            s_fault, s_clean = make_pair(fault, args.severity, seed)
            r_fault = pipe.analyze(s_fault.frames)
            r_clean = pipe.analyze(s_clean.frames)
            T = args.frames
            kp_f = np.asarray(r_fault.keypoints)[:T, :, :2]
            kp_c = np.asarray(r_clean.keypoints)[:T, :, :2]
            true_d = s_fault.keypoints[:T, :, :2] - s_clean.keypoints[:T, :, :2]
            pred_d = kp_f - kp_c
            for ji, j in enumerate(joints):
                m = np.linalg.norm(true_d[:, j], axis=-1) > 1.0  # >1px frames
                num[ji] += float((pred_d[m, j] * true_d[m, j]).sum())
                den[ji] += float((true_d[m, j] ** 2).sum())
                if m.any():
                    mag.append(float(np.abs(true_d[m, j]).max()))
        gains = {str(j): round(float(num[ji] / max(den[ji], 1e-9)), 3)
                 for ji, j in enumerate(joints)}
        entry = {
            "per_joint_gain": gains,
            "mean_gain": round(float(np.mean(list(gains.values()))), 3),
            "peak_true_defl_px": round(float(np.max(mag)) if mag else 0.0, 1),
        }
        report["faults"][fault] = entry
        log(f"[{fault:16s}] mean gain {entry['mean_gain']:+.3f}  "
            f"per-joint {gains}  peak true defl "
            f"{entry['peak_true_defl_px']:.0f}px")

    arm = [report["faults"][f]["mean_gain"] for f in ARM_FAULTS]
    report["arm_mean_gain"] = round(float(np.mean(arm)), 3)
    drift = [report["faults"][f]["mean_gain"]
             for f in cfg_mod.SWING_ERRORS if f not in ARM_FAULTS]
    report["drift_mean_gain"] = round(float(np.mean(drift)), 3)
    log(f"ARM faults mean gain:   {report['arm_mean_gain']:+.3f}  "
        f"(target >= 0.7)")
    log(f"drift faults mean gain: {report['drift_mean_gain']:+.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"arm_mean_gain": report["arm_mean_gain"],
                      "drift_mean_gain": report["drift_mean_gain"]}))


if __name__ == "__main__":
    main()
