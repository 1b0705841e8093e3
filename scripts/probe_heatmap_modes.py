"""Is the true (deflected) joint location still present as a heatmap mode?

BASELINE.md round-3 diagnosis of the chicken_wing bottleneck: in faulted
follow-through frames the decoded elbow sits near the CANONICAL position
(prior-domination) 18-24 px from the true deflected one.  Two very
different fixes follow depending on the heatmap's shape in those frames:

  * UNIMODAL at the canonical spot -> the network never represents the
    deflection; only training-distribution work (poseX candidates) helps.
  * BIMODAL (secondary mode at/near the true spot) -> the information
    survives the backbone and is lost at the single-peak argmax decode; a
    multi-hypothesis decode with temporal consistency can recover it
    without touching the weights.

This probe measures that directly: for paired (fault, clean-twin) clips it
runs the real pipeline front (full-frame coarse pass -> keypoint-seeded
refined boxes -> pose), extracts the fault joint's heatmaps on frames
where the true deflection exceeds a threshold, finds the top-K local
maxima (greedy peak + 3px suppression), and reports, per frame, the
distance of each mode to the TRUE and CANONICAL locations in heatmap px.

    python scripts/probe_heatmap_modes.py --fault chicken_wing --pairs 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_arm_gain import FAULT_JOINTS  # noqa: E402


def topk_modes(hm: np.ndarray, k: int = 5, suppress_px: float = 3.0):
    """Greedy non-max-suppressed local maxima of one [H, W] heatmap."""
    h = hm.astype(np.float64).copy()
    H, W = h.shape
    ys, xs = np.mgrid[0:H, 0:W]
    modes = []
    for _ in range(k):
        idx = int(np.argmax(h))
        y, x = divmod(idx, W)
        v = float(h[y, x])
        if v <= 0:
            break
        modes.append((float(x), float(y), v))
        h[(ys - y) ** 2 + (xs - x) ** 2 <= suppress_px**2] = 0.0
    return modes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--out", default="artifacts/probe_heatmap_modes.json")
    ap.add_argument("--fault", default="chicken_wing")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--severity", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=880_000)
    ap.add_argument("--min-defl-px", type=float, default=8.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import _probe_common

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.ops import heatmap
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint

    def log(m):
        print(m, file=sys.stderr, flush=True)

    hw = tuple(args.hw)
    cfg = cfg_mod.get_config("full_pipeline", video_hw=hw,
                             length_buckets=(args.frames,))
    # Full checkpoint self-configuration (in_frames + refine + error spread
    # dims), not just in_frames: load_pipeline_params(like=...) needs the
    # init tree to match a spread-widened error checkpoint too (ADVICE r3).
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                  like=pipe.params)
    c = pipe.cfg

    fn = _probe_common.make_pose_heatmaps_fn(pipe)

    joints = FAULT_JOINTS[args.fault]
    per_frame = []
    for p in range(args.pairs):
        seed = args.seed + 977 * (p + 1) + 13 * cfg_mod.SWING_ERRORS.index(args.fault)
        faulty, clean = _probe_common.render_pair(
            args.fault, args.severity, seed, args.frames, hw)
        clips = {"fault": faulty, "clean": clean}
        frames_p, boxes_p, _valid = pipe._prepare(clips["fault"].frames, None)
        hm, boxes = fn(pipe.params, jnp.asarray(frames_p),
                       jnp.asarray(boxes_p))
        hm = np.asarray(hm)
        boxes = np.asarray(boxes)
        true_d = (clips["fault"].keypoints[..., :2]
                  - clips["clean"].keypoints[..., :2])
        # GT true + canonical positions in heatmap space.
        gt_true = np.asarray(heatmap.image_keypoints_to_heatmap(
            jnp.asarray(clips["fault"].keypoints), jnp.asarray(boxes),
            c.pose.heatmap_hw, c.pose.input_hw))
        gt_canon = np.asarray(heatmap.image_keypoints_to_heatmap(
            jnp.asarray(clips["clean"].keypoints), jnp.asarray(boxes),
            c.pose.heatmap_hw, c.pose.input_hw))
        for j in joints:
            mask = np.linalg.norm(true_d[:, j], axis=-1) >= args.min_defl_px
            for t in np.nonzero(mask)[0]:
                modes = topk_modes(hm[t, j] if hm.ndim == 4 else hm[t, j])
                if not modes:
                    continue
                tx, ty = gt_true[t, j, :2]
                cx, cy = gt_canon[t, j, :2]
                d_true = [float(np.hypot(m[0] - tx, m[1] - ty)) for m in modes]
                d_canon = [float(np.hypot(m[0] - cx, m[1] - cy)) for m in modes]
                best_true = int(np.argmin(d_true))
                per_frame.append({
                    "pair": p, "frame": int(t), "joint": int(j),
                    "true_defl_img_px": round(float(np.linalg.norm(true_d[t, j])), 1),
                    "sep_hm_px": round(float(np.hypot(tx - cx, ty - cy)), 2),
                    "peak_d_true": round(d_true[0], 2),
                    "peak_d_canon": round(d_canon[0], 2),
                    "best_mode_d_true": round(d_true[best_true], 2),
                    "best_mode_rank": best_true,
                    "best_mode_rel_mass": round(modes[best_true][2] / modes[0][2], 3),
                    "n_modes": len(modes),
                })
        log(f"pair {p}: {int(mask.sum())} faulted frames analyzed")

    if not per_frame:
        log("no frames above deflection threshold")
        return

    sep = np.array([f["sep_hm_px"] for f in per_frame])
    well_sep = sep >= 2.0  # modes distinguishable at heatmap sigma=2
    bt = np.array([f["best_mode_d_true"] for f in per_frame])
    pt = np.array([f["peak_d_true"] for f in per_frame])
    pc = np.array([f["peak_d_canon"] for f in per_frame])
    summary = {
        "fault": args.fault,
        "frames": len(per_frame),
        "frames_well_separated": int(well_sep.sum()),
        # peak closer to canonical than true = prior-domination confirmed
        "peak_nearer_canon_frac": round(float(np.mean(pc[well_sep] < pt[well_sep])), 3) if well_sep.any() else None,
        # some mode within 2 hm px of the true location = recoverable
        "true_mode_present_frac": round(float(np.mean(bt[well_sep] <= 2.0)), 3) if well_sep.any() else None,
        "median_peak_d_true": round(float(np.median(pt[well_sep])), 2) if well_sep.any() else None,
        "median_best_mode_d_true": round(float(np.median(bt[well_sep])), 2) if well_sep.any() else None,
        "median_best_mode_rel_mass": round(float(np.median(
            [f["best_mode_rel_mass"] for f, w in zip(per_frame, well_sep) if w])), 3) if well_sep.any() else None,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "frames": per_frame}, f, indent=1)
    log(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
