"""Can heatmap SECOND MOMENTS recover the attenuated fault deflection?

Follow-up to probe_heatmap_modes: the canonical-prior and true modes sit
~2.6 hm px apart — below the 2-sigma bimodality threshold — so they merge
into one elongated blob and the multi-hypothesis decode measured ZERO
arm-gain recovery (probe_arm_gain_tracked.json).  For a merged mixture
with weights (1-w, w) and separation d the decoded mean moves only w·d
(the measured 0.34 gain) but the variance along the separation axis reads
sigma² + w(1-w)d² — the deflection survives in the spread.

This probe quantifies that through the REAL pipeline front.  For paired
(fault, clean-twin) clips it computes, on frames where the true
deflection exceeds a threshold, per affected joint:

  dev      — predicted deflection projected on the true direction u
             (what the error head sees today; gain ~0.34 on arms);
  excess   — sqrt(max(u'Σu − (sigma·s)², 0)) in image px, where Σ is the
             windowed heatmap covariance mapped to image space and
             sigma·s the training-target spread (the INFERENCE-AVAILABLE
             baseline; no twin needed);
  excess_c — the same statistic on the clean twin's frame (false-signal
             floor: motion blur also widens blobs).

Reports, per fault: the dev-only gain (should reproduce probe_arm_gain),
a leave-one-pair-out gain for ŝ = a·dev + b·excess, and the fault/clean
excess separability (AUC).  GO signal: combo gain ≳ 0.7 with AUC ≳ 0.8 →
wire moment features into the error head.

    python scripts/probe_heatmap_spread.py --pairs 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_arm_gain import ARM_FAULTS, FAULT_JOINTS  # noqa: E402
import _probe_common  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--out", default="artifacts/probe_heatmap_spread.json")
    ap.add_argument("--faults", nargs="*", default=list(ARM_FAULTS))
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--seed", type=int, default=880_000)
    ap.add_argument("--min-defl-px", type=float, default=8.0)
    ap.add_argument("--radius", type=float, default=8.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.ops import heatmap
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint

    def log(m):
        print(m, file=sys.stderr, flush=True)

    hw = tuple(args.hw)
    cfg = cfg_mod.get_config("full_pipeline", video_hw=hw,
                             length_buckets=(args.frames,))
    # Match the artifacts tree (pose in_frames, refiner, and crucially
    # error.spread_features — a spread-widened error checkpoint cannot
    # restore into the base-width head).
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                  like=pipe.params)
    c = pipe.cfg
    sigma0 = c.pose.sigma

    fn = _probe_common.make_pose_heatmaps_fn(pipe)

    def clip_stats(sample):
        """heatmap-space decode + moments + per-frame image scale."""
        frames_p, boxes_p, _v = pipe._prepare(sample.frames, None)
        hm, boxes = fn(pipe.params, jnp.asarray(frames_p),
                       jnp.asarray(boxes_p))
        kpt_img = np.asarray(heatmap.keypoints_to_image(
            heatmap.decode_heatmaps(hm, method="udp"), boxes,
            c.pose.heatmap_hw, c.pose.input_hw))
        mom = np.asarray(heatmap.moment_stats(hm, radius=args.radius))
        scale = np.asarray(boxes)[:, 3] / c.pose.heatmap_hw[0]  # img px / hm px
        return kpt_img, mom, scale

    report = {"severity": "varied 0.4-1.15", "pairs": args.pairs,
              "hw": list(hw), "radius": args.radius, "faults": {}}
    for fault in args.faults:
        joints = FAULT_JOINTS[fault]
        rows = []  # (pair, target, dev, excess_f, excess_c)
        for p in range(args.pairs):
            # Severity VARIES across pairs: at fixed severity the target
            # magnitude is near-constant, so any fit with an intercept
            # trivially predicts the mean (first probe run reported a
            # meaningless 1.000 combo gain for every fault).
            sev = 0.4 + 0.75 * p / max(args.pairs - 1, 1)
            seed = (args.seed + 977 * (p + 1)
                    + 13 * cfg_mod.SWING_ERRORS.index(fault))
            s_fault, s_clean = _probe_common.render_pair(
                fault, sev, seed, args.frames, hw)
            kp_f, mom_f, sc_f = clip_stats(s_fault)
            kp_c, mom_c, sc_c = clip_stats(s_clean)
            T = args.frames
            true_d = (s_fault.keypoints[:T, :, :2]
                      - s_clean.keypoints[:T, :, :2])
            for j in joints:
                mag = np.linalg.norm(true_d[:, j], axis=-1)
                for t in np.nonzero(mag >= args.min_defl_px)[0]:
                    u = true_d[t, j] / mag[t]
                    dev = float((kp_f[t, j, :2] - kp_c[t, j, :2]) @ u)

                    def excess(mom, sc):
                        _, _, cxx, cxy, cyy = mom[t, j]
                        s2 = sc[t] ** 2
                        var_u = s2 * (u[0] * u[0] * cxx
                                      + 2 * u[0] * u[1] * cxy
                                      + u[1] * u[1] * cyy)
                        return float(np.sqrt(max(
                            var_u - (sigma0 * sc[t]) ** 2, 0.0)))

                    rows.append((p, float(mag[t]), dev,
                                 excess(mom_f, sc_f), excess(mom_c, sc_c)))
            log(f"[{fault}] pair {p}: {len(rows)} rows so far")
        if not rows:
            report["faults"][fault] = {"rows": 0}
            continue
        arr = np.asarray(rows, np.float64)
        tgt, dev, exf, exc = arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]
        gain_dev = float((dev @ tgt) / (tgt @ tgt))

        # Leave-one-pair-out, NO intercept (an intercept would just learn
        # the fault's mean magnitude): fit s_hat = a*dev [+ b*excess] on
        # the other pairs, evaluate gain on the held-out one.
        def lopo_gain(cols):
            num = den = 0.0
            X = np.stack(cols, 1)
            for p in range(args.pairs):
                tr, te = arr[:, 0] != p, arr[:, 0] == p
                if not te.any() or tr.sum() < 4:
                    continue
                coef, *_ = np.linalg.lstsq(X[tr], tgt[tr], rcond=None)
                s_hat = X[te] @ coef
                num += float(s_hat @ tgt[te])
                den += float(tgt[te] @ tgt[te])
            return float(num / max(den, 1e-9))

        gain_dev_lopo = lopo_gain([dev])
        gain_combo = lopo_gain([dev, exf])
        # Separability of the excess statistic alone (fault vs clean twin
        # on the SAME frames): P(excess_f > excess_c).
        auc = float(np.mean(exf > exc))
        # Spread-transfer coefficient: how much of the mixture-model
        # prediction (excess variance = g(1-g)·d², with g·d ≈ the decoded
        # dev) the REAL heatmaps deliver.  The synthetic cascade spread
        # must be scaled by this per fault, or the error head learns to
        # trust a signal runtime never produces (measured: the beta=1
        # synthetic model regressed casting calib-F1 0.97 -> 0.73 because
        # real casting heatmaps carry ~zero directional excess).
        denom = float(np.mean(np.maximum(dev * (tgt - dev), 0.0)))
        beta = float(np.clip(
            (np.mean(exf ** 2) - np.mean(exc ** 2)) / max(denom, 1e-6),
            0.0, 1.5))
        entry = {
            "rows": len(rows),
            "beta": round(beta, 3),
            # Same scalar per affected joint — the format
            # data.load_spread_profile consumes (mirrors per_joint_gain).
            "per_joint_beta": {str(j): round(beta, 3) for j in joints},
            "gain_dev_only": round(gain_dev, 3),
            "gain_dev_lopo": round(gain_dev_lopo, 3),
            "gain_combo_lopo": round(gain_combo, 3),
            "excess_auc_vs_twin": round(auc, 3),
            "median_excess_fault_px": round(float(np.median(exf)), 2),
            "median_excess_clean_px": round(float(np.median(exc)), 2),
            "median_true_defl_px": round(float(np.median(tgt)), 1),
        }
        report["faults"][fault] = entry
        log(f"[{fault:14s}] dev-gain {gain_dev:+.3f}  combo-gain "
            f"{gain_combo:+.3f}  AUC {auc:.3f}  excess f/c "
            f"{entry['median_excess_fault_px']}/{entry['median_excess_clean_px']} px")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({f: report["faults"][f].get("gain_combo_lopo")
                      for f in args.faults}))


if __name__ == "__main__":
    main()
