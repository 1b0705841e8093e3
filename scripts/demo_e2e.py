"""End-to-end system evaluation with trained checkpoints.

Renders held-out synthetic swing videos, runs the FULL pipeline
(video -> preprocess -> pose -> decode -> GCN -> error, plus soft-DTW
alignment against a reference swing) with the trained params from
`artifacts/`, and scores every output against the generator's ground truth:

    PCK@0.05 through the whole video path (not just the pose stage),
    per-frame phase accuracy/F1, error-flag detection, alignment progress
    error, and a rendered side-by-side comparison video.

    python scripts/demo_e2e.py --clips 8 --out artifacts/demo
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
    ap.add_argument("--out", default="artifacts/demo")
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--domain-clips", type=int, default=6,
                    help="clips per held-out scene family for the "
                         "cross-domain generalization eval (0 disables)")
    ap.add_argument("--per-fault", type=int, default=10,
                    help="positive clips per fault in the stratified error "
                         "eval; 10+ gives per-fault F1 statistical power "
                         "(VERDICT r3 #4: n=3 quantized F1 in 0.33 steps)")
    ap.add_argument("--jitter-clips", type=int, default=6,
                    help="extra camera-shake clips scoring motion-energy "
                         "boxes vs keypoint-refined boxes (0 disables)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator, visualize
    from golfaction_tpu.train import checkpoint, data, metrics

    os.makedirs(args.out, exist_ok=True)

    def log(m):
        print(m, file=sys.stderr, flush=True)

    cfg = cfg_mod.get_config(
        "full_pipeline",
        video_hw=tuple(args.hw),
        length_buckets=(args.frames,),
    )
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    pipe.params = checkpoint.load_pipeline_params(args.artifacts, like=pipe.params)
    log(f"loaded trained params from {args.artifacts}")

    hw = tuple(args.hw)
    # Main sections render from TRAIN families only (the in-domain
    # numbers); cross-domain transfer is measured separately below on the
    # held-out families, so the two are never conflated.
    samples = data.make_swing_batch(args.clips, args.frames, seed=990_000,
                                    image_hw=hw, render=True, fault_prob=0.5,
                                    scene_families=data.TRAIN_SCENE_FAMILIES)
    ref_sample = data.make_swing_batch(1, args.frames, seed=991_000,
                                       image_hw=hw, render=True,
                                       fault_prob=0.0,
                                       scene_families=data.TRAIN_SCENE_FAMILIES)[0]

    ref_res = pipe.analyze(ref_sample.frames)
    ref_skel = pipe.extract_skeleton(ref_res)

    pcks, accs, f1s, prog_errs = [], [], [], []
    flag_pred, flag_true = [], []
    results = [pipe.analyze(s.frames, reference=ref_skel) for s in samples]

    for s, res in zip(samples, results):
        T = args.frames
        kpts = np.asarray(res.keypoints)[:T]
        bbox = np.maximum(s.boxes[:, 2], s.boxes[:, 3])
        pcks.append(float(metrics.pck(
            jnp.asarray(kpts), jnp.asarray(s.keypoints), jnp.asarray(bbox),
            alpha=0.05)))
        pred_labels = np.asarray(res.phase_labels)[:T]
        accs.append(float(metrics.phase_accuracy(
            jnp.asarray(pred_labels), jnp.asarray(s.phase_labels))))
        f1s.append(float(metrics.phase_f1(
            jnp.asarray(pred_labels), jnp.asarray(s.phase_labels),
            cfg_mod.NUM_PHASES)))
        flag_pred.append(np.asarray(res.error_probs))
        flag_true.append(s.error_flags)
        L = int(res.alignment.path_length)
        prog_errs.append(float(metrics.alignment_progress_error(
            res.alignment.path, res.alignment.path_length,
            jnp.asarray(s.progress), jnp.asarray(ref_sample.progress))))

    # Error detection is scored on a STRATIFIED set (every fault
    # represented) — the random 12-clip draw above routinely misses whole
    # faults, making its per-fault recall meaningless.
    err_samples = data.make_fault_balanced_batch(
        args.per_fault, args.frames, seed=993_000, image_hw=hw, render=True,
        clean=2 * args.per_fault,
        scene_families=data.TRAIN_SCENE_FAMILIES)
    err_pred, err_true = [], []
    for s in err_samples:
        r = pipe.analyze(s.frames, reference=ref_skel)
        err_pred.append(np.asarray(r.error_probs))
        err_true.append(s.error_flags)
    thr = checkpoint.load_error_thresholds(args.artifacts)
    em = metrics.error_detection_metrics(
        jnp.asarray(np.stack(err_pred)), jnp.asarray(np.stack(err_true)),
        threshold=jnp.asarray(thr) if thr is not None else 0.5)

    # Comparison video for the first clip (reference README.md:50-52).
    s0, r0 = samples[0], results[0]
    L = int(r0.alignment.path_length)
    panels = visualize.render_comparison(
        s0.frames, np.asarray(r0.keypoints),
        ref_sample.frames, np.asarray(ref_res.keypoints),
        np.asarray(r0.alignment.path), L, max_pairs=24,
    )
    video_path = os.path.join(args.out, "compare.mp4")
    visualize.write_video(video_path, panels, fps=12)

    summary = {
        "clips": args.clips,
        "error_eval_clips": len(err_samples),
        "pck05_mean": float(np.mean(pcks)),
        "phase_acc_mean": float(np.mean(accs)),
        "phase_f1_mean": float(np.mean(f1s)),
        "error_detection": {k: float(v) for k, v in em.items()},
        "error_detection_per_fault": metrics.error_detection_per_fault(
            np.stack(err_pred), np.stack(err_true),
            thr if thr is not None else 0.5),
        "align_progress_err_mean": float(np.mean(prog_errs)),
        "comparison_video": video_path,
    }

    # ---- cross-domain eval: scene families held out of ALL training ----
    # Family 2 (real-photo composite) is excluded from every training
    # render from round 3 on (train/data.py TRAIN_SCENE_FAMILIES); family 3
    # (dusk lighting + striped shirt + warm cast + vignette) exists only
    # for eval.  Scores on them measure transfer to scene statistics the
    # models have never seen (VERDICT r2 #6; reference README.md:4-6 demos
    # real footage, the strongest proxy this zero-egress sandbox allows).
    if args.domain_clips > 0:
        summary["unseen_domain"] = {}
        for fam, name in ((data.HELDOUT_SCENE_FAMILY, "photo_composite"),
                          (data.EVAL_ONLY_SCENE_FAMILY, "dusk")):
            dom = data.make_swing_batch(
                args.domain_clips, args.frames, seed=994_000 + fam,
                image_hw=hw, render=True, fault_prob=0.5,
                scene_families=(fam,))
            dpck, dacc, df1 = [], [], []
            for s in dom:
                res = pipe.analyze(s.frames)
                kp = np.asarray(res.keypoints)[: args.frames]
                bbox = np.maximum(s.boxes[:, 2], s.boxes[:, 3])
                dpck.append(float(metrics.pck(
                    jnp.asarray(kp), jnp.asarray(s.keypoints),
                    jnp.asarray(bbox), alpha=0.05)))
                pl = np.asarray(res.phase_labels)[: args.frames]
                dacc.append(float(metrics.phase_accuracy(
                    jnp.asarray(pl), jnp.asarray(s.phase_labels))))
                df1.append(float(metrics.phase_f1(
                    jnp.asarray(pl), jnp.asarray(s.phase_labels),
                    cfg_mod.NUM_PHASES)))
            summary["unseen_domain"][name] = {
                "clips": args.domain_clips,
                "pck05_mean": float(np.mean(dpck)),
                "phase_acc_mean": float(np.mean(dacc)),
                "phase_f1_mean": float(np.mean(df1)),
            }
            log(f"[domain:{name}] PCK {np.mean(dpck):.4f} "
                f"phase acc {np.mean(dacc):.4f} F1 {np.mean(df1):.4f}")

    # ---- moving-camera eval: motion-energy vs keypoint-refined boxes ----
    # Proves the box_refine_stride path (keypoint-seeded tracking): with
    # camera shake, frame-differencing boxes degrade while the coarse-pose-
    # seeded refinement should hold PCK near the static-camera number.
    if args.jitter_clips > 0:
        import dataclasses as _dc

        jit_samples = data.make_swing_batch(
            args.jitter_clips, args.frames, seed=992_000, image_hw=hw,
            render=True, fault_prob=0.0, camera_jitter=0.03,
            scene_families=data.TRAIN_SCENE_FAMILIES)

        def _pck_through(p, samples_):
            vals = []
            for s in samples_:
                res = p.analyze(s.frames)
                kp = np.asarray(res.keypoints)[: args.frames]
                bbox = np.maximum(s.boxes[:, 2], s.boxes[:, 3])
                vals.append(float(metrics.pck(
                    jnp.asarray(kp), jnp.asarray(s.keypoints),
                    jnp.asarray(bbox), alpha=0.05)))
            return float(np.mean(vals))

        pck_motion = _pck_through(pipe, jit_samples)
        pipe_r = orchestrator.Pipeline(
            _dc.replace(cfg, box_refine_stride=4), seed=0)
        pipe_r.params = pipe.params
        pck_refined = _pck_through(pipe_r, jit_samples)
        summary["jitter_eval"] = {
            "clips": args.jitter_clips,
            "camera_jitter": 0.03,
            "pck05_motion_boxes": pck_motion,
            "pck05_refined_boxes": pck_refined,
            "pck05_static_baseline": float(np.mean(pcks)),
        }
        log(f"[jitter] PCK motion-boxes {pck_motion:.4f} vs refined "
            f"{pck_refined:.4f} (static baseline {np.mean(pcks):.4f})")
    with open(os.path.join(args.out, "e2e_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
