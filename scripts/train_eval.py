"""Train all four models on the synthetic swing dataset and evaluate.

Produces the build's accuracy numbers (PCK@0.05, swing-phase F1, error
detection F1, alignment progress error — the parity metrics of
BASELINE.json) plus Orbax checkpoints the Pipeline/CLI can load.

    python scripts/train_eval.py --steps 300 --out artifacts
    python scripts/train_eval.py --skip pose --steps 200   # skeleton models only

Writes <out>/params/{pose,gcn,align,error}/step_XXXXXXXX and
<out>/metrics.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pose-steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["pose", "gcn", "align", "error"])
    ap.add_argument("--eval-clips", type=int, default=32)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate latest checkpoints in --out")
    ap.add_argument("--arm-weight", type=float, default=3.0,
                    help="pose loss upweight for elbows/wrists (hips at "
                         "half the boost) — arm-fidelity intervention")
    ap.add_argument("--fast-frame-boost", type=float, default=3.0,
                    help="oversampling boost for high-wrist-travel "
                         "(motion-blurred) pool frames")
    ap.add_argument("--pose-in-frames", type=int, default=1,
                    help="adjacent frames channel-concatenated as pose "
                         "input (1 or 3) — temporal-context deblur")
    ap.add_argument("--pool-fault-prob", type=float, default=0.5,
                    help="fault rate in the pose render pool (faulty arms "
                         "leave the canonical trajectory — image-trust "
                         "supervision)")
    ap.add_argument("--fault-frame-boost", type=float, default=2.0,
                    help="oversampling boost for pool frames where an "
                         "injected fault displaced a joint (chicken_wing "
                         "lives in a few follow-through frames)")
    ap.add_argument("--fault-joint-boost", type=float, default=2.0,
                    help="heatmap-loss upweight for exactly the joints a "
                         "fault displaced, scaled by deflection")
    ap.add_argument("--pose-init-from", default=None,
                    help="params checkpoint (.npz or Orbax step dir) to "
                         "warm-start pose training from (fresh optimizer) "
                         "— the sigma-finetune path: from-scratch training "
                         "at sigma 1.25 stalls (PCK 0.69), warm-started "
                         "from the sigma-2 poseF it only has to sharpen "
                         "its output Gaussians")
    ap.add_argument("--pose-lr", type=float, default=1e-3,
                    help="pose learning rate (finetunes want ~3e-4)")
    ap.add_argument("--pose-sigma", type=float, default=2.0,
                    help="training-target heatmap gaussian sigma.  2.0 is "
                         "the classic SimpleBaseline target; 1.25 makes "
                         "canonical-vs-true modes ~2.6 hm px apart "
                         "SEPARABLE local maxima (bimodality needs sep > "
                         "2*sigma) so tracked decode can recover fault "
                         "deflections (BASELINE.md r3 root cause)")
    ap.add_argument("--arm-wander", type=float, default=0.0,
                    help="smooth random elbow/wrist wander amplitude (body "
                         "units, ~0.1) in the pose render pool — kills the "
                         "canonical-arm prior behind chicken_wing "
                         "attenuation (pose pool only)")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import align as align_mod
    from golfaction_tpu.models import error as error_mod
    from golfaction_tpu.models import gcn as gcn_mod
    from golfaction_tpu.models import pose as pose_mod
    from golfaction_tpu.ops import softdtw
    from golfaction_tpu.train import checkpoint, data, loops, metrics

    os.makedirs(args.out, exist_ok=True)
    # Merge with prior runs (e.g. per-model --skip passes) instead of clobbering.
    metrics_path = f"{args.out}/metrics.json"
    results = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            results = json.load(f)
    t_start = time.time()

    def log(m):
        print(m, file=sys.stderr, flush=True)

    tc = cfg_mod.TrainConfig(
        batch_size=args.batch_size, total_steps=args.steps,
        warmup_steps=max(args.steps // 10, 1),
    )

    # ---------------- GCN ----------------
    if "gcn" not in args.skip:
        gcn_cfg = cfg_mod.GCNConfig()
        if args.eval_only:
            ck = checkpoint.latest_step_dir(f"{args.out}/params/gcn")
            state = loops.TrainState(checkpoint.restore_params(ck), None)
            hist = results.get("gcn", {}).get("history", [])
        else:
            log(f"[gcn] training {args.steps} steps ...")
            state, hist = loops.train_gcn(gcn_cfg, tc, frames_per_clip=args.frames,
                                          log_every=max(args.steps // 10, 1))
            log(f"[gcn] loss {hist[0]['loss']:.3f} -> {hist[-1]['loss']:.3f}")
            ck = checkpoint.save_params(f"{args.out}/params/gcn", state.params,
                                        step=state.step)
        # Eval on held-out seeds.
        model = gcn_mod.create_gcn_model(gcn_cfg)
        samples = data.make_swing_batch(args.eval_clips, args.frames, seed=777_000)
        sk, labels, valid = loops.build_gcn_batch(samples)
        logits = jax.jit(lambda p, s, v: model.apply(p, s, v))(state.params, sk, valid)
        pred = jnp.argmax(logits, -1)
        acc = float(metrics.phase_accuracy(pred, labels, valid))
        f1 = float(metrics.phase_f1(pred, labels, cfg_mod.NUM_PHASES, valid))
        results["gcn"] = {"history": hist, "eval_acc": acc, "eval_f1": f1,
                          "checkpoint": ck}
        log(f"[gcn] eval phase acc={acc:.4f} macro-F1={f1:.4f}")

    # ---------------- Error ----------------
    if "error" not in args.skip:
        err_cfg = cfg_mod.ErrorConfig()
        if args.eval_only:
            ck = checkpoint.latest_step_dir(f"{args.out}/params/error")
            state = loops.TrainState(checkpoint.restore_params(ck), None)
            hist = results.get("error", {}).get("history", [])
        else:
            log(f"[error] training {args.steps} steps ...")
            state, hist = loops.train_error(err_cfg, tc, frames_per_clip=args.frames,
                                            log_every=max(args.steps // 10, 1))
            ck = checkpoint.save_params(f"{args.out}/params/error", state.params,
                                        step=state.step)
        model = error_mod.create_error_model(err_cfg)
        samples = data.make_swing_batch(args.eval_clips, args.frames,
                                        seed=778_000, fault_prob=0.5)
        sk, phase_logits, flags, valid, _ = loops.build_error_batch(samples)
        logits = jax.jit(lambda p, s, pl_, v: model.apply(p, s, pl_, v))(
            state.params, sk, phase_logits, valid)
        em = metrics.error_detection_metrics(jax.nn.sigmoid(logits), flags)
        em = {k: float(v) for k, v in em.items()}
        # With a clean reference swing aligned in (the runtime compare mode).
        refs = data.make_swing_batch(args.eval_clips, args.frames,
                                     seed=779_000, fault_prob=0.0)
        skr, plr, flr, vr, ref_warp = loops.build_error_batch(samples, refs)
        logits_r = jax.jit(lambda p, s, pl_, v, rw: model.apply(p, s, pl_, v, rw))(
            state.params, skr, plr, vr, ref_warp)
        emr = metrics.error_detection_metrics(jax.nn.sigmoid(logits_r), flr)
        em_ref = {k: float(v) for k, v in emr.items()}
        results["error"] = {"history": hist, "eval": em, "eval_with_ref": em_ref,
                            "checkpoint": ck}
        log(f"[error] eval {em}")
        log(f"[error] eval+ref {em_ref}")

    # ---------------- Align ----------------
    if "align" not in args.skip:
        al_cfg = cfg_mod.AlignConfig()
        if args.eval_only:
            ck = checkpoint.latest_step_dir(f"{args.out}/params/align")
            state = loops.TrainState(checkpoint.restore_params(ck), None)
            hist = results.get("align", {}).get("history", [])
        else:
            align_steps = max(args.steps // 2, 1)
            log(f"[align] training {align_steps} steps ...")
            al_tc = dataclasses.replace(tc, total_steps=align_steps,
                                        batch_size=max(args.batch_size // 2, 2))
            state, hist = loops.train_align(al_cfg, al_tc, frames_per_clip=48,
                                            log_every=max(align_steps // 10, 1))
            ck = checkpoint.save_params(f"{args.out}/params/align", state.params,
                                        step=state.step)
        model = align_mod.create_align_model(al_cfg)
        # Eval: align tempo-warped pairs, measure progress error along path.
        errs = []
        fwd = jax.jit(lambda p, s, v: model.apply(p, s, v))
        for i in range(8):
            r = np.random.default_rng(779_000 + i)
            a = data.swing_keypoints(48, r, tempo_warp=-0.6)
            b = data.swing_keypoints(48, np.random.default_rng(779_500 + i),
                                     tempo_warp=0.6)
            va = jnp.ones((1, 48), bool)
            sa = gcn_mod.normalize_skeleton(jnp.asarray(a.keypoints)[None], va)
            sb = gcn_mod.normalize_skeleton(jnp.asarray(b.keypoints)[None], va)
            ea = fwd(state.params, sa, va)[0]
            eb = fwd(state.params, sb, va)[0]
            D = softdtw.pairwise_sqdist(ea, eb)
            path, length = softdtw.dtw_path(D)
            err = float(metrics.alignment_progress_error(
                path, length, jnp.asarray(a.progress), jnp.asarray(b.progress)))
            errs.append(err)
        results["align"] = {"history": hist,
                            "eval_progress_err": float(np.mean(errs)),
                            "checkpoint": ck}
        log(f"[align] eval mean progress error {np.mean(errs):.4f} "
            f"(identity-warp baseline ~{np.mean(np.abs(np.linspace(0,1,48)**0.66 - np.linspace(0,1,48)**1.52)):.3f})")

    # ---------------- Pose ----------------
    if "pose" not in args.skip:
        pose_cfg = cfg_mod.PoseConfig(in_frames=args.pose_in_frames,
                                      sigma=args.pose_sigma)
        if args.eval_only:
            ck = checkpoint.latest_step_dir(f"{args.out}/params/pose")
            state = loops.TrainState(checkpoint.restore_params(ck), None)
            hist = results.get("pose", {}).get("history", [])
        else:
            pose_steps = args.pose_steps or max(args.steps // 2, 1)
            log(f"[pose] training {pose_steps} steps ...")
            pose_tc = dataclasses.replace(tc, total_steps=pose_steps,
                                          learning_rate=args.pose_lr)
            state, hist = loops.train_pose(
                pose_cfg, pose_tc, image_hw=(540, 960), clips_per_epoch=8,
                frames_per_clip=8, log_every=max(pose_steps // 10, 1),
                pool_clips=160, arm_weight=args.arm_weight,
                fast_frame_boost=args.fast_frame_boost,
                pool_fault_prob=args.pool_fault_prob,
                fault_frame_boost=args.fault_frame_boost,
                fault_joint_boost=args.fault_joint_boost,
                arm_wander=args.arm_wander,
                init_from=args.pose_init_from)
            ck = checkpoint.save_params(f"{args.out}/params/pose", state.params,
                                        step=state.step)
        # Eval PCK@0.05 through the full preprocess->pose->decode path.
        from golfaction_tpu.ops import affine, heatmap, preprocess

        model = pose_mod.create_pose_model(pose_cfg)
        samples = data.make_swing_batch(4, 8, seed=780_000,
                                        image_hw=(540, 960), render=True,
                                        scene_families=data.TRAIN_SCENE_FAMILIES)
        pcks = []
        fwd = jax.jit(lambda p, x: model.apply(p, x))
        for s in samples:
            boxes = affine.box_to_center_scale(
                jnp.asarray(s.boxes),
                aspect_ratio=pose_cfg.input_hw[1] / pose_cfg.input_hw[0])
            crops = loops.pose_eval_crops(s.frames, boxes, pose_cfg)
            hm = fwd(state.params, crops)
            kpts = heatmap.decode_heatmaps(hm, "udp")
            kpts_img = heatmap.keypoints_to_image(
                kpts, boxes, pose_cfg.heatmap_hw, pose_cfg.input_hw)
            bbox = jnp.maximum(boxes[:, 2], boxes[:, 3])
            pcks.append(float(metrics.pck(
                kpts_img, jnp.asarray(s.keypoints), bbox, alpha=0.05)))
        results["pose"] = {"history": hist, "eval_pck05": float(np.mean(pcks)),
                           "checkpoint": ck}
        log(f"[pose] eval PCK@0.05 = {np.mean(pcks):.4f}")

    results["wall_time_s"] = time.time() - t_start
    with open(metrics_path, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {args.out}/metrics.json ({results['wall_time_s']:.0f}s)")
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "history"}
                      if isinstance(v, dict) else v
                      for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
