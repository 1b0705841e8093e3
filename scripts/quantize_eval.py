"""PTQ int8 pose: accuracy + speed evaluation with the trained checkpoint.

Calibrates on rendered swing crops, then reports PCK@0.05 for the float and
int8 paths on held-out clips plus TPU wall-time for both.

    python scripts/quantize_eval.py --artifacts artifacts
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--calib-clips", type=int, default=4)
    ap.add_argument("--eval-clips", type=int, default=6)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-state", default=None,
                    help="run the host-side prep (render, calibration, "
                         "weight quantization) and pickle it here, then "
                         "exit.  Pair with --cpu: calibration is an EAGER "
                         "per-layer recording pass whose hundreds of "
                         "un-jitted ops each cost a compile+dispatch round "
                         "trip on a tunneled TPU (measured ~1 op/min); on "
                         "host CPU it is value-identical and takes "
                         "minutes.  The TPU process then only runs the "
                         "jitted forwards")
    ap.add_argument("--load-state", default=None,
                    help="load a --save-state pickle instead of "
                         "re-rendering/calibrating (the TPU measure stage)")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import pose, pose_quant
    from golfaction_tpu.ops import affine, heatmap, preprocess
    from golfaction_tpu.train import checkpoint, data, metrics

    def log(m):
        print(m, file=sys.stderr, flush=True)

    cfg = cfg_mod.PoseConfig(
        in_frames=checkpoint.detect_pose_in_frames(args.artifacts))
    model = pose.create_pose_model(cfg)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, *cfg.input_hw, 3 * cfg.in_frames)))
    ck = checkpoint.latest_step_dir(f"{args.artifacts}/params/pose")
    npz = f"{args.artifacts}/params/pose.npz"
    if ck:
        params = checkpoint.restore_params(ck, like=params)
        log(f"loaded pose params from {ck}")
    elif os.path.exists(npz):
        params = checkpoint.restore_params_npz(npz)
        log(f"loaded pose params from {npz}")
    else:
        log("WARNING: no trained pose checkpoint; evaluating random weights")

    hw = (540, 960)

    def crops_and_gt(n, seed):
        samples = data.make_swing_batch(n, args.frames, seed=seed,
                                        image_hw=hw, render=True)
        crops, gts, boxes_all = [], [], []
        for s in samples:
            boxes = affine.box_to_center_scale(
                jnp.asarray(s.boxes), aspect_ratio=cfg.input_hw[1] / cfg.input_hw[0])
            from golfaction_tpu.train import loops as loops_mod

            crops.append(loops_mod.pose_eval_crops(s.frames, boxes, cfg))
            gts.append(s.keypoints)
            boxes_all.append(boxes)
        return jnp.concatenate(crops), np.concatenate(gts), jnp.concatenate(boxes_all)

    if args.load_state:
        import pickle

        with open(args.load_state, "rb") as f:
            st = pickle.load(f)
        eval_crops = jnp.asarray(st["eval_crops"])
        gt_kpts = st["gt_kpts"]
        eval_boxes = jnp.asarray(st["eval_boxes"])
        qw = jax.tree.map(jnp.asarray, st["qw"])
        scales = st["scales"]
        log(f"state loaded from {args.load_state}")
    else:
        log("rendering calibration + eval clips ...")
        calib_crops, _, _ = crops_and_gt(args.calib_clips, 660_000)
        eval_crops, gt_kpts, eval_boxes = crops_and_gt(args.eval_clips,
                                                       661_000)

        log("calibrating ...")
        qw, scales = pose_quant.prepare_int8(params, cfg, calib_crops)

    if args.save_state:
        import pickle

        st = {
            "eval_crops": np.asarray(eval_crops),
            "gt_kpts": np.asarray(gt_kpts),
            "eval_boxes": np.asarray(eval_boxes),
            "qw": jax.tree.map(np.asarray, qw),
            "scales": scales,
        }
        with open(args.save_state, "wb") as f:
            pickle.dump(st, f)
        log(f"state saved to {args.save_state}; run --load-state on the "
            f"accelerator to measure")
        return

    f_float = jax.jit(lambda p, x: model.apply(p, x))
    f_int8 = jax.jit(lambda p, x: pose_quant.pose_forward_int8(p, qw, scales, cfg, x))
    f_fused = jax.jit(lambda p, x: pose_quant.pose_forward_int8_fused(
        p, qw, scales, cfg, x))

    def pck_of(hm):
        kpts = heatmap.decode_heatmaps(hm, "udp")
        img = heatmap.keypoints_to_image(kpts, eval_boxes, cfg.heatmap_hw, cfg.input_hw)
        bbox = jnp.maximum(eval_boxes[:, 2], eval_boxes[:, 3])
        return float(metrics.pck(img, jnp.asarray(gt_kpts), bbox, alpha=0.05))

    # Mixed: int8 early stages (large MXU-saturating blocks), bf16 tail
    # (VERDICT r2 #5 — find the winning granularity or retire).
    mixed = {
        k: jax.jit(lambda p, x, k=k: pose_quant.pose_forward_int8_mixed(
            p, qw, scales, cfg, x, int8_stages=k))
        for k in (1, 2, 3)
    }

    hm_f = f_float(params, eval_crops)
    hm_q = f_int8(params, eval_crops)
    hm_u = f_fused(params, eval_crops)
    pck_f, pck_q, pck_u = pck_of(hm_f), pck_of(hm_q), pck_of(hm_u)
    pck_m = {k: pck_of(f(params, eval_crops)) for k, f in mixed.items()}
    log(f"PCK@0.05 float={pck_f:.4f} int8={pck_q:.4f} int8-fused={pck_u:.4f} "
        f"mixed={pck_m}")

    def fence(o):
        return float(jnp.sum(o))

    def t(f, n1=20, n2=80):
        # Two-point slope fit (bench.py _time_fn_repeats): the tunnel
        # charges a FIXED 29-330 ms per timing window (fence round trip),
        # which at single-window sizes biases float-vs-int8 RATIOS toward
        # 1 — the subtraction removes it exactly (BASELINE.md round 4).
        def run(n):
            fence(f())
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f()
            fence(o)
            return time.perf_counter() - t0

        run(5)  # warm
        return (run(n2) - run(n1)) / (n2 - n1) * 1e3

    ms_f = t(lambda: f_float(params, eval_crops))
    ms_q = t(lambda: f_int8(params, eval_crops))
    ms_u = t(lambda: f_fused(params, eval_crops))
    ms_m = {k: t(lambda f=f: f(params, eval_crops)) for k, f in mixed.items()}
    n_crops = eval_crops.shape[0]
    log(f"forward {n_crops} crops: float {ms_f:.2f} ms | int8 {ms_q:.2f} ms "
        f"({ms_f / ms_q:.2f}x) | int8-fused {ms_u:.2f} ms ({ms_f / ms_u:.2f}x)")
    for k in sorted(ms_m):
        log(f"  mixed int8_stages={k}: {ms_m[k]:.2f} ms "
            f"({ms_f / ms_m[k]:.2f}x) PCK {pck_m[k]:.4f}")

    print(json.dumps({
        "pck_float": pck_f, "pck_int8": pck_q, "pck_int8_fused": pck_u,
        "ms_float": ms_f, "ms_int8": ms_q, "ms_int8_fused": ms_u,
        "speedup": ms_f / ms_q, "speedup_fused": ms_f / ms_u,
        "mixed": {str(k): {"ms": ms_m[k], "pck": pck_m[k],
                           "speedup": ms_f / ms_m[k]} for k in ms_m},
        "crops": int(n_crops),
    }))


if __name__ == "__main__":
    main()
