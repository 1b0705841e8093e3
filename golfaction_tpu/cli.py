"""Command-line interface: the L5 orchestration surface (SURVEY.md §1).

    python -m golfaction_tpu.cli analyze swing.mp4 [--reference pro.mp4]
    python -m golfaction_tpu.cli train {pose,gcn,align,error} [--steps N]
    python -m golfaction_tpu.cli bench

Outputs are JSON on stdout (per-frame keypoints/labels to a file when
--out is given); progress goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def cmd_analyze(args):
    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint

    cfg = cfg_mod.get_config(args.preset)
    if args.set:
        cfg = cfg_mod.apply_overrides(cfg, args.set)
    if args.checkpoint:
        cfg = checkpoint.config_for_artifacts(cfg, args.checkpoint)
    pipe = orchestrator.Pipeline(cfg)
    if args.checkpoint:
        if os.path.isdir(os.path.join(args.checkpoint, "params")) or any(
            os.path.isdir(os.path.join(args.checkpoint, m))
            for m in ("pose", "gcn", "align", "error")
        ):
            pipe.params = checkpoint.load_pipeline_params(
                args.checkpoint, like=pipe.params
            )
        else:
            pipe.params = checkpoint.restore_params(args.checkpoint, like=pipe.params)
        _log(f"restored params from {args.checkpoint}")
        thr = checkpoint.load_error_thresholds(args.checkpoint)
        if thr is not None:
            args.threshold = thr
            _log("using calibrated per-fault error thresholds")

    reference = None
    if args.reference:
        _log(f"analyzing reference swing {args.reference} ...")
        ref_res = pipe.analyze(args.reference)
        reference = pipe.extract_skeleton(ref_res)

    _log(f"analyzing {args.video} ...")
    res = pipe.analyze(args.video, reference=reference,
                       error_threshold=getattr(args, "threshold", 0.5))
    valid = np.asarray(res.valid)
    T = int(valid.sum())
    out = {
        "num_frames": T,
        "keypoints": np.asarray(res.keypoints)[:T].tolist(),
        "phase_labels": [
            cfg_mod.SWING_PHASES[i] for i in np.asarray(res.phase_labels)[:T]
        ],
        "error_probs": dict(
            zip(cfg_mod.SWING_ERRORS, np.asarray(res.error_probs).round(4).tolist())
        ),
        "error_flags": [
            name
            for name, f in zip(cfg_mod.SWING_ERRORS, np.asarray(res.error_flags))
            if f
        ],
    }
    if res.alignment is not None:
        L = int(res.alignment.path_length)
        out["alignment"] = {
            "cost": float(res.alignment.cost),
            "path": np.asarray(res.alignment.path)[:L].tolist(),
        }
    if args.report:
        from golfaction_tpu.pipeline import report as report_mod

        rep = report_mod.build_report(
            res, error_threshold=getattr(args, "threshold", 0.5),
            reference_name=args.reference or "reference swing")
        out["report"] = rep
        _log(report_mod.format_report(rep))

    if args.render:
        from golfaction_tpu.pipeline import video_io, visualize

        if isinstance(args.video, str) and not args.video.endswith(".npy"):
            frames, fps = video_io.load_video(args.video)
        else:
            frames, fps = np.load(args.video), 30.0
        overlay = visualize.render_analysis(frames, res)
        visualize.write_video(args.render, overlay, fps=fps)
        _log(f"wrote overlay video {args.render}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f)
        _log(f"wrote {args.out}")
        print(json.dumps({k: v for k, v in out.items() if k != "keypoints"}))
    else:
        print(json.dumps(out))


def cmd_compare(args):
    """Pro-vs-amateur comparison: aligned side-by-side video + report
    (reference README.md:50-52 "Compare 2 skeleton")."""
    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator, report as report_mod
    from golfaction_tpu.pipeline import video_io, visualize
    from golfaction_tpu.train import checkpoint

    cfg = cfg_mod.get_config(args.preset)
    if args.set:
        cfg = cfg_mod.apply_overrides(cfg, args.set)
    if args.checkpoint:
        cfg = checkpoint.config_for_artifacts(cfg, args.checkpoint)
    pipe = orchestrator.Pipeline(cfg)
    threshold = 0.5
    if args.checkpoint:
        pipe.params = checkpoint.load_pipeline_params(args.checkpoint,
                                                      like=pipe.params)
        thr = checkpoint.load_error_thresholds(args.checkpoint)
        if thr is not None:
            threshold = thr
            _log("using calibrated per-fault error thresholds")

    _log(f"analyzing reference {args.reference} ...")
    ref_res = pipe.analyze(args.reference)
    _log(f"analyzing {args.video} ...")
    res = pipe.analyze(args.video, reference=pipe.extract_skeleton(ref_res),
                       error_threshold=threshold)

    rep = report_mod.build_report(res, error_threshold=threshold,
                                  reference_name=args.reference)
    _log(report_mod.format_report(rep))

    if args.out_video:
        frames_a, _ = video_io.load_video(args.video)
        frames_b, _ = video_io.load_video(args.reference)
        L = int(res.alignment.path_length)
        panels = visualize.render_comparison(
            frames_a, np.asarray(res.keypoints),
            frames_b, np.asarray(ref_res.keypoints),
            np.asarray(res.alignment.path), L,
            max_pairs=args.max_pairs,
        )
        visualize.write_video(args.out_video, panels, fps=12)
        _log(f"wrote comparison video {args.out_video}")
        rep["comparison_video"] = args.out_video

    print(json.dumps(rep))


def cmd_stream(args):
    """Live / simulated-live analysis: consume a frame source incrementally,
    emit per-frame JSONL, report steady-state latency (reference
    README.md:11 live rig; SURVEY.md §1 L0)."""
    import time

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.pipeline import orchestrator, streaming, video_io
    from golfaction_tpu.train import checkpoint

    cfg = cfg_mod.get_config(args.preset)
    if args.set:
        cfg = cfg_mod.apply_overrides(cfg, args.set)
    if args.window not in cfg.length_buckets:
        cfg = __import__("dataclasses").replace(
            cfg, length_buckets=tuple(sorted({*cfg.length_buckets, args.window}))
        )
    if args.checkpoint:
        cfg = checkpoint.config_for_artifacts(cfg, args.checkpoint)
    pipe = orchestrator.Pipeline(cfg)
    if args.checkpoint:
        pipe.params = checkpoint.load_pipeline_params(
            args.checkpoint, like=pipe.params)
        _log(f"restored params from {args.checkpoint}")

    sa = streaming.StreamAnalyzer(pipe, window=args.window, hop=args.hop)
    push_t: dict[int, float] = {}
    latencies: list[tuple[int, float]] = []
    n_pushed = 0
    t0 = time.perf_counter()
    for frame in video_io.frame_source(args.source, realtime=args.realtime,
                                       max_frames=args.max_frames,
                                       npy_fps=args.fps):
        push_t[n_pushed] = time.perf_counter()
        n_pushed += 1
        for r in sa.push(frame):
            lat = time.perf_counter() - push_t.pop(r["frame_index"])
            latencies.append((r["frame_index"], lat))
            line = {"frame_index": r["frame_index"], "phase": r["phase"],
                    "latency_ms": round(lat * 1e3, 1)}
            if args.keypoints:
                line["keypoints"] = np.asarray(r["keypoints"]).round(2).tolist()
            print(json.dumps(line), flush=True)
    for r in sa.flush():
        lat = time.perf_counter() - push_t.pop(r["frame_index"], t0)
        latencies.append((r["frame_index"], lat))
        print(json.dumps({"frame_index": r["frame_index"], "phase": r["phase"],
                          "latency_ms": round(lat * 1e3, 1)}), flush=True)
    wall = time.perf_counter() - t0
    # Steady state excludes the first window (compile + backlog drain).
    steady = [l for i, l in latencies if i >= args.window]
    summary = {
        "frames": n_pushed,
        "throughput_fps": round(n_pushed / wall, 1),
        "startup_latency_s": round(latencies[0][1], 3) if latencies else None,
        "steady_latency_ms_mean": round(float(np.mean(steady)) * 1e3, 1)
        if steady else None,
        "steady_latency_ms_p95": round(float(np.percentile(steady, 95)) * 1e3, 1)
        if steady else None,
        "host_boxes": sa.host_boxes,
        "host_box_ms_per_hop": round(
            sa.host_box_s / max(sa.windows_processed, 1) * 1e3, 3),
    }
    _log(json.dumps(summary))


def cmd_train(args):
    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.train import checkpoint, loops

    tc = cfg_mod.TrainConfig(total_steps=args.steps, batch_size=args.batch_size,
                             checkpoint_dir=args.checkpoint_dir)
    trainers = {
        "pose": lambda: loops.train_pose(cfg_mod.PoseConfig(), tc),
        "gcn": lambda: loops.train_gcn(cfg_mod.GCNConfig(), tc),
        "align": lambda: loops.train_align(cfg_mod.AlignConfig(), tc),
        "error": lambda: loops.train_error(cfg_mod.ErrorConfig(), tc),
    }
    state, history = trainers[args.model]()
    for h in history:
        _log(json.dumps(h))
    path = checkpoint.save_params(
        f"{tc.checkpoint_dir}/{args.model}", state.params, step=state.step
    )
    print(json.dumps({"model": args.model, "steps": state.step,
                      "final": history[-1], "checkpoint": path}))


def cmd_bench(args):
    import bench

    sys.argv = ["bench.py"] + (args.bench_args or [])
    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="golfaction_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("analyze", help="analyze a swing video")
    a.add_argument("video")
    a.add_argument("--reference", help="pro swing video to align against")
    a.add_argument("--checkpoint", help="trained params directory")
    a.add_argument("--preset", default="full_pipeline")
    a.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config override, e.g. --set frame_batch=16 "
                        "--set pose.dtype=float32 (repeatable)")
    a.add_argument("--out", help="write full JSON result to file")
    a.add_argument("--render", metavar="OUT_MP4",
                   help="write an overlay video (skeleton + phase labels)")
    a.add_argument("--report", action="store_true",
                   help="include a coach-style swing report (phases, tempo, "
                        "faults, comparison)")
    a.set_defaults(fn=cmd_analyze)

    c = sub.add_parser("compare",
                       help="align two swings: report + side-by-side video")
    c.add_argument("video", help="the swing to review")
    c.add_argument("reference", help="the reference (pro) swing")
    c.add_argument("--checkpoint", help="trained params directory")
    c.add_argument("--preset", default="full_pipeline")
    c.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    c.add_argument("--out-video", help="write aligned side-by-side mp4")
    c.add_argument("--max-pairs", type=int, default=48,
                   help="max aligned frame pairs in the video")
    c.set_defaults(fn=cmd_compare)

    s = sub.add_parser("stream",
                       help="incremental analysis of a live/simulated frame "
                            "source; JSONL per frame + latency summary")
    s.add_argument("source",
                   help="video file, .npy array, or camera:N device")
    s.add_argument("--window", type=int, default=64)
    s.add_argument("--hop", type=int, default=16)
    s.add_argument("--realtime", action="store_true",
                   help="pace file decode at native fps (live simulation)")
    s.add_argument("--fps", type=float, default=30.0,
                   help="assumed capture fps for .npy sources under "
                        "--realtime (.npy has no rate metadata)")
    s.add_argument("--max-frames", type=int, default=None)
    s.add_argument("--keypoints", action="store_true",
                   help="include keypoints in each JSONL line")
    s.add_argument("--checkpoint", help="trained params directory")
    s.add_argument("--preset", default="full_pipeline")
    s.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    s.set_defaults(fn=cmd_stream)

    t = sub.add_parser("train", help="train one model on synthetic swings")
    t.add_argument("model", choices=["pose", "gcn", "align", "error"])
    t.add_argument("--steps", type=int, default=200)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--checkpoint-dir", default="/tmp/golfaction_ckpt")
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("bench", help="run the benchmark harness")
    b.add_argument("bench_args", nargs="*")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
