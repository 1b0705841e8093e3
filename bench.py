"""End-to-end benchmark harness.

Times the five BASELINE configs on the available accelerator and prints
JSON lines for the driver:
    {"metric": "end_to_end_fps_1080p", "value": N, "unit": "frames/sec/chip",
     "vs_baseline": N / 300.0, ...}

The headline metric is BASELINE config 5 (full pipeline: 1080p video ->
pose -> phases -> errors, pipelined on-device); the north-star target is
300 fps/chip (BASELINE.json).  Per-stage numbers go to stderr.

Robustness design (round 3 — round 2's driver run timed out with no JSON):
  * Supervisor/worker split: ``python bench.py`` runs a supervisor that
    re-execs itself with ``--worker``, streams the child's output, keeps the
    LAST JSON line seen, and — on child crash, hang, or budget expiry —
    prints that JSON itself and exits 0.  A hung tunnel call or a mid-bench
    RESOURCE_EXHAUSTED can no longer lose the measurement.
  * The worker prints the headline JSON the moment the config-5 number
    exists and RE-prints an enriched JSON after each later section; heavy
    sections (e2e decode path, per-stage breakdowns) are wall-clock gated
    and individually try/except-guarded.
  * Upfront host->device traffic is bounded: the dev tunnel moves ~1-12
    MB/s, so the headline clips are tiled on-device from a few real rendered
    frames (compute time on TPU is shape-, not value-, dependent; disclosed
    in the log).  ``--h2d-frames 0`` restores full-clip transfer.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

_START = time.time()


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit(payload):
    """Print a (possibly partial) headline JSON line NOW and flush.

    Called repeatedly as sections complete; the driver/supervisor keeps the
    last line, so each emission strictly enriches the previous one.
    """
    print(json.dumps(payload), flush=True)


# ---- pre-headline stall instrumentation (round 5) -------------------------
# Round 4's driver record is empty because the worker logged the device line
# and then NOTHING for 510 s (BENCH_r04.json: rc=247, parsed=null) — the
# whole restore/device_put/render/H2D/warmup path between device detection
# and the first _emit was a blind region with no heartbeat, no per-step
# logs, and no watchdog.  Three mechanisms close it (VERDICT r4 task 1):
#   * `_status_init` emits a minimal status JSON the moment the device is
#     known, so the supervisor's last-JSON net always has SOMETHING parsed.
#   * `_progress(step)` timestamps every pre-headline step to stderr and
#     refreshes the status JSON, so a hang is localizable from the tail.
#   * `_Watchdog` watches the time since the last progress mark; on expiry
#     it emits {"status": "tpu-tunnel-stalled", "stalled_step": ...} and
#     exits nonzero — symmetric with the supervisor's existing
#     `tpu-tunnel-unreachable` path (which only covers refused connections,
#     not hangs).
_PROG_LOCK = threading.Lock()
_PROG = {"step": "init", "t": _START}
_STATUS = None  # the running (possibly headline-less) JSON payload


def _status_init(device_kind):
    global _STATUS
    _STATUS = {
        "metric": "end_to_end_fps_1080p",
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "status": "starting",
        "device": device_kind,
    }
    _emit(_STATUS)


def _progress(step, emit_status=True):
    """Mark a pre-headline step: stderr timestamp + status-JSON refresh."""
    with _PROG_LOCK:
        _PROG["step"] = step
        _PROG["t"] = time.time()
    _log(f"[+{time.time() - _START:.1f}s] {step}")
    if emit_status and _STATUS is not None and _STATUS.get("value") is None:
        _STATUS["status"] = step
        _STATUS["elapsed_s"] = round(time.time() - _START, 1)
        _emit(_STATUS)


class _Watchdog(threading.Thread):
    """Emit a diagnostic JSON and exit if no progress mark lands for
    `timeout` seconds (a hung tunnel call can stall forever inside jax)."""

    def __init__(self, timeout):
        super().__init__(daemon=True)
        self.timeout = timeout

    def run(self):
        while True:
            time.sleep(5.0)
            with _PROG_LOCK:
                step, t = _PROG["step"], _PROG["t"]
            stalled = time.time() - t
            if stalled > self.timeout:
                payload = dict(_STATUS or {
                    "metric": "end_to_end_fps_1080p", "value": None,
                    "unit": "frames/sec/chip", "vs_baseline": None,
                })
                payload.update({
                    "status": "tpu-tunnel-stalled",
                    "stalled_step": step,
                    "stalled_after_s": round(stalled, 1),
                    "elapsed_s": round(time.time() - _START, 1),
                })
                _emit(payload)
                _log(f"[watchdog] no progress for {stalled:.0f}s inside "
                     f"step '{step}' — aborting worker")
                os._exit(3)


def sol_check(n=4096, dtype="bfloat16"):
    """Speed-of-light probe: slope-timed bf16 n^3 matmul.

    Separates "the chip is slow" from "the program/tunnel is slow" — on
    2026-08-19 this probe clocked 160 TF/s (81% of v5e peak) in the same
    hour a fixed-cost-polluted window timing deflated the pipeline 1.47x
    (BASELINE.md round-4 decomposition; previously /tmp/sol_check.py,
    committed per VERDICT r4 task 7).  Returns effective TFLOP/s.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.ones((n, n), dtype=dtype)
    f = jax.jit(lambda a: a @ a)
    dt = _time_fn(f, x, warmup=2, iters=3, min_time=0.5)
    return 2.0 * n**3 / dt / 1e12


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


def _time_fn_repeats(fn, *args, warmup=2, iters=5, min_time=1.0, repeats=3,
                     name=None):
    """List of `repeats` independent steady-state per-call times, each a
    TWO-POINT SLOPE fit: slope = (T(n2) - T(n1)) / (n2 - n1) where T(n) is
    the wall time of n back-to-back calls closed by a completion-forcing
    fetch.

    The subtraction removes the fixed per-measurement-window cost — over
    the tunneled TPU the fence round-trip + dispatch ramp measured 29-330
    ms per window, which at short windows deflated identical programs by
    up to 2.2x between days (the r3->r4 "regression" decomposition in
    BASELINE.md).  The slope is the program's actual per-call device time;
    repeats make environment noise visible in the record (VERDICT r3 weak
    #1).  The measured fixed cost is kept in `_time_fn_repeats.last_fixed_s`
    for reporting.
    """
    for i in range(warmup):
        if name:
            _progress(f"{name}: warmup {i + 1}/{warmup} (compile+fence)")
        _fence(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _fence(out)
        return time.perf_counter() - t0

    if name:
        _progress(f"{name}: sizing window")
    dt = run(iters) / iters
    # Size the windows: n1 ~ min_time/4 of calls, n2 = 5*n1 (capped).
    n1 = max(iters, min(int(min_time / 4.0 / max(dt, 1e-7)) + 1, 400))
    n2 = min(5 * n1, 2000)
    slopes, fixed = [], []
    for r in range(repeats):
        if name:
            _progress(f"{name}: slope window {r + 1}/{repeats} "
                      f"(n1={n1}, n2={n2})", emit_status=False)
        t1, t2 = run(n1), run(n2)
        s = max((t2 - t1) / (n2 - n1), 1e-9)
        slopes.append(s)
        fixed.append(max(t1 - n1 * s, 0.0))
    _time_fn_repeats.last_fixed_s = sorted(fixed)[len(fixed) // 2]
    return slopes


def _time_fn(fn, *args, warmup=2, iters=5, min_time=1.0):
    """Median steady-state wall time per call over 3 slope measurements."""
    dts = _time_fn_repeats(fn, *args, warmup=warmup, iters=iters,
                           min_time=min_time)
    return sorted(dts)[len(dts) // 2]


def _program_flops(fn, *args):
    """FLOP count of the jitted program via XLA cost analysis (None if the
    backend doesn't expose it)."""
    import jax

    try:
        comp = jax.jit(fn).lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as e:  # pragma: no cover - backend specific
        _log(f"  cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


_PEAK_TFLOPS = {
    # bf16 dense peak per chip.
    "TPU v5 lite": 197.0,   # v5e
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
}


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


def _remaining(budget):
    return budget - (time.time() - _START)


_PARAMS_CACHE = {}  # device -> params pytree, shared across pipelines


def _make_pipeline(orchestrator, cfg, dev, seed=0):
    """Pipeline with params restored from the repo's trained checkpoints.

    Flax random-init is hundreds of tiny ops that each jit-compile; on the
    single-core bench host with a stale AOT cache this measured 462s *per
    pipeline* (r3b log) — nearly the whole budget.  Orbax restore of the
    trained artifacts is pure host IO + ONE device_put, and makes the bench
    measure the shipped (trained) pipeline rather than a random-init one.
    The compute graph and therefore the fps are identical either way.
    """
    import jax

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    _progress("pipeline: config_for_artifacts")
    try:
        from golfaction_tpu.train import checkpoint as _ck

        cfg = _ck.config_for_artifacts(cfg, art)
    except Exception:
        pass
    if dev in _PARAMS_CACHE:
        return orchestrator.Pipeline(cfg, params=_PARAMS_CACHE[dev])

    t0 = time.time()
    try:
        from golfaction_tpu.train import checkpoint as ckpt_mod

        # Restore onto host CPU (fast local IO), then ONE device_put of the
        # whole tree — per-leaf transfers over the tunnel would be slow.
        try:
            cpu0 = jax.local_devices(backend="cpu")[0]
        except Exception:
            cpu0 = None
        params = {}
        for name in ("pose", "gcn", "align", "error", "refine"):
            _progress(f"pipeline: restore {name} checkpoint (host)",
                      emit_status=False)
            step_dir = ckpt_mod.latest_step_dir(
                os.path.join(art, "params", name))
            npz = os.path.join(art, "params", f"{name}.npz")
            if step_dir is not None:
                params[name] = ckpt_mod.restore_params(step_dir, device=cpu0)
            elif os.path.exists(npz):   # committed compact checkpoint
                params[name] = ckpt_mod.restore_params_npz(npz)
            elif name == "refine":      # optional second stage — see
                continue                # models/refine.py
            else:
                raise FileNotFoundError(f"no checkpoint for {name}")
        _progress("pipeline: device_put params (tunnel H2D)")
        params = jax.device_put(params, dev)
        _fence(params["pose"])
        _progress("pipeline: params fenced on device")
        _log(f"trained params restored + transferred: {time.time() - t0:.1f}s")
        _PARAMS_CACHE[dev] = params
        return orchestrator.Pipeline(cfg, params=params)
    except Exception as e:
        _log(f"artifact restore unavailable ({type(e).__name__}: {e}); "
             f"falling back to CPU init")

    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except Exception:
        return orchestrator.Pipeline(cfg, seed=seed)
    t0 = time.time()
    with jax.default_device(cpu0):
        pipe = orchestrator.Pipeline(cfg, seed=seed)
        _fence(pipe.params["pose"])
    pipe.params = jax.device_put(pipe.params, dev)
    _fence(pipe.params["pose"])
    _PARAMS_CACHE[dev] = pipe.params
    _log(f"pipeline init (CPU) + param transfer: {time.time() - t0:.1f}s")
    return pipe


def worker_main(args):
    global _STATUS
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

    budget = args.budget_seconds

    _progress("jax.devices() (tunnel init)", emit_status=False)
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "?")
    _log(f"device: {dev.platform} {kind}  (budget {budget:.0f}s)")
    # Heartbeat JSON the moment the device is known: the supervisor's
    # last-JSON net must never again be empty (BENCH_r04.json lesson).
    _status_init(f"{dev.platform} {kind}")
    wd = _Watchdog(args.stall_timeout if not args.cpu
                   else max(args.stall_timeout, 600))
    wd.start()

    sol_n = 1024 if args.cpu else 4096
    if args.sol_only:
        _progress("sol-check (bf16 matmul probe)")
        tf = sol_check(sol_n)
        _STATUS.update({"status": "sol-check-done", "sol_tflops": round(tf, 1)})
        peak = _PEAK_TFLOPS.get(kind)
        if peak:
            _STATUS["sol_vs_peak"] = round(tf / peak, 3)
        _log(f"[sol-check] bf16 {sol_n}^3 matmul: {tf:.1f} TF/s"
             + (f" = {tf / peak:.1%} of {kind} peak" if peak else ""))
        _emit(_STATUS)
        return

    T = args.clip_frames
    hw = (args.height, args.width)
    cfg = cfg_mod.get_config("full_pipeline")
    cfg = dataclasses.replace(cfg, length_buckets=(T,), video_hw=hw)
    pipe = _make_pipeline(orchestrator, cfg, dev)

    # --- source frames for the headline device-program measurement ---
    # Only `h2d_frames` real rendered frames per clip cross the tunnel; the
    # clip is tiled to T on-device (TPU stage time is shape-dependent, not
    # value-dependent, so the fps is identical to a full transfer — which
    # `--h2d-frames 0` restores for verification).
    nsrc = args.h2d_frames if args.h2d_frames > 0 else T
    nsrc = min(nsrc, T)
    cache = f"/tmp/golfaction_bench_src_{nsrc}x{T}_{hw[0]}x{hw[1]}.npz"
    if os.path.exists(cache):
        _progress("source frames: cache load")
        _log(f"loading cached source frames from {cache}")
        z = np.load(cache)
        src_frames, src_boxes = z["frames"], z["boxes"]
    else:
        _progress("source frames: render")
        # Reuse the round-1/2 full-clip cache when present to skip rendering.
        old = f"/tmp/golfaction_bench_clips_2x64_{hw[0]}x{hw[1]}.npz"
        if os.path.exists(old) and T == 64:
            _log(f"slicing source frames from {old}")
            z = np.load(old)
            src_frames = z["frames"][0][:nsrc]
            src_boxes = z["boxes"][0][:nsrc]
        else:
            _log(f"rendering {nsrc} source frames at {hw[0]}p ...")
            s = data_mod.make_swing_batch(
                1, max(nsrc, 8), seed=0, image_hw=hw, render=True
            )[0]
            src_frames = s.frames[:nsrc]
            src_boxes = s.boxes[:nsrc]
        try:
            np.savez(cache, frames=src_frames, boxes=src_boxes)
        except OSError:
            pass

    _progress("H2D: source frames (tunnel)")
    t0 = time.time()
    src_dev = jax.device_put(jnp.asarray(src_frames))
    _fence(src_dev[0, 0, :2].astype(jnp.float32))
    mb = src_frames.nbytes / 2**20
    h2d_rate = mb / max(time.time() - t0, 1e-9)  # MB/s, today's tunnel
    _log(f"H2D {mb:.0f} MB in {time.time() - t0:.1f}s ({h2d_rate:.1f} MB/s)")

    reps = (T + nsrc - 1) // nsrc
    clip0 = jnp.tile(src_dev, (reps, 1, 1, 1))[:T]
    box0 = jnp.tile(jnp.asarray(src_boxes), (reps, 1))[:T]
    frames_dev = jnp.stack([clip0, jnp.flip(clip0, axis=0)])
    boxes_dev = jnp.stack([box0, jnp.flip(box0, axis=0)])
    if args.clips != 2:
        idx = jnp.arange(args.clips) % 2
        frames_dev = frames_dev[idx]
        boxes_dev = boxes_dev[idx]
    valid = jnp.ones((T,), bool)
    valid_b = jnp.ones((args.clips, T), bool)

    # --- headline: config 5, full pipeline fps (frames / wall second) ---
    # All clips run as ONE batched device program (vmapped core), the same
    # path analyze_batch uses.
    def run_all():
        return pipe._core_batch(pipe.params, frames_dev, boxes_dev, valid_b)

    dts = _time_fn_repeats(run_all, warmup=2, iters=args.iters, repeats=4,
                           name="config 5 headline")
    dt = sorted(dts)[len(dts) // 2]          # median for the headline
    total_frames = args.clips * T
    fps = total_frames / dt
    fps_best = total_frames / min(dts)
    _log(f"[config 5] full pipeline (device program): {fps:,.1f} fps median"
         f" / {fps_best:,.1f} fps best ({dt*1e3:.1f} ms for {total_frames} "
         f"frames; repeats "
         + "/".join(f"{total_frames/d:,.0f}" for d in dts) + ")")

    result = {
        "metric": "end_to_end_fps_1080p",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 300.0, 3),
        # Both throughput views (VERDICT r1 item 3): `value`/`device_fps` is
        # the on-device pipeline program; `e2e_fps` additionally includes
        # host mp4 decode, H2D transfer, and the result fetch.  device_fps
        # is the MEDIAN of `device_fps_repeats` independent measurements;
        # device_fps_best is the max (min-time) — a best/median gap flags
        # a noisy chip environment rather than a program change.
        "device_fps": round(fps, 1),
        "device_fps_best": round(fps_best, 1),
        "device_fps_repeats": [round(total_frames / d, 1) for d in dts],
        "fence_overhead_ms": round(
            getattr(_time_fn_repeats, "last_fixed_s", 0.0) * 1e3, 1),
        "e2e_fps": None,
        "e2e_vs_baseline": None,
    }
    _STATUS = result  # watchdog diagnostics now carry the headline too
    _emit(result)  # the driver gets the headline NOW, whatever happens later

    # --- MFU (VERDICT r2 item 7): FLOPs of the compiled headline program ---
    flops = _program_flops(
        lambda p, f, b, v: pipe._core_batch(p, f, b, v),
        pipe.params, frames_dev, boxes_dev, valid_b,
    )
    if flops:
        eff_tflops = flops / dt / 1e12
        peak = _PEAK_TFLOPS.get(kind)
        result["effective_tflops"] = round(eff_tflops, 1)
        if peak:
            result["mfu_vs_peak"] = round(eff_tflops / peak, 3)
        _log(f"[config 5] {flops/1e9:.1f} GFLOP/call -> "
             f"{eff_tflops:.1f} TFLOP/s effective"
             + (f" = {eff_tflops / peak:.1%} of {kind} bf16 peak" if peak else ""))
        _emit(result)

    # Free the headline batch before the e2e section: a 16 GB chip cannot
    # hold the 2x64x1080p headline clips AND the clip_batch x 128 x 1080p
    # e2e warmup batches at once (r3d run OOMed here).  Keep one clip for
    # the per-stage breakdowns.
    f0, b0 = frames_dev[0], boxes_dev[0]
    _fence(f0[0, :2])
    del run_all, frames_dev, boxes_dev, clip0, box0, src_dev

    # --- honest end-to-end: mp4 on disk -> decode -> H2D -> compute -> host
    # fetch, through analyze_batch over mixed-length clips (two buckets).
    # This is the "video in" contract number; the device-program fps above is
    # chip throughput.  The gap between them is host-side OpenCV 1080p decode
    # (single-core box) and the dev tunnel's H2D bandwidth.
    # Auto-size the e2e clip count to today's tunnel: every raw padded
    # frame crosses the link, so at the measured `h2d_rate` only so many
    # clips fit the remaining budget.  (On a co-located TPU host this is a
    # non-issue — PCIe does 10+ GB/s.)
    fb_mb = hw[0] * hw[1] * 3 / 2**20
    all_lengths = [40 + (i * 29) % 89 for i in range(max(args.e2e_clips, 0))]
    bucket = lambda t: 64 if t <= 64 else 128  # noqa: E731
    vid_dir = "/tmp/golfaction_e2e_videos"
    all_paths = [
        os.path.join(vid_dir, f"clip_{i:02d}_{T_}f_{hw[0]}x{hw[1]}.mp4")
        for i, T_ in enumerate(all_lengths)
    ]

    def _e2e_estimate(n):
        # analyze_batch transfers each real clip's bucket-padded frames
        # exactly once (chunk padding stays on-device) and warmup is
        # transfer-free, so H2D = padded frames x frame MB.  Plus one-time
        # mp4 rendering for cache-miss clips (~0.3 s/frame), OpenCV decode
        # (~0.1 s/frame), and compile/fetch slack.
        frames_padded = sum(bucket(t) for t in all_lengths[:n])
        render = sum(
            all_lengths[i] for i in range(n)
            if not os.path.exists(all_paths[i])
        )
        return (frames_padded * fb_mb / max(h2d_rate, 0.1)) * 1.2 \
            + 0.3 * render + 0.1 * sum(all_lengths[:n]) + 45.0

    n_e2e = 0
    for n in range(args.e2e_clips, 1, -1):
        if _e2e_estimate(n) < _remaining(budget) - 30.0:
            n_e2e = n
            break

    if n_e2e >= 2:
        e2e_pipe = None
        try:
            _log(f"[config 5, e2e] running with {n_e2e} clips "
                 f"(est {_e2e_estimate(n_e2e):.0f}s at {h2d_rate:.1f} MB/s, "
                 f"{_remaining(budget):.0f}s left)")
            e2e_cfg = dataclasses.replace(cfg, length_buckets=(64, 128),
                                          video_hw=hw)
            e2e_pipe = _make_pipeline(orchestrator, e2e_cfg, dev)
            paths, lengths = _make_e2e_videos(
                n_e2e, hw, vid_dir
            )
            # Warmup compiles both bucket programs + the in-place batch
            # assembly, from device-resident zeros: no frames cross the
            # tunnel (compute graphs are shape-, not value-, dependent).
            # Buffers are freed per bucket — both batches at once OOM.
            cb = e2e_cfg.clip_batch

            def _warm_bucket(tb):
                _progress(f"e2e: warm bucket {tb} (compile)",
                          emit_status=False)
                fz = jnp.zeros((tb, hw[0], hw[1], 3), jnp.uint8)
                bz = jnp.broadcast_to(
                    jnp.asarray(
                        [hw[1] / 2, hw[0] / 2, hw[1] / 2, hw[0] / 2],
                        jnp.float32,
                    ),
                    (tb, 4),
                )
                fzb = orchestrator.assemble_clip_batch([fz], cb)
                bzb = orchestrator.assemble_clip_batch([bz], cb)
                del fz
                vz = jnp.ones((cb, tb), bool)
                _fence(
                    e2e_pipe._core_batch(e2e_pipe.params, fzb, bzb, vz)[
                        "keypoints"
                    ]
                )
                _log(f"  warm bucket {tb}: done ({_remaining(budget):.0f}s "
                     f"left)")

            for tb in (64, 128):
                _warm_bucket(tb)

            if _remaining(budget) > 30.0:
                # Host decode of all clips on a 1-core box is legitimately
                # minutes with no tunnel activity; don't brand it a stall.
                wd.timeout = max(wd.timeout, 600)
                _progress("e2e: analyze_batch (decode+dispatch+fetch)",
                          emit_status=False)
                t0 = time.perf_counter()
                results = e2e_pipe.analyze_batch(paths)
                for r in results:
                    _fence(r.keypoints)  # materialize: true completion fence
                e2e_dt = time.perf_counter() - t0
                n_real = sum(lengths)
                e2e_fps = n_real / e2e_dt
                _log(f"[config 5, e2e] mp4->decode->analyze_batch->fetch: "
                     f"{e2e_fps:,.1f} fps ({e2e_dt:.2f} s for {n_real} "
                     f"frames, {len(paths)} mixed-length clips)")
                result["e2e_fps"] = round(e2e_fps, 1)
                result["e2e_vs_baseline"] = round(e2e_fps / 300.0, 3)
                result["e2e_clips"] = len(paths)
                st = getattr(e2e_pipe, "last_batch_stats", None)
                if st:
                    # Overlap proof (VERDICT r3 task 3): host decode seconds
                    # hidden behind device compute + transfer.
                    hidden = max(0.0, st["decode_s_total"]
                                 - st["first_dispatch_s"])
                    _log(f"[config 5, e2e] host decode {st['decode_s_total']:.1f}s "
                         f"({st['decode_workers']} threads) inside "
                         f"{st['wall_s']:.1f}s wall; first dispatch at "
                         f"{st['first_dispatch_s']:.1f}s -> "
                         f"~{hidden:.1f}s decode overlapped")
                    result["e2e_decode_s"] = round(st["decode_s_total"], 1)
                    result["e2e_first_dispatch_s"] = round(
                        st["first_dispatch_s"], 1)
                _emit(result)
                del results
        except Exception as e:
            _log(f"[config 5, e2e] FAILED (continuing): "
                 f"{type(e).__name__}: {e}")
        finally:
            wd.timeout = args.stall_timeout
            # Free e2e device buffers on every path, else later stages OOM.
            e2e_pipe = None  # noqa: F841
    else:
        _log(f"[config 5, e2e] skipped: even 2 clips need "
             f"~{_e2e_estimate(2):.0f}s at {h2d_rate:.1f} MB/s tunnel H2D "
             f"with {_remaining(budget):.0f}s left"
             if args.e2e_clips >= 2 else "[config 5, e2e] disabled")

    # --- per-stage breakdowns (stderr only), each budget-gated + guarded ---
    def stage(name, fn, min_left=45):
        if _remaining(budget) < min_left:
            _log(f"[{name}] skipped (budget)")
            return
        try:
            fn()
        except Exception as e:
            _log(f"[{name}] FAILED (continuing): {type(e).__name__}: {e}")

    def _cfg2():
        pose_dt = _time_fn(lambda: pipe._pose_only(pipe.params, f0, b0),
                           warmup=1, iters=args.iters)
        _log(f"[config 2] preprocess+pose+decode: {T/pose_dt:,.1f} fps")
        result["pose_fps"] = round(T / pose_dt, 1)

    stage("config 2", _cfg2)

    from golfaction_tpu.models import gcn as gcn_mod

    try:
        kpts = pipe._pose_only(pipe.params, f0, b0)
    except Exception as e:  # keep later stages alive (e.g. post-e2e OOM)
        _log(f"[pose-only for stage breakdowns] FAILED: {type(e).__name__}: {e}")
        kpts = jnp.zeros((T, 17, 3), jnp.float32)

    def _cfg3():
        sk = gcn_mod.normalize_skeleton(kpts[None], valid[None])
        gcn_fwd = jax.jit(lambda p, s, v: pipe.gcn_model.apply(p, s, v))
        gcn_dt = _time_fn(lambda: gcn_fwd(pipe.params["gcn"], sk, valid[None]),
                          warmup=1, iters=args.iters)
        _log(f"[config 3] GCN segmentation: {T/gcn_dt:,.1f} fps")
        result["gcn_fps"] = round(T / gcn_dt, 1)

    stage("config 3", _cfg3)

    def _cfg4():
        align_dt = _time_fn(
            lambda: pipe._align(pipe.params, kpts, valid, kpts, valid),
            warmup=1, iters=args.iters,
        )
        _log(f"[config 4] soft-DTW alignment ({T}x{T}): "
             f"{align_dt*1e3:.2f} ms/pair")

        # Config 4 in its design regime: B pairs per program (the wavefront
        # is sequential in T but fully batched; the win shows at B>=64).
        B4, T4 = 64, 128
        reps4 = (T4 + kpts.shape[0] - 1) // kpts.shape[0]
        kb = jnp.tile(kpts[None], (B4, reps4, 1, 1))[:, :T4]
        vb = jnp.ones((B4, T4), bool)
        batch_align = jax.jit(pipe._align_batch_fn)
        align_b_dt = _time_fn(
            lambda: batch_align(pipe.params, kb, vb, kb[0], vb[0]),
            warmup=1, iters=args.iters,
        )
        _log(f"[config 4, batch] soft-DTW B={B4} pairs {T4}x{T4}: "
             f"{B4/align_b_dt:,.1f} pairs/s ({align_b_dt*1e3:.2f} ms/batch)")
        result["softdtw_pairs_per_s"] = round(B4 / align_b_dt, 1)

    stage("config 4", _cfg4)

    def _cfg1():
        # config 1: single-image pose (CPU-runnable check happens in CI).
        crop1 = jnp.zeros((1, *cfg.pose.input_hw, 3), jnp.float32)
        pose1 = jax.jit(lambda p, x: pipe.pose_model.apply(p, x))
        one_dt = _time_fn(lambda: pose1(pipe.params["pose"], crop1),
                          warmup=1, iters=args.iters)
        _log(f"[config 1] single-image pose forward: {one_dt*1e3:.2f} ms")

    stage("config 1", _cfg1)

    if args.sol_check:
        def _sol():
            # Chip-health evidence in every record: a slow headline with a
            # healthy sol number means tunnel/program, not chip.
            tf = sol_check(sol_n)
            result["sol_tflops"] = round(tf, 1)
            peak = _PEAK_TFLOPS.get(kind)
            if peak:
                result["sol_vs_peak"] = round(tf / peak, 3)
            _log(f"[sol-check] bf16 {sol_n}^3 matmul: {tf:.1f} TF/s"
                 + (f" = {tf / peak:.1%} of {kind} peak" if peak else ""))

        stage("sol-check", _sol, min_left=40)

    if args.impl_compare:
        def _impl():
            from golfaction_tpu.ops import heatmap as hm_mod
            from golfaction_tpu.ops import preprocess as pp_mod
            from golfaction_tpu.ops import softdtw as sd_mod
            from golfaction_tpu.ops.pallas import decode_kernel as dk
            from golfaction_tpu.ops.pallas import preprocess_kernel as ppk
            from golfaction_tpu.ops.pallas import softdtw_kernel as sdk

            rng = np.random.default_rng(0)
            fr8 = f0[:8]                   # 8 frames of clip 0
            b8 = b0[:8]
            dt_x = _time_fn(jax.jit(
                lambda: pp_mod.crop_resize_normalize(fr8, b8, cfg.pose.input_hw)))
            dt_p = _time_fn(jax.jit(
                lambda: ppk.crop_resize_normalize_pallas(fr8, b8, cfg.pose.input_hw)))
            _log(f"[impl] preprocess 8x{hw[0]}p:  XLA {dt_x*1e3:.3f} ms | "
                 f"Pallas {dt_p*1e3:.3f} ms")

            hms = jnp.asarray(rng.normal(size=(256, 17, 64, 48)), jnp.float32)
            dt_x = _time_fn(jax.jit(lambda: hm_mod.decode_heatmaps(hms, "udp")))
            dt_p = _time_fn(jax.jit(lambda: dk.decode_heatmaps_pallas(hms)))
            _log(f"[impl] decode 256x17:       XLA {dt_x*1e3:.3f} ms | "
                 f"Pallas {dt_p*1e3:.3f} ms")

            emb = jnp.asarray(rng.normal(size=(16, 128, 16)), jnp.float32)
            Dm = sd_mod.pairwise_sqdist(emb, emb)
            dt_x = _time_fn(jax.jit(lambda: sd_mod.softdtw_cost_batch(Dm, 0.1)))
            dt_p = _time_fn(jax.jit(lambda: sdk.softdtw_cost_pallas(Dm, 0.1)))
            _log(f"[impl] softdtw 16x128x128:  scan {dt_x*1e3:.3f} ms | "
                 f"Pallas {dt_p*1e3:.3f} ms")

        stage("impl-compare", _impl, min_left=90)

    result["elapsed_s"] = round(time.time() - _START, 1)
    _emit(result)


def _add_worker_args(parser):
    parser.add_argument("--clip-frames", type=int, default=64)
    parser.add_argument("--clips", type=int, default=2)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--h2d-frames", type=int, default=8,
                        help="real frames transferred per headline clip; "
                             "tiled to clip length on-device (0 = transfer "
                             "full clips)")
    parser.add_argument("--e2e-clips", type=int, default=8,
                        help="max clips for the decode-included e2e "
                             "measurement; auto-shrunk to the measured "
                             "tunnel H2D rate (0 disables)")
    parser.add_argument("--budget-seconds", type=float,
                        default=float(os.environ.get(
                            "GOLFACTION_BENCH_BUDGET", 480)),
                        help="soft wall-clock budget; optional sections are "
                             "skipped when it runs low, and the supervisor "
                             "hard-kills at this point + grace")
    parser.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    parser.add_argument("--impl-compare", action="store_true",
                        help="also time XLA vs Pallas for each kernel stage")
    parser.add_argument("--stall-timeout", type=float, default=240.0,
                        help="worker watchdog: seconds without a progress "
                             "mark before emitting a tpu-tunnel-stalled "
                             "diagnostic JSON and aborting")
    parser.add_argument("--sol-check", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="budget-gated speed-of-light probe (bf16 "
                             "matmul) recorded as sol_tflops")
    parser.add_argument("--sol-only", action="store_true",
                        help="run ONLY the speed-of-light probe and exit")


def supervise(args, extra_argv):
    """Run the worker as a child; guarantee a JSON line lands on stdout.

    The child's stdout JSON lines are tracked (last one wins) and every
    other line is forwarded to stderr.  On normal exit the last JSON is
    re-printed; on crash/hang/budget-kill the last JSON seen still gets
    printed and the supervisor exits 0 — a partial measurement must never
    be lost to a late failure (round-2 lesson: rc=124, parsed=null).
    """
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"] + extra_argv
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None,
                            text=True, bufsize=1)
    q: "queue.Queue" = queue.Queue()

    def reader():
        for line in proc.stdout:
            q.put(line)
        q.put(None)

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    last_json = None
    deadline = _START + args.budget_seconds + 30.0  # grace for worker's own gating
    eof = False
    while not eof:
        timeout = deadline - time.time()
        if timeout <= 0:
            _log(f"[supervisor] budget exhausted after "
                 f"{time.time() - _START:.0f}s — killing worker")
            proc.kill()
            break
        try:
            line = q.get(timeout=min(timeout, 5.0))
        except queue.Empty:
            continue
        if line is None:
            eof = True
            continue
        line = line.rstrip("\n")
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                if "metric" in parsed:
                    last_json = parsed
                    continue
            except json.JSONDecodeError:
                pass
        _log(line)
    # Drain anything the reader got before the kill.
    while True:
        try:
            line = q.get_nowait()
        except queue.Empty:
            break
        if isinstance(line, str) and line.startswith("{"):
            try:
                parsed = json.loads(line)
                if "metric" in parsed:
                    last_json = parsed
            except json.JSONDecodeError:
                pass
    try:
        proc.wait(timeout=15)
    except subprocess.TimeoutExpired:
        proc.kill()

    if last_json is not None:
        print(json.dumps(last_json), flush=True)
        return 0
    if os.environ.get("JAX_PLATFORMS", "") == "axon" and not _axon_tunnel_up():
        # Machine-readable infra failure: better for the record than
        # silence.  No fabricated numbers — value stays null.
        _log("[supervisor] axon tunnel unreachable — reporting infra error")
        print(json.dumps({
            "metric": "end_to_end_fps_1080p", "value": None,
            "unit": "frames/sec/chip", "vs_baseline": None,
            "error": "tpu-tunnel-unreachable",
        }), flush=True)
        return 0
    _log("[supervisor] worker produced no JSON")
    return proc.returncode or 1


def _axon_tunnel_up(port: int = 8082) -> bool:
    """True when the axon leader endpoint accepts connections (the tunnel
    outages of 2026-08-18 present as a connection-refused :8082 and a
    worker that hangs inside jax device init forever)."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", port), timeout=3):
            return True
    except OSError:
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", action="store_true",
                        help="run measurements in-process (no supervisor)")
    _add_worker_args(parser)
    args = parser.parse_args()

    if args.worker:
        worker_main(args)
        return 0
    extra = [a for a in sys.argv[1:] if a != "--worker"]
    return supervise(args, extra)


if __name__ == "__main__":
    sys.exit(main())
