"""Host-side video decode and person-box estimation.

The L0 layer of the pipeline (SURVEY.md §1): decode swing clips on the host
(OpenCV), estimate a per-frame person box, and hand device-ready arrays to
the orchestrator.  This stage is I/O-bound and overlaps with device compute
(the orchestrator dispatches asynchronously), so it stays in Python/NumPy.

The reference rig (reference README.md:11) used a fixed camera pointed at the
golfer; person localization there came from a detector.  Shipping a full
detector is out of scope for the swing-analysis spec, so boxes come from, in
priority order:
  1. caller-provided boxes,
  2. motion-energy estimation (frame differencing — robust for a static
     camera watching one moving golfer),
  3. full-frame fallback.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import numpy as np

try:  # OpenCV is available in this image; gate anyway for portability.
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def load_video(path: str, max_frames: Optional[int] = None) -> tuple[np.ndarray, float]:
    """Decode a video file -> (frames [T, H, W, 3] uint8 RGB, fps)."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV unavailable; pass frames arrays directly")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def iter_clip_batches(
    frames: np.ndarray, batch: int
) -> Iterator[np.ndarray]:
    """Yield frame micro-batches for pipelined device feeding."""
    for i in range(0, len(frames), batch):
        yield frames[i : i + batch]


def estimate_camera_shifts(
    frames: np.ndarray, downsample: int = 4, tiles: int = 3
) -> np.ndarray:
    """Per-frame global camera translation [T, 2] (dx, dy) vs frame 0.

    Robust host-side stabilization for motion-energy boxes on a shaking
    camera: consecutive downsampled grayscale frames are split into a
    tiles x tiles grid, each tile's translation is estimated by phase
    correlation, and the MEDIAN over tiles is taken — the moving golfer
    only occupies a few tiles, so their motion cannot bias the global
    estimate (a single whole-frame correlation provably does get dragged
    toward the dominant bright mover).  Near-zero for a tripod clip.
    """
    if not _HAS_CV2:
        return np.zeros((len(frames), 2), np.float32)
    # Keep >= ~32 px per tile in the short dimension: tiny tiles make the
    # correlation peak meaningless.
    downsample = max(1, min(downsample, min(frames.shape[1:3]) // (32 * tiles)))
    g = frames[:, ::downsample, ::downsample].mean(axis=-1).astype(np.float32)
    T, H, W = g.shape
    th, tw = H // tiles, W // tiles
    if th < 8 or tw < 8:
        tiles, th, tw = 1, H, W
    win = cv2.createHanningWindow((tw, th), cv2.CV_32F)
    shifts = np.zeros((T, 2), np.float32)
    # Correlate every frame DIRECTLY against frame 0 — consecutive-pair
    # deltas integrate sub-pixel bias (~0.5 px/pair under lighting flicker)
    # into tens of pixels of phantom drift on a static clip.
    for t in range(1, T):
        est = []
        for i in range(tiles):
            for j in range(tiles):
                a = g[0, i * th:(i + 1) * th, j * tw:(j + 1) * tw]
                b = g[t, i * th:(i + 1) * th, j * tw:(j + 1) * tw]
                (dx, dy), resp = cv2.phaseCorrelate(a, b, win)
                # Textureless tiles (flat sky / wall) return a meaningless
                # peak with near-zero response — including them poisons the
                # median (measured: 98 px box error on outdoor scenes).
                if resp >= 0.08 and abs(dx) < tw / 2 and abs(dy) < th / 2:
                    est.append((dx, dy))
        if len(est) >= 3:
            shifts[t] = np.median(np.asarray(est), axis=0)
    return shifts * downsample


def estimate_person_boxes(
    frames: np.ndarray,
    smooth: int = 9,
    min_size: float = 0.15,
    use_native: bool = True,
    stabilize: bool = False,
) -> np.ndarray:
    """Motion-energy person boxes for a (near-)static-camera swing clip.

    Frame differencing against the clip median localizes the moving golfer;
    per-frame boxes are median-smoothed over time and unioned with a minimum
    size (fraction of frame) so a momentarily-still golfer isn't lost.

    With `stabilize` (opt-in), global camera translation is estimated by
    phase correlation first and differencing runs on shift-compensated
    frames.  Off by default: on low-texture scenes the estimator's own
    bias costs more than it saves, and the pipeline's keypoint-seeded box
    refinement (box_refine_stride, full-frame cold start) handles moving
    cameras on-device without host heuristics.  Static clips keep the
    multithreaded C++ fast path (golfaction_tpu.native); this NumPy body is
    the oracle.

    Returns boxes [T, 4] float32 (cx, cy, w, h) in pixels.
    """
    shifts = None
    if stabilize:
        shifts = estimate_camera_shifts(frames)
        if np.abs(shifts).max() < 1.5:
            shifts = None  # static camera: no compensation needed
    if use_native and shifts is None:
        from golfaction_tpu import native

        out = native.motion_boxes(frames, min_size=min_size, smooth=smooth)
        if out is not None:
            return out
    T, H, W, _ = frames.shape
    gray = frames.mean(axis=-1).astype(np.float32)
    if shifts is not None:
        # Shift-compensate into frame-0 coordinates (integer roll is enough
        # for box purposes; vacated edges fall out of the percentile bounds).
        comp = np.empty_like(gray)
        for t in range(T):
            dx, dy = int(round(shifts[t, 0])), int(round(shifts[t, 1]))
            comp[t] = np.roll(gray[t], (-dy, -dx), axis=(0, 1))
        gray = comp
    background = np.median(gray, axis=0)
    energy = np.abs(gray - background)              # [T, H, W]
    thresh = np.maximum(12.0, energy.mean() + energy.std())
    mask = energy > thresh

    boxes = np.zeros((T, 4), np.float32)
    fallback = np.array([W / 2, H / 2, W * 0.5, H * 0.9], np.float32)
    for t in range(T):
        ys, xs = np.nonzero(mask[t])
        if len(xs) < 50:  # not enough motion evidence
            boxes[t] = fallback
            continue
        # Percentile bounds reject speckle outliers.
        x0, x1 = np.percentile(xs, [1, 99])
        y0, y1 = np.percentile(ys, [1, 99])
        w = max(x1 - x0, min_size * W)
        h = max(y1 - y0, min_size * H)
        boxes[t] = [(x0 + x1) / 2, (y0 + y1) / 2, w * 1.1, h * 1.1]

    # Temporal median smoothing keeps the crop stable through the swing.
    if smooth > 1 and T > 1:
        k = min(smooth, T if T % 2 else T - 1)
        pad = k // 2
        padded = np.pad(boxes, ((pad, pad), (0, 0)), mode="edge")
        sm = np.stack(
            [np.median(padded[i : i + k], axis=0) for i in range(T)]
        )
        boxes = sm.astype(np.float32)
    if shifts is not None:
        # Map centers back from stabilized (frame-0) coords to each frame.
        boxes[:, 0] += shifts[:, 0]
        boxes[:, 1] += shifts[:, 1]
    return boxes


def pad_to_bucket(
    frames: np.ndarray,
    boxes: np.ndarray,
    buckets: Sequence[int],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a clip to the smallest bucket >= T (SURVEY.md §7 hard part (c)).

    Returns (frames [Tb, ...], boxes [Tb, 4], valid [Tb] bool).  Padding
    repeats the last frame/box so device-side stats stay in-distribution;
    `valid` marks real frames.
    """
    T = len(frames)
    tb = next((b for b in sorted(buckets) if b >= T), None)
    if tb is None:
        raise ValueError(
            f"clip length {T} exceeds largest bucket {max(buckets)}; "
            "split the clip or extend PipelineConfig.length_buckets"
        )
    valid = np.zeros(tb, bool)
    valid[:T] = True
    if tb == T:
        return frames, boxes.astype(np.float32), valid
    pad = tb - T
    frames_p = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    boxes_p = np.concatenate([boxes, np.repeat(boxes[-1:], pad, axis=0)])
    return frames_p, boxes_p.astype(np.float32), valid


def frame_source(
    spec: str,
    realtime: bool = False,
    max_frames: Optional[int] = None,
    npy_fps: float = 30.0,
) -> Iterator[np.ndarray]:
    """Yield RGB frames from a live-style source (reference README.md:11 rig).

    spec:
      * "camera:N"    — cv2.VideoCapture device N (a physical camera);
      * "<path>.npy"  — a saved [T, H, W, 3] uint8 array; .npy files carry
        no frame-rate metadata, so realtime pacing uses `npy_fps`
        (default 30);
      * anything else — a video file, decoded frame-by-frame.  With
        realtime=True, frames are paced at the file's native fps, simulating
        a live feed (the steady-state-latency measurement mode).

    Unlike load_video, this never materializes the whole clip — the decode
    cost per frame overlaps the device compute downstream.
    """
    import time

    if spec.endswith(".npy"):
        arr = np.load(spec)
        period = 1.0 / max(npy_fps, 1.0)
        t_next = time.perf_counter()
        for i, f in enumerate(arr):
            if max_frames is not None and i >= max_frames:
                return
            if realtime:
                t_next += period
                dt = t_next - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
            yield np.asarray(f)
        return

    if not _HAS_CV2:
        raise RuntimeError("OpenCV unavailable; use a .npy source")
    if spec.startswith("camera:"):
        cap = cv2.VideoCapture(int(spec.split(":", 1)[1]))
        if not cap.isOpened():
            raise RuntimeError(f"camera {spec} failed to open")
        pace = False  # a real camera paces itself
    else:
        if not os.path.exists(spec):
            raise FileNotFoundError(spec)
        cap = cv2.VideoCapture(spec)
        pace = realtime
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    period = 1.0 / max(fps, 1.0)
    t_next = time.perf_counter()
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames is not None and n >= max_frames):
                return
            if pace:
                t_next += period
                dt = t_next - time.perf_counter()
                if dt > 0:
                    time.sleep(dt)
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            n += 1
    finally:
        cap.release()
