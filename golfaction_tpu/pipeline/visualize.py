"""Skeleton rendering and aligned side-by-side comparison.

Host-side demo/visualization layer (reference README.md:50-52 "Compare 2
skeleton" shows exactly this: two aligned skeletons side by side).  Not
performance-critical (SURVEY.md §2), so it's plain NumPy + OpenCV.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu import graph

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

# Left limbs / right limbs / center drawn in distinct colors (RGB).
_LEFT = {1, 3, 5, 7, 9, 11, 13, 15}
_RIGHT = {2, 4, 6, 8, 10, 12, 14, 16}
_COLOR_LEFT = (66, 133, 244)
_COLOR_RIGHT = (234, 67, 53)
_COLOR_MID = (52, 168, 83)


def _edge_color(a: int, b: int):
    if a in _LEFT and b in _LEFT:
        return _COLOR_LEFT
    if a in _RIGHT and b in _RIGHT:
        return _COLOR_RIGHT
    return _COLOR_MID


def draw_skeleton(
    image: np.ndarray,
    kpts: np.ndarray,
    score_threshold: float = 0.2,
    radius: int = 4,
    thickness: int = 2,
) -> np.ndarray:
    """Draw one skeleton [V, 3] onto an RGB uint8 image (in place copy)."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV unavailable")
    out = image.copy()
    ok = kpts[:, 2] >= score_threshold
    for a, b in graph.COCO_EDGES:
        if ok[a] and ok[b]:
            pa = tuple(np.round(kpts[a, :2]).astype(int))
            pb = tuple(np.round(kpts[b, :2]).astype(int))
            cv2.line(out, pa, pb, _edge_color(a, b), thickness, cv2.LINE_AA)
    for v in range(len(kpts)):
        if ok[v]:
            p = tuple(np.round(kpts[v, :2]).astype(int))
            cv2.circle(out, p, radius, (255, 255, 255), -1, cv2.LINE_AA)
    return out


def _phase_label(idx: int) -> str:
    return cfg_mod.SWING_PHASES[idx] if 0 <= idx < cfg_mod.NUM_PHASES else "?"


def render_analysis(
    frames: np.ndarray,
    result,
    show_phase: bool = True,
) -> np.ndarray:
    """Overlay keypoints + phase label on each frame of a clip.

    frames [T, H, W, 3] uint8; result: AnalysisResult.  Returns [Tv, H, W, 3]
    (valid frames only).
    """
    kpts = np.asarray(result.keypoints)
    labels = np.asarray(result.phase_labels)
    valid = np.asarray(result.valid)
    out = []
    for t in range(min(len(frames), valid.sum())):
        img = draw_skeleton(frames[t], kpts[t])
        if show_phase and _HAS_CV2:
            cv2.putText(img, _phase_label(int(labels[t])), (12, 32),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 0), 2,
                        cv2.LINE_AA)
        out.append(img)
    return np.stack(out)


def render_comparison(
    frames_a: np.ndarray,
    kpts_a: np.ndarray,
    frames_b: np.ndarray,
    kpts_b: np.ndarray,
    path: np.ndarray,
    path_length: int,
    max_pairs: Optional[int] = None,
) -> np.ndarray:
    """Side-by-side aligned pairs along the DTW path (README.md:50-52).

    For each path step (i, j), frame i of swing A is placed next to frame j
    of swing B with skeletons drawn.  Returns [L, H, Wa+Wb, 3] uint8.
    """
    steps = np.asarray(path)[:path_length]
    if max_pairs is not None and len(steps) > max_pairs:
        sel = np.linspace(0, len(steps) - 1, max_pairs).astype(int)
        steps = steps[sel]
    H = max(frames_a.shape[1], frames_b.shape[1])

    def pad_h(img):
        if img.shape[0] == H:
            return img
        pad = H - img.shape[0]
        return np.pad(img, ((0, pad), (0, 0), (0, 0)))

    panels = []
    for i, j in steps:
        left = pad_h(draw_skeleton(frames_a[i], np.asarray(kpts_a)[i]))
        right = pad_h(draw_skeleton(frames_b[j], np.asarray(kpts_b)[j]))
        panels.append(np.concatenate([left, right], axis=1))
    return np.stack(panels)


def write_video(path: str, frames: np.ndarray, fps: float = 30.0) -> None:
    """Write RGB frames [T, H, W, 3] uint8 to an mp4 file."""
    if not _HAS_CV2:
        raise RuntimeError("OpenCV unavailable")
    T, H, W, _ = frames.shape
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for f in frames:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()
