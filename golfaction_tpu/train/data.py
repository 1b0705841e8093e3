"""Procedural golf-swing dataset generator.

The reference trained on a private swing dataset (reference README.md:24-48
shows training curves only; no data is published).  With no real data
available, this module generates a *parametric golfer*: a 2D COCO-17
skeleton articulated through the eight swing phases with controllable tempo,
style jitter, and injectable swing faults.  It provides ground truth for
every model in the stack (SURVEY.md §7: "accuracy parity is demonstrated
on ... a synthetic swing-phase dataset"):

  * pose:   frames rendered as joint-centered Gaussian blobs + limb segments,
            with exact keypoint ground truth;
  * GCN:    per-frame phase labels from the generating schedule;
  * align:  the same swing resampled under two tempos, with the true
            time-correspondence as alignment ground truth;
  * error:  fault flags matching the injected perturbations.

Everything is NumPy on the host (data pipeline layer, SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu import graph

# Canonical address-pose skeleton (x, y) in a unit body frame: y grows down,
# origin at mid-hip, torso height ~1.  Rough golfer proportions.
_ADDRESS = {
    "nose": (0.05, -1.05),
    "left_eye": (0.02, -1.10), "right_eye": (0.08, -1.10),
    "left_ear": (-0.02, -1.07), "right_ear": (0.12, -1.07),
    "left_shoulder": (-0.18, -0.85), "right_shoulder": (0.22, -0.85),
    "left_elbow": (-0.22, -0.55), "right_elbow": (0.28, -0.55),
    "left_wrist": (0.05, -0.30), "right_wrist": (0.09, -0.30),
    "left_hip": (-0.15, 0.0), "right_hip": (0.15, 0.0),
    "left_knee": (-0.17, 0.45), "right_knee": (0.19, 0.45),
    "left_ankle": (-0.18, 0.90), "right_ankle": (0.20, 0.90),
}

# Swing-phase schedule: (phase_name, fraction of clip).  The generator sweeps
# an arm-rotation parameter theta through the swing while hips/shoulders turn.
_PHASE_SCHEDULE = (
    ("address", 0.12),
    ("takeaway", 0.10),
    ("backswing", 0.16),
    ("top", 0.08),
    ("downswing", 0.12),
    ("impact", 0.06),
    ("follow_through", 0.16),
    ("finish", 0.20),
)

# Arm-swing angle (radians) at each phase boundary: 0 = arms hanging at
# address, negative = backswing side, positive = follow-through side.
_PHASE_THETA = {
    "address": 0.0,
    "takeaway": -0.7,
    "backswing": -2.0,
    "top": -2.6,
    "downswing": -0.8,
    "impact": 0.1,
    "follow_through": 1.8,
    "finish": 2.6,
}


@dataclasses.dataclass(frozen=True)
class SwingSample:
    keypoints: np.ndarray        # [T, 17, 3] image px (x, y, vis)
    phase_labels: np.ndarray     # [T] int32 indices into config.SWING_PHASES
    error_flags: np.ndarray      # [E] float32 0/1
    frames: Optional[np.ndarray] = None   # [T, H, W, 3] uint8 if rendered
    boxes: Optional[np.ndarray] = None    # [T, 4]
    progress: Optional[np.ndarray] = None  # [T] swing progress in [0, 1]


def _phase_curve(t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map clip progress t∈[0,1] -> (theta, phase_index [T])."""
    bounds = np.cumsum([0.0] + [f for _, f in _PHASE_SCHEDULE])
    names = [n for n, _ in _PHASE_SCHEDULE]
    theta = np.zeros_like(t)
    labels = np.zeros(len(t), np.int32)
    keys = list(cfg_mod.SWING_PHASES)
    for i, name in enumerate(names):
        lo, hi = bounds[i], bounds[i + 1]
        in_seg = (t >= lo) & (t <= hi if i == len(names) - 1 else t < hi)
        seg_t = np.clip((t - lo) / max(hi - lo, 1e-6), 0, 1)
        th0 = _PHASE_THETA[name]
        th1 = _PHASE_THETA[names[i + 1]] if i + 1 < len(names) else th0
        # smoothstep easing within each phase
        ease = seg_t * seg_t * (3 - 2 * seg_t)
        theta = np.where(in_seg, th0 + (th1 - th0) * ease, theta)
        labels = np.where(in_seg, keys.index(name), labels)
    return theta, labels


def swing_keypoints(
    num_frames: int,
    rng: np.random.Generator,
    tempo_warp: float = 0.0,
    style_jitter: float = 0.02,
    noise: float = 0.003,
    faults: Optional[dict[str, float]] = None,
) -> SwingSample:
    """Generate one swing in the unit body frame (no rendering).

    tempo_warp in [-1, 1]: power-law time warp (slow-start vs fast-start),
    the ground-truth correspondence used by alignment training.
    faults: {error_name: severity} perturbations matching config.SWING_ERRORS.
    """
    V = graph.NUM_JOINTS
    t_lin = np.linspace(0, 1, num_frames)
    power = 2.0 ** tempo_warp
    t = t_lin**power
    theta, labels = _phase_curve(t)

    base = np.array([_ADDRESS[n] for n in graph.COCO_KEYPOINTS], np.float64)
    kpts = np.repeat(base[None], num_frames, axis=0)     # [T, V, 2]

    # Style: per-joint static offset (body proportions vary by subject).
    kpts += rng.normal(0, style_jitter, (1, V, 2))

    # Articulate: arms rotate about the shoulder midpoint with angle theta;
    # wrists travel furthest, elbows half-way (simple two-link approximation).
    sh_mid = kpts[:, [5, 6], :].mean(axis=1, keepdims=True)  # [T, 1, 2]
    for joints, gain in (([9, 10], 1.0), ([7, 8], 0.55)):
        rel = kpts[:, joints, :] - sh_mid
        c, s = np.cos(theta * gain), np.sin(theta * gain)
        rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)  # [T,2,2]
        kpts[:, joints, :] = sh_mid + np.einsum("tij,tvj->tvi", rot, rel)

    # Hip/shoulder turn: lateral compression proportional to theta.
    turn = 0.12 * np.sin(theta)
    kpts[:, [5, 6], 0] -= turn[:, None] * np.array([1.0, -1.0])
    kpts[:, [11, 12], 0] -= 0.5 * turn[:, None] * np.array([1.0, -1.0])

    # Head stays roughly still; knees flex slightly through the strike.
    kpts[:, [13, 14], 1] += 0.02 * np.abs(np.sin(theta))[:, None]

    # --- fault injection (matches config.SWING_ERRORS semantics) ---
    E = cfg_mod.NUM_ERRORS
    flags = np.zeros(E, np.float32)
    faults = faults or {}
    back = theta < -0.1     # backswing side frames
    down = (theta > -1.0) & (theta < 0.3)
    for name, sev in faults.items():
        e = cfg_mod.SWING_ERRORS.index(name)
        flags[e] = 1.0
        if name == "swaying":
            kpts[:, [11, 12, 13, 14], 0] += sev * 0.15 * np.clip(-theta, 0, None)[:, None]
        elif name == "hanging_back":
            kpts[:, [11, 12], 0] -= sev * 0.12 * down[:, None]
        elif name == "early_extension":
            kpts[:, [11, 12], 1] -= sev * 0.10 * down[:, None]
        elif name == "over_the_top":
            kpts[:, [7, 9], 1] -= sev * 0.12 * down[:, None]
        elif name == "casting":
            kpts[:, [9, 10], 1] += sev * 0.15 * down[:, None]
        elif name == "reverse_spine":
            kpts[:, [0, 1, 2, 3, 4, 5, 6], 0] += sev * 0.10 * np.clip(-theta, 0, None)[:, None]
        elif name == "chicken_wing":
            fw = theta > 0.3
            kpts[:, [7], 1] -= sev * 0.15 * fw[:, None]
        elif name == "head_movement":
            kpts[:, [0, 1, 2, 3, 4], 0] += sev * 0.12 * np.sin(theta * 2)[:, None]

    # Measurement noise.
    kpts += rng.normal(0, noise, kpts.shape)
    vis = np.ones((num_frames, V, 1))
    return SwingSample(
        keypoints=np.concatenate([kpts, vis], axis=-1).astype(np.float32),
        phase_labels=labels.astype(np.int32),
        error_flags=flags,
        progress=t.astype(np.float32),
    )


def place_in_image(
    sample: SwingSample,
    image_hw: tuple[int, int] = (1080, 1920),
    person_height_px: float = 700.0,
    center: Optional[tuple[float, float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> SwingSample:
    """Map unit-body-frame keypoints into image pixels + derive person boxes."""
    H, W = image_hw
    if center is None:
        rng = rng or np.random.default_rng(0)
        center = (
            float(rng.uniform(0.35, 0.65) * W),
            float(rng.uniform(0.45, 0.6) * H),
        )
    scale = person_height_px / 2.0  # body frame spans ~2 units vertically
    xy = sample.keypoints[..., :2] * scale + np.asarray(center)
    kpts = np.concatenate([xy, sample.keypoints[..., 2:]], axis=-1).astype(np.float32)

    lo = xy.min(axis=1)   # [T, 2]
    hi = xy.max(axis=1)
    c = (lo + hi) / 2
    wh = (hi - lo) * 1.15
    boxes = np.concatenate([c, wh], axis=-1).astype(np.float32)
    return dataclasses.replace(sample, keypoints=kpts, boxes=boxes)


def render_frames(
    sample: SwingSample,
    image_hw: tuple[int, int],
    joint_radius: float = 6.0,
    rng: Optional[np.random.Generator] = None,
) -> SwingSample:
    """Render simple synthetic frames: dark background + bright joints/limbs.

    Good enough to train the pose net to locate joints (blob centers are the
    exact keypoints) while remaining cheap to generate on the host.
    """
    rng = rng or np.random.default_rng(0)
    H, W = image_hw
    T = sample.keypoints.shape[0]
    frames = rng.integers(20, 45, (T, H, W, 3)).astype(np.uint8)
    ys = np.arange(H, dtype=np.float32)[:, None]
    xs = np.arange(W, dtype=np.float32)[None, :]
    # Per-joint distinctive colors so the net can tell joints apart.
    colors = (rng.integers(120, 256, (graph.NUM_JOINTS, 3))).astype(np.float32)
    for tt in range(T):
        canvas = frames[tt].astype(np.float32)
        # Limb segments as capsule strokes.
        for a, b in graph.COCO_EDGES:
            pa, pb = sample.keypoints[tt, a, :2], sample.keypoints[tt, b, :2]
            n = max(int(np.linalg.norm(pb - pa) / (joint_radius * 0.9)), 1)
            for u in np.linspace(0, 1, n + 1):
                p = pa * (1 - u) + pb * u
                y0, y1 = int(max(p[1] - joint_radius, 0)), int(min(p[1] + joint_radius + 1, H))
                x0, x1 = int(max(p[0] - joint_radius, 0)), int(min(p[0] + joint_radius + 1, W))
                if y0 < y1 and x0 < x1:
                    d2 = (ys[y0:y1] - p[1]) ** 2 + (xs[:, x0:x1] - p[0]) ** 2
                    m = d2 < joint_radius**2
                    canvas[y0:y1, x0:x1][m] = 90.0
        # Joints on top.
        r = joint_radius * 1.4
        for v in range(graph.NUM_JOINTS):
            p = sample.keypoints[tt, v, :2]
            y0, y1 = int(max(p[1] - r, 0)), int(min(p[1] + r + 1, H))
            x0, x1 = int(max(p[0] - r, 0)), int(min(p[0] + r + 1, W))
            if y0 < y1 and x0 < x1:
                d2 = (ys[y0:y1] - p[1]) ** 2 + (xs[:, x0:x1] - p[0]) ** 2
                m = d2 < r**2
                canvas[y0:y1, x0:x1][m] = colors[v]
        frames[tt] = np.clip(canvas, 0, 255).astype(np.uint8)
    return dataclasses.replace(sample, frames=frames)


def progress_align_reference(
    sample: SwingSample, ref: SwingSample
) -> np.ndarray:
    """Warp a reference swing onto a sample's timeline via true progress.

    Ground-truth version of the runtime's DTW-path warp
    (ops.softdtw.warp_by_path): for each sample frame t, the reference frame
    with the nearest swing progress.  Returns keypoints [T, V, 3].
    """
    j = np.abs(
        ref.progress[None, :] - sample.progress[:, None]
    ).argmin(axis=1)
    return ref.keypoints[j]


def make_swing_batch(
    batch: int,
    num_frames: int,
    seed: int = 0,
    fault_prob: float = 0.35,
    image_hw: Optional[tuple[int, int]] = None,
    render: bool = False,
) -> list[SwingSample]:
    """Batch of varied swings (tempo, style, faults); optionally rendered."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(batch):
        faults = {}
        if rng.uniform() < fault_prob:
            k = rng.integers(1, 3)
            for name in rng.choice(cfg_mod.SWING_ERRORS, size=k, replace=False):
                faults[str(name)] = float(rng.uniform(0.6, 1.0))
        s = swing_keypoints(
            num_frames, rng,
            tempo_warp=float(rng.uniform(-0.8, 0.8)),
            faults=faults,
        )
        if image_hw is not None:
            s = place_in_image(s, image_hw, person_height_px=0.65 * image_hw[0], rng=rng)
            if render:
                s = render_frames(s, image_hw, joint_radius=max(3.0, 0.01 * image_hw[0]), rng=rng)
        out.append(s)
    return out
