"""Heatmap keypoint decode (argmax + sub-pixel refinement) and target generation.

Pure-JAX oracle for the decode stage the reference pipeline performs after its
heatmap pose model (reference README.md:15; BASELINE north_star: "sub-pixel
(UDP/argmax) keypoint decode").  The Pallas fast path
(golfaction_tpu.ops.pallas.decode_kernel) is tested bit-level against this.

Methods:
  "argmax"  — integer peak only.
  "quarter" — SimpleBaseline-style ±0.25 px shift toward the higher neighbor.
  "udp"     — DARK/UDP-style Taylor refinement: offset = -H⁻¹ ∇ log h at the
              peak, clipped to ±0.5 px.  Exact for an ideal Gaussian peak.

All functions operate on heatmaps [..., K, H, W] and are fully vectorized —
no Python loops over joints or batch; everything jits to one fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from golfaction_tpu.ops import affine


def _peak_coords(heatmaps: jnp.ndarray):
    """Flat argmax -> (x, y) int coords + peak value.  heatmaps [..., H, W]."""
    H, W = heatmaps.shape[-2:]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], H * W)
    idx = jnp.argmax(flat, axis=-1)
    peak = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    y = (idx // W).astype(jnp.int32)
    x = (idx % W).astype(jnp.int32)
    return x, y, peak


def _gather_at(heatmaps: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """heatmaps [..., H, W] sampled at integer (x, y) [...] with edge clamping."""
    H, W = heatmaps.shape[-2:]
    x = jnp.clip(x, 0, W - 1)
    y = jnp.clip(y, 0, H - 1)
    flat = heatmaps.reshape(*heatmaps.shape[:-2], H * W)
    return jnp.take_along_axis(flat, (y * W + x)[..., None], axis=-1)[..., 0]


def _udp_offset(heatmaps: jnp.ndarray, x_i: jnp.ndarray, y_i: jnp.ndarray):
    """DARK/UDP sub-pixel offset at integer peak (x_i, y_i) [...].

    Taylor expansion of the log-heatmap: offset = -H⁻¹ ∇ log h, clipped to
    ±0.5 px, zero where the Hessian is not negative definite.
    """
    eps = 1e-10
    logh = jnp.log(jnp.maximum(heatmaps, eps))
    c = _gather_at(logh, x_i, y_i)
    xp = _gather_at(logh, x_i + 1, y_i)
    xm = _gather_at(logh, x_i - 1, y_i)
    yp = _gather_at(logh, x_i, y_i + 1)
    ym = _gather_at(logh, x_i, y_i - 1)
    xpyp = _gather_at(logh, x_i + 1, y_i + 1)
    xpym = _gather_at(logh, x_i + 1, y_i - 1)
    xmyp = _gather_at(logh, x_i - 1, y_i + 1)
    xmym = _gather_at(logh, x_i - 1, y_i - 1)

    dx = 0.5 * (xp - xm)
    dy = 0.5 * (yp - ym)
    dxx = xp - 2.0 * c + xm
    dyy = yp - 2.0 * c + ym
    dxy = 0.25 * (xpyp - xpym - xmyp + xmym)

    # offset = -inv([[dxx, dxy], [dxy, dyy]]) @ [dx, dy]
    det = dxx * dyy - dxy * dxy
    safe = (jnp.abs(det) > 1e-12) & (dxx < 0) & (dyy < 0)
    det = jnp.where(safe, det, 1.0)
    off_x = -(dyy * dx - dxy * dy) / det
    off_y = -(dxx * dy - dxy * dx) / det
    off_x = jnp.where(safe, jnp.clip(off_x, -0.5, 0.5), 0.0)
    off_y = jnp.where(safe, jnp.clip(off_y, -0.5, 0.5), 0.0)
    return off_x, off_y


def decode_heatmaps(
    heatmaps: jnp.ndarray, method: str = "udp"
) -> jnp.ndarray:
    """Decode heatmaps [..., K, H, W] -> keypoints [..., K, 3] (x, y, score).

    Coordinates are in heatmap pixel space (corner-aligned); use
    `keypoints_to_image` to map into source-image pixels.
    """
    x_i, y_i, peak = _peak_coords(heatmaps)
    x = x_i.astype(jnp.float32)
    y = y_i.astype(jnp.float32)

    if method == "argmax":
        pass
    elif method == "quarter":
        right = _gather_at(heatmaps, x_i + 1, y_i)
        left = _gather_at(heatmaps, x_i - 1, y_i)
        up = _gather_at(heatmaps, x_i, y_i - 1)
        down = _gather_at(heatmaps, x_i, y_i + 1)
        x = x + 0.25 * jnp.sign(right - left)
        y = y + 0.25 * jnp.sign(down - up)
    elif method == "udp":
        off_x, off_y = _udp_offset(heatmaps, x_i, y_i)
        x = x + off_x
        y = y + off_y
    else:
        raise ValueError(f"unknown decode method: {method!r}")

    return jnp.stack([x, y, peak.astype(jnp.float32)], axis=-1)


def topk_modes(
    heatmaps: jnp.ndarray,
    k: int = 4,
    suppress_radius: float = 3.0,
    refine: bool = True,
) -> jnp.ndarray:
    """Top-k non-max-suppressed local maxima of heatmaps [..., H, W].

    Returns modes [..., k, 3] (x, y, score) in heatmap pixel space, score-
    descending.  Greedy peak extraction: k rounds of (argmax, suppress a
    `suppress_radius`-px disk), fully vectorized over the batch dims —
    a `lax.scan` of length k over one fused max-reduce + mask per round.
    Each mode gets the UDP sub-pixel refinement against the ORIGINAL
    (unsuppressed) heatmap.

    Motivation (measured, scripts/probe_heatmap_modes.py): on fault-
    deflected elbows the pose net emits BIMODAL heatmaps — canonical-prior
    mode + true-location mode — and the single-peak decode flips between
    them (true mode present within 2 hm px in 97% of faulted frames while
    the global peak sits nearer the canonical ghost in half of them).
    `viterbi_track` selects among these modes with temporal consistency.
    """
    H, W = heatmaps.shape[-2:]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    r2 = float(suppress_radius) ** 2

    # A candidate mode must be a 3x3 LOCAL MAXIMUM of the original heatmap:
    # after suppressing a disk around an extracted peak, the highest
    # remaining value would otherwise be the peak's own shoulder ring (a
    # Gaussian at sigma 2 still reads ~0.3 at radius 3), which is a
    # monotone-slope point, not a mode, and would pollute the Viterbi
    # candidate set with high-scoring ghosts ~3 px off every real peak.
    win = (1,) * (heatmaps.ndim - 2) + (3, 3)
    pooled = jax.lax.reduce_window(
        heatmaps, -jnp.inf, jax.lax.max, win, (1,) * heatmaps.ndim, "SAME"
    )
    neg = jnp.asarray(-1e30, heatmaps.dtype)
    start = jnp.where(heatmaps >= pooled, heatmaps, neg)

    def body(h, _):
        x_i, y_i, peak = _peak_coords(h)
        d2 = (xs - x_i[..., None, None].astype(jnp.float32)) ** 2 + (
            ys - y_i[..., None, None].astype(jnp.float32)
        ) ** 2
        h = jnp.where(d2 <= r2, neg, h)
        return h, (x_i, y_i, peak)

    _, (xk, yk, pk) = jax.lax.scan(body, start, None, length=k)
    # scan stacks on axis 0 -> move the mode axis to the end of batch dims.
    nb = heatmaps.ndim - 2
    xk = jnp.moveaxis(xk, 0, nb)                      # [..., k]
    yk = jnp.moveaxis(yk, 0, nb)
    # Pad slots (all remaining pixels suppressed/non-maximal) carry the
    # -1e30 sentinel at pixel (0,0); clamp to 0 so downstream consumers
    # (viterbi_track unary cost, GCN confidence features) see "no mode"
    # rather than a finite-cost corner ghost (ADVICE r3).
    pk = jnp.maximum(jnp.moveaxis(pk, 0, nb).astype(jnp.float32), 0.0)

    x = xk.astype(jnp.float32)
    y = yk.astype(jnp.float32)
    if refine:
        # Broadcast the original heatmaps against the extra mode axis.
        hm_b = heatmaps[..., None, :, :]
        off_x, off_y = _udp_offset(hm_b, xk, yk)
        x = x + off_x
        y = y + off_y
    return jnp.stack([x, y, pk], axis=-1)


def moment_stats(heatmaps: jnp.ndarray, radius: float = 8.0) -> jnp.ndarray:
    """Windowed first/second moments of heatmaps [..., H, W] -> [..., 5].

    Returns (mu_x, mu_y, cov_xx, cov_xy, cov_yy) in heatmap pixel units of
    the positive-clipped heatmap restricted to a `radius`-px disk around
    the argmax peak (the window keeps far-field ghost blobs of OTHER body
    parts from polluting the covariance).

    Motivation (measured, scripts/probe_heatmap_modes.py +
    probe_arm_gain_tracked.json): on fault-deflected arm joints the pose
    net splits its belief between the canonical-prior location and the
    true one, but the two sigma-2 components sit ~2.6 hm px apart — BELOW
    the 2-sigma bimodality threshold — so they merge into one elongated
    blob.  A multi-hypothesis mode decode cannot see this (no second local
    max exists); the second moment can: for a two-component mixture with
    weights (1-w, w) and separation d, the variance along the separation
    axis is sigma^2 + w(1-w) d^2 while the decoded mean moves only w*d.
    The error head combines this spread with the DTW-aligned-reference
    deviation direction to recover the full deflection magnitude.
    """
    H, W = heatmaps.shape[-2:]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    x_i, y_i, _ = _peak_coords(heatmaps)
    xf = x_i[..., None, None].astype(jnp.float32)
    yf = y_i[..., None, None].astype(jnp.float32)
    d2 = (xs - xf) ** 2 + (ys - yf) ** 2
    w = jnp.maximum(heatmaps.astype(jnp.float32), 0.0)
    w = jnp.where(d2 <= float(radius) ** 2, w, 0.0)
    z = jnp.maximum(w.sum((-2, -1)), 1e-9)
    mux = (w * xs).sum((-2, -1)) / z
    muy = (w * ys).sum((-2, -1)) / z
    cxx = (w * xs * xs).sum((-2, -1)) / z - mux * mux
    cyy = (w * ys * ys).sum((-2, -1)) / z - muy * muy
    cxy = (w * xs * ys).sum((-2, -1)) / z - mux * muy
    return jnp.stack([mux, muy, cxx, cxy, cyy], axis=-1)


def viterbi_track(
    modes: jnp.ndarray,
    lam: float = 0.1,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Temporally-consistent mode selection over a clip.

    modes [T, ..., k, 3]: per-frame top-k candidate (x, y, score) from
    `topk_modes` (any number of middle batch dims, typically the joint
    axis).  Finds, independently per joint, the mode sequence minimizing

        sum_t -log(score_t) + lam * ||xy_t - xy_{t-1}||²

    by exact Viterbi DP: a forward `lax.scan` over T computing the k×k
    transition costs (carrying [..., k] path costs), then a reverse scan
    backtracking the argmin pointers.  O(T·k²) per joint — negligible next
    to the pose conv stack — and everything stays in the jitted program.

    Returns keypoints [T, ..., 3]: the selected mode per frame.

    Why exact DP and not per-frame argmax: the pose net's fault-frame
    heatmaps are bimodal (see `topk_modes`); the canonical ghost mode and
    the true mode BOTH form smooth tracks, but the true track scores
    higher summed over the clip, so the global optimum follows it while
    per-frame argmax flips (the measured 0.34 deflection gain).
    """
    xy = modes[..., :2]
    score = modes[..., 2]
    # Modes with score <= 0 are topk_modes pad slots (no k-th local max
    # existed); bar them from selection outright instead of letting the
    # eps clamp price them at a finite -log(eps) (ADVICE r3).
    unary = jnp.where(
        score > 0.0, -jnp.log(jnp.maximum(score, eps)), 1e9
    )                                                  # [T, ..., k]

    def fwd(carry, inp):
        prev_cost, prev_xy = carry                     # [..., k], [..., k, 2]
        xy_t, u_t = inp
        d2 = jnp.sum(
            (xy_t[..., None, :, :] - prev_xy[..., :, None, :]) ** 2, -1
        )                                              # [..., k_prev, k_cur]
        tot = prev_cost[..., :, None] + lam * d2
        back = jnp.argmin(tot, axis=-2)                # [..., k_cur]
        cost = jnp.min(tot, axis=-2) + u_t
        return (cost, xy_t), back

    (final_cost, _), backs = jax.lax.scan(
        fwd, (unary[0], xy[0]), (xy[1:], unary[1:])
    )                                                  # backs [T-1, ..., k]
    last = jnp.argmin(final_cost, axis=-1)             # [...]

    def bwd(nxt, back_t):
        cur = jnp.take_along_axis(back_t, nxt[..., None], axis=-1)[..., 0]
        return cur, cur

    _, prevs = jax.lax.scan(bwd, last, backs, reverse=True)
    idx = jnp.concatenate([prevs, last[None]], axis=0)  # [T, ...]
    return jnp.take_along_axis(
        modes, idx[..., None, None], axis=modes.ndim - 2
    )[..., 0, :]


def keypoints_to_image(
    kpts_hm: jnp.ndarray,
    boxes: jnp.ndarray,
    heatmap_hw: tuple[int, int],
    crop_hw: tuple[int, int],
) -> jnp.ndarray:
    """Map heatmap-space keypoints [..., K, 3] to source-image pixels.

    boxes [..., 4]: the (cx, cy, w, h) crop boxes used by preprocessing
    (already aspect-matched).  Uses the unbiased corner-aligned transform
    chain heatmap -> crop -> image (ops.affine).
    """
    hm2crop = affine.heatmap_to_crop_transform(heatmap_hw, crop_hw)
    crop2img = affine.crop_transform(boxes, crop_hw)
    full = affine.compose(crop2img, jnp.broadcast_to(hm2crop, crop2img.shape))
    xy = affine.apply_transform(full, kpts_hm[..., :2])
    return jnp.concatenate([xy, kpts_hm[..., 2:]], axis=-1)


def make_heatmap_targets(
    kpts_hm: jnp.ndarray,
    heatmap_hw: tuple[int, int],
    sigma: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gaussian target heatmaps for training the pose model.

    kpts_hm: [..., K, 2] keypoints in heatmap pixel coords (sub-pixel ok).
    Returns (targets [..., K, H, W], weights [..., K]) where weight=0 marks
    joints whose peak falls outside the heatmap.
    """
    H, W = heatmap_hw
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]      # [H, 1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]      # [1, W]
    mu = kpts_hm[..., None, None, :]                    # [..., K, 1, 1, 2]
    d2 = (xs - mu[..., 0]) ** 2 + (ys - mu[..., 1]) ** 2  # [..., K, H, W]
    targets = jnp.exp(-d2 / (2.0 * sigma**2))
    inside = (
        (kpts_hm[..., 0] >= 0)
        & (kpts_hm[..., 0] <= W - 1)
        & (kpts_hm[..., 1] >= 0)
        & (kpts_hm[..., 1] <= H - 1)
    )
    weights = inside.astype(jnp.float32)
    targets = targets * weights[..., None, None]
    return targets, weights


def image_keypoints_to_heatmap(
    kpts_img: jnp.ndarray,
    boxes: jnp.ndarray,
    heatmap_hw: tuple[int, int],
    crop_hw: tuple[int, int],
) -> jnp.ndarray:
    """Inverse of `keypoints_to_image` for building training targets."""
    hm2crop = affine.heatmap_to_crop_transform(heatmap_hw, crop_hw)
    crop2img = affine.crop_transform(boxes, crop_hw)
    full = affine.compose(crop2img, jnp.broadcast_to(hm2crop, crop2img.shape))
    inv = affine.invert_transform(full)
    xy = affine.apply_transform(inv, kpts_img[..., :2])
    return jnp.concatenate([xy, kpts_img[..., 2:]], axis=-1)
