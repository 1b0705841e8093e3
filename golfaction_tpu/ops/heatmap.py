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
        # DARK-style: Taylor expansion of log-heatmap around the integer peak.
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
        # Guard: fall back to zero offset where the Hessian is not negative
        # definite (flat/degenerate peak).
        safe = (jnp.abs(det) > 1e-12) & (dxx < 0) & (dyy < 0)
        det = jnp.where(safe, det, 1.0)
        off_x = -(dyy * dx - dxy * dy) / det
        off_y = -(dxx * dy - dxy * dx) / det
        off_x = jnp.where(safe, jnp.clip(off_x, -0.5, 0.5), 0.0)
        off_y = jnp.where(safe, jnp.clip(off_y, -0.5, 0.5), 0.0)
        x = x + off_x
        y = y + off_y
    else:
        raise ValueError(f"unknown decode method: {method!r}")

    return jnp.stack([x, y, peak.astype(jnp.float32)], axis=-1)


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
