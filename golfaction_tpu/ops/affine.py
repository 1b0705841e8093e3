"""Affine-transform utilities for top-down pose cropping.

Implements the standard top-down pose convention (reference README.md:15 pose
model; SURVEY.md §3.2): a person box (center, scale) defines an axis-aligned
crop that is resized to the model input; keypoints decoded in heatmap space are
mapped back to source-image pixels with the inverse transform.

All transforms are 2x3 matrices acting on row vectors [x, y, 1]; everything is
batched/vmap-friendly and uses the *unbiased* (UDP-style) corner-aligned
mapping so that pixel (0,0) and (W-1,H-1) centers correspond exactly across
resolutions — this is what makes sub-pixel decode bit-consistent between the
crop space and the original image space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_to_center_scale(
    boxes: jnp.ndarray, aspect_ratio: float, padding: float = 1.25
) -> jnp.ndarray:
    """Expand (cx, cy, w, h) boxes to the crop aspect ratio with padding.

    Returns boxes [..., 4] as (cx, cy, w, h) where w/h == aspect_ratio
    (aspect_ratio = crop_w / crop_h).
    """
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    w = jnp.maximum(w, h * aspect_ratio)
    h = w / aspect_ratio
    return jnp.stack([cx, cy, w * padding, h * padding], axis=-1)


def crop_transform(boxes: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """2x3 affine mapping *output crop* pixel coords -> *source image* coords.

    boxes: [..., 4] (cx, cy, w, h) in source pixels (already aspect-matched).
    out_hw: static (H, W) of the crop.

    Unbiased mapping: output pixel x in [0, W-1] spans the box width w, i.e.
    src_x = cx - w/2 + x * (w / (W-1)).  (UDP "unit length" convention.)
    """
    H, W = out_hw
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    sx = w / (W - 1)
    sy = h / (H - 1)
    tx = cx - w / 2.0
    ty = cy - h / 2.0
    zeros = jnp.zeros_like(sx)
    row0 = jnp.stack([sx, zeros, tx], axis=-1)
    row1 = jnp.stack([zeros, sy, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # [..., 2, 3]


def invert_transform(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert a batch of 2x3 affine matrices."""
    A = mat[..., :2]       # [..., 2, 2]
    t = mat[..., 2]        # [..., 2]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    inv00 = A[..., 1, 1] / det
    inv01 = -A[..., 0, 1] / det
    inv10 = -A[..., 1, 0] / det
    inv11 = A[..., 0, 0] / det
    Ainv = jnp.stack(
        [jnp.stack([inv00, inv01], axis=-1), jnp.stack([inv10, inv11], axis=-1)],
        axis=-2,
    )
    tinv = -jnp.einsum("...ij,...j->...i", Ainv, t, precision="highest")
    return jnp.concatenate([Ainv, tinv[..., None]], axis=-1)


def apply_transform(mat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply 2x3 affine `mat` [..., 2, 3] to points [..., N, 2]."""
    return (
        jnp.einsum("...ij,...nj->...ni", mat[..., :2], points, precision="highest")
        + mat[..., None, :2, 2]
    )


def heatmap_to_crop_transform(
    heatmap_hw: tuple[int, int], crop_hw: tuple[int, int]
) -> jnp.ndarray:
    """Static 2x3 affine mapping heatmap pixel coords -> crop pixel coords.

    Unbiased (UDP): corner-aligned, scale = (crop-1)/(heatmap-1).
    """
    Hh, Wh = heatmap_hw
    Hc, Wc = crop_hw
    sx = (Wc - 1) / (Wh - 1)
    sy = (Hc - 1) / (Hh - 1)
    return jnp.array([[sx, 0.0, 0.0], [0.0, sy, 0.0]], dtype=jnp.float32)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose affines: result(x) = a(b(x)).  Shapes broadcast over batch dims."""
    A, ta = a[..., :2], a[..., 2]
    B, tb = b[..., :2], b[..., 2]
    M = jnp.einsum("...ij,...jk->...ik", A, B, precision="highest")
    t = jnp.einsum("...ij,...j->...i", A, tb, precision="highest") + ta
    return jnp.concatenate([M, t[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Keypoint-seeded box tracking (on-device; SURVEY.md §1 L0 person crop)
# ---------------------------------------------------------------------------

def boxes_from_keypoints(
    kpts: jnp.ndarray,
    image_hw: tuple[int, int],
    margin: float = 1.2,
    min_size: float = 48.0,
) -> jnp.ndarray:
    """Tight person boxes from decoded keypoints.

    kpts [..., V, >=2] image-space keypoints -> boxes [..., 4] (cx, cy, w, h).
    `margin` expands the keypoint extent (a skeleton underestimates the
    silhouette); `min_size` floors degenerate extents (bad coarse decode).
    """
    H, W = image_hw
    xy = kpts[..., :2]
    lo = xy.min(axis=-2)
    hi = xy.max(axis=-2)
    c = jnp.clip((lo + hi) / 2,
                 jnp.zeros((2,), jnp.float32),
                 jnp.asarray([W - 1.0, H - 1.0], jnp.float32))
    wh = jnp.maximum((hi - lo) * margin, min_size)
    return jnp.concatenate([c, wh], axis=-1).astype(jnp.float32)


def smooth_boxes(boxes: jnp.ndarray, window: int = 9) -> jnp.ndarray:
    """Temporal moving-average over boxes [T, 4] (edge-padded, static shape)."""
    T = boxes.shape[0]
    k = min(window, T if T % 2 else max(T - 1, 1))
    if k <= 1:
        return boxes
    pad = k // 2
    padded = jnp.pad(boxes, ((pad, pad), (0, 0)), mode="edge")   # [T+2p, 4]
    # cumulative-sum sliding window: one pass, no per-column convs
    cs = jnp.cumsum(jnp.concatenate([jnp.zeros((1, 4)), padded]), axis=0)
    return ((cs[k:] - cs[:-k]) / k).astype(boxes.dtype)


def interp_boxes(boxes_s: jnp.ndarray, stride: int, T: int) -> jnp.ndarray:
    """Linearly upsample strided boxes [ceil(T/stride), 4] to [T, 4].

    Row i of the input corresponds to frame i*stride; frames past the last
    strided sample hold its value.
    """
    Ts = boxes_s.shape[0]
    src = jnp.arange(Ts, dtype=jnp.float32) * stride
    tq = jnp.arange(T, dtype=jnp.float32)
    return jax.vmap(lambda col: jnp.interp(tq, src, col), in_axes=1,
                    out_axes=1)(boxes_s)
