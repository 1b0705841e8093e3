"""Fused crop / resize / normalize preprocessing.

The device-side front of the pipeline (BASELINE north_star: "fused
resize/normalize/layout preprocessing kernel"; SURVEY.md §2 "Preprocess
kernel"): raw frames [B, H, W, 3] uint8 plus per-frame person boxes ->
normalized model-input crops [B, h, w, 3] float.

Two implementations with identical semantics:

  * `crop_resize_normalize_reference` — oracle: per-output-pixel bilinear
    gather (the classic warpAffine formulation).  Used as the parity target.
  * `crop_resize_normalize` — TPU fast path: the axis-aligned warp is
    *separable*, so it is computed as two dense interpolation matmuls
    (Wy @ frame @ Wxᵀ) that run on the MXU, with normalization folded in.
    No gathers, no dynamic shapes; XLA fuses the scale/shift into the GEMM
    epilogue.  A Pallas fusion of the two GEMMs lives in
    ops/pallas/preprocess_kernel.py.

Out-of-frame samples get zero weight (matches warpAffine zero-border).
Coordinates use the unbiased corner-aligned convention of ops.affine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from golfaction_tpu.ops import affine

# ImageNet normalization (the implied MMPose-style preprocessing, SURVEY.md §2).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _sample_coords(boxes: jnp.ndarray, out_size: int, axis: int, ) -> jnp.ndarray:
    """Source coordinates [..., out_size] for output pixel centers along x or y.

    axis=0 -> x (uses cx, w); axis=1 -> y (uses cy, h).
    """
    c = boxes[..., 0 + axis]
    s = boxes[..., 2 + axis]
    step = s / (out_size - 1)
    start = c - s / 2.0
    idx = jnp.arange(out_size, dtype=jnp.float32)
    return start[..., None] + idx * step[..., None]


def _interp_matrix(coords: jnp.ndarray, src_size: int) -> jnp.ndarray:
    """Dense bilinear interpolation matrix W[..., out, src].

    W[o, s] = max(0, 1 - |coords[o] - s|): the 2-tap hat kernel.  Rows whose
    coordinate is outside [-1, src] are all-zero => zero border padding.
    """
    src = jnp.arange(src_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., :, None] - src))


def crop_resize_normalize_reference(
    frames: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: tuple[int, int],
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
) -> jnp.ndarray:
    """Oracle: gather-based bilinear warp.  frames [B,H,W,3] uint8/float."""
    B, H, W, C = frames.shape
    oh, ow = out_hw
    mat = affine.crop_transform(boxes, out_hw)  # [B, 2, 3] crop px -> src px

    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)               # [oh, ow]
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # [oh*ow, 2]
    src = affine.apply_transform(mat, jnp.broadcast_to(pts, (B, oh * ow, 2)))
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = frames.reshape(B, H * W, C).astype(jnp.float32)
        v = jnp.take_along_axis(flat, (yc * W + xc)[..., None], axis=1)
        return v * inb[..., None]

    out = (
        tap(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
        + tap(x0 + 1, y0) * (fx * (1 - fy))[..., None]
        + tap(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
        + tap(x0 + 1, y0 + 1) * (fx * fy)[..., None]
    )
    out = out.reshape(B, oh, ow, C) / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    return (out - mean) / std


def crop_resize_normalize(
    frames: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: tuple[int, int],
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """TPU fast path: separable bilinear warp as two batched MXU matmuls.

    Bit-equivalent (up to float accumulation order) to the oracle because an
    axis-aligned bilinear warp factorizes: out = Wy @ frame @ Wxᵀ with the
    2-tap hat kernels along each axis.
    """
    B, H, W, C = frames.shape
    oh, ow = out_hw
    cy = _sample_coords(boxes, oh, axis=1)       # [B, oh]
    cx = _sample_coords(boxes, ow, axis=0)       # [B, ow]
    Wy = _interp_matrix(cy, H)                   # [B, oh, H]
    Wx = _interp_matrix(cx, W)                   # [B, ow, W]

    f = frames.astype(dtype)
    Wy = Wy.astype(dtype)
    Wx = Wx.astype(dtype)
    # Contract the wide W axis first: the intermediate is [B, H, ow, C]
    # (ow << W), halving the HBM traffic vs the Wy-first order.
    t = jnp.einsum("bpw,bhwc->bhpc", Wx, f, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "boh,bhpc->bopc", Wy, t.astype(dtype), preferred_element_type=jnp.float32
    )
    out = out / 255.0
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    return ((out - mean) / std).astype(dtype)
