"""Pallas TPU kernel: fused heatmap argmax + UDP sub-pixel keypoint decode.

The Pallas fast path for ops.heatmap.decode_heatmaps (BASELINE north_star:
"heatmap head and sub-pixel (UDP/argmax) keypoint decode run as Pallas
kernels").  Bit-level parity with the pure-JAX oracle is enforced by
tests/test_pallas_decode.py (interpret mode on CPU, compiled on TPU).

Design notes (TPU-first):
  * Heatmaps are processed as [M, HW] rows (M = batch*joints, HW = H*W a
    multiple of 128), so every reduction is a lane-aligned VPU op.
  * No gathers: the 3x3 neighborhood needed by the DARK/UDP Taylor step is
    extracted with one-hot masked reductions (9 multiply-reduce sweeps over
    the row), which vectorize perfectly on the 8x128 VPU — dynamic-index
    gathers would serialize.
  * Grid over row-blocks; each block stays in VMEM (one 64x48 f32 heatmap
    is 12 KB; a 256-row block is ~3 MB).
  * Output is [M, 8] (x, y, score, padding) to keep a 2D layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10


def _decode_block(hm, H: int, W: int):
    """Decode rows hm [bm, H*W] -> (x, y, score) each [bm]."""
    bm, HW = hm.shape
    peak = jnp.max(hm, axis=1)
    idx = jnp.argmax(hm, axis=1).astype(jnp.int32)
    x = idx % W
    y = idx // W

    cols = jax.lax.broadcasted_iota(jnp.int32, (bm, HW), 1)

    def at(dx: int, dy: int):
        # Clamped neighbor value via one-hot reduction (no gather).
        xx = jnp.clip(x + dx, 0, W - 1)
        yy = jnp.clip(y + dy, 0, H - 1)
        pos = (yy * W + xx)[:, None]
        return jnp.sum(jnp.where(cols == pos, hm, 0.0), axis=1)

    logv = lambda v: jnp.log(jnp.maximum(v, _EPS))
    c = logv(at(0, 0))
    xp = logv(at(1, 0))
    xm = logv(at(-1, 0))
    yp = logv(at(0, 1))
    ym = logv(at(0, -1))
    xpyp = logv(at(1, 1))
    xpym = logv(at(1, -1))
    xmyp = logv(at(-1, 1))
    xmym = logv(at(-1, -1))

    dx = 0.5 * (xp - xm)
    dy = 0.5 * (yp - ym)
    dxx = xp - 2.0 * c + xm
    dyy = yp - 2.0 * c + ym
    dxy = 0.25 * (xpyp - xpym - xmyp + xmym)

    det = dxx * dyy - dxy * dxy
    safe = (jnp.abs(det) > 1e-12) & (dxx < 0) & (dyy < 0)
    det = jnp.where(safe, det, 1.0)
    off_x = -(dyy * dx - dxy * dy) / det
    off_y = -(dxx * dy - dxy * dx) / det
    off_x = jnp.where(safe, jnp.clip(off_x, -0.5, 0.5), 0.0)
    off_y = jnp.where(safe, jnp.clip(off_y, -0.5, 0.5), 0.0)
    return x.astype(jnp.float32) + off_x, y.astype(jnp.float32) + off_y, peak


def _kernel(hm_ref, out_ref, *, H: int, W: int):
    x, y, peak = _decode_block(hm_ref[:].astype(jnp.float32), H, W)
    bm = x.shape[0]
    # Scatterless column assembly (Mosaic has no scatter): select by lane id.
    cols = jax.lax.broadcasted_iota(jnp.int32, (bm, 8), 1)
    out = jnp.where(cols == 0, x[:, None], 0.0)
    out = jnp.where(cols == 1, y[:, None], out)
    out = jnp.where(cols == 2, peak[:, None], out)
    out_ref[:] = out


def decode_heatmaps_pallas(heatmaps, block_rows: int = 128, interpret=None):
    """Pallas UDP decode.  heatmaps [..., H, W] -> keypoints [..., 3].

    Matches ops.heatmap.decode_heatmaps(..., method="udp") bit-for-bit on
    the same backend (same op order / same clamping semantics).  Runs
    compiled on TPU, interpreted elsewhere (interpret=None -> auto).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _decode_heatmaps_jit(heatmaps, block_rows, bool(interpret))


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _decode_heatmaps_jit(
    heatmaps: jnp.ndarray,
    block_rows: int,
    interpret: bool,
) -> jnp.ndarray:
    *lead, H, W = heatmaps.shape
    M = 1
    for d in lead:
        M *= d
    hm = heatmaps.reshape(M, H * W).astype(jnp.float32)

    # Pad rows up to a block multiple.
    bm = min(block_rows, max(M, 8))
    Mp = ((M + bm - 1) // bm) * bm
    if Mp != M:
        hm = jnp.pad(hm, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, H * W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bm, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, 8), jnp.float32),
        interpret=interpret,
    )(hm)
    return out[:M, :3].reshape(*lead, 3)
