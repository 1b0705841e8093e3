"""Pallas TPU kernel: fused crop/resize/normalize preprocessing.

The Pallas fast path for ops.preprocess.crop_resize_normalize (BASELINE
north_star: "fused resize/normalize/layout preprocessing kernel"; SURVEY.md
§2 native component 1).

The separable warp is two matmuls: crop = Wy @ frame @ Wxᵀ.  XLA computes
them as two kernels with the [H, ow, C] float32 intermediate round-tripping
through HBM; this kernel streams the frame through VMEM in row chunks and
keeps the intermediate entirely on-chip:

    for each row-chunk:  s = u8→bf16(frame_chunk) @ Wxᵀ   (MXU)
                         acc += Wy[:, chunk] @ s           (MXU)
    epilogue:            out = (acc/255 - mean)/std        (VPU)

Layout: frames are transposed to channel-planar [B, 3, H, W] first (a cheap
u8 reshuffle XLA fuses with the host transfer) so every VMEM block is a
well-tiled [rows, W] plane — keeping NHWC would put the 3-wide channel axis
in the 128-lane dimension and inflate VMEM 40x.  The grid is
(B, 3, H-chunks) with the accumulator carried across the chunk dimension;
chunk = 128 rows satisfies Mosaic's lane-divisibility rule for the Wy
blocks.  Output is [B, 3, oh, ow]; the NHWC transpose fuses downstream.

Parity vs the XLA/gather oracles: tests/test_pallas_preprocess.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from golfaction_tpu.ops import preprocess as pp


def _kernel(mean_ref, std_ref, fr_ref, wy_ref, wx_ref, out_ref, acc,
            *, n_chunks: int):
    c = pl.program_id(1)
    h = pl.program_id(2)

    @pl.when(h == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # Mosaic has no direct u8->bf16 cast; stage through int32/f32 (free on VPU).
    f = fr_ref[0, 0].astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    wy = wy_ref[0].astype(jnp.bfloat16)         # [oh, CH]
    wx = wx_ref[0].astype(jnp.bfloat16)         # [ow, Wp]
    # s = frame_plane @ Wxᵀ : [CH, Wp] x [ow, Wp] -> [CH, ow]
    s = jax.lax.dot_general(
        f, wx,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # acc += Wy_chunk @ s : [oh, CH] x [CH, ow]
    acc[:] += jax.lax.dot_general(
        wy, s.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == n_chunks - 1)
    def _():
        mean = mean_ref[c]
        std = std_ref[c]
        out_ref[0, 0] = (acc[:] * (1.0 / 255.0) - mean) / std


def crop_resize_normalize_pallas(
    frames: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: tuple[int, int],
    mean=pp.IMAGENET_MEAN,
    std=pp.IMAGENET_STD,
    chunk: int = 128,
    interpret=None,
) -> jnp.ndarray:
    """Fused warp+normalize.  frames [B,H,W,3] uint8 -> crops [B,oh,ow,3] f32.

    Semantics identical to ops.preprocess.crop_resize_normalize (zero border,
    unbiased corner-aligned sampling).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = frames.shape
    oh, ow = out_hw
    cy = pp._sample_coords(boxes, oh, axis=1)
    cx = pp._sample_coords(boxes, ow, axis=0)
    Wy = pp._interp_matrix(cy, H)                # [B, oh, H]
    Wx = pp._interp_matrix(cx, W)                # [B, ow, W]

    planar = jnp.transpose(frames, (0, 3, 1, 2))  # [B, 3, H, W] u8

    # Pad H to a chunk multiple and W to a lane multiple; padded columns of
    # Wy/Wx are zero so padded pixels contribute nothing.
    Hp = ((H + chunk - 1) // chunk) * chunk
    Wp = ((W + 127) // 128) * 128
    if Hp != H:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, Hp - H), (0, 0)))
        Wy = jnp.pad(Wy, ((0, 0), (0, 0), (0, Hp - H)))
    if Wp != W:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
        Wx = jnp.pad(Wx, ((0, 0), (0, 0), (0, Wp - W)))
    n_chunks = Hp // chunk

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                   # mean, std in SMEM
        grid=(B, 3, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, Wp), lambda b, c, h, *_: (b, c, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oh, chunk), lambda b, c, h, *_: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow, Wp), lambda b, c, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, oh, ow), lambda b, c, h, *_: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((oh, ow), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, oh, ow), jnp.float32),
        interpret=bool(interpret),
    )(mean_a, std_a, planar, Wy, Wx)
    # NHWC for the pose net; XLA fuses this transpose into the consumer.
    return jnp.transpose(out, (0, 2, 3, 1))
