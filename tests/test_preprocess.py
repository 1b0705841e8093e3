"""Preprocess: separable-matmul fast path vs gather oracle; normalization."""

import jax.numpy as jnp
import numpy as np

from golfaction_tpu.ops import preprocess


def _frames_boxes(rng, b=2, h=120, w=160):
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3)), dtype=jnp.uint8)
    boxes = jnp.asarray(
        np.stack(
            [rng.uniform(40, w - 40, b), rng.uniform(40, h - 40, b),
             rng.uniform(30, 60, b), rng.uniform(40, 80, b)], axis=-1,
        ), jnp.float32,
    )
    return frames, boxes


def test_fast_path_matches_oracle():
    rng = np.random.default_rng(0)
    frames, boxes = _frames_boxes(rng)
    ref = preprocess.crop_resize_normalize_reference(frames, boxes, (64, 48))
    fast = preprocess.crop_resize_normalize(frames, boxes, (64, 48))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-4)


def test_out_of_frame_zero_border():
    rng = np.random.default_rng(1)
    frames = jnp.full((1, 50, 50, 3), 255, dtype=jnp.uint8)
    # Box hanging off the top-left corner: out-of-frame area decodes as if the
    # source were zero there (i.e. strongly negative after normalization).
    boxes = jnp.array([[0.0, 0.0, 60.0, 60.0]])
    ref = preprocess.crop_resize_normalize_reference(frames, boxes, (32, 32))
    fast = preprocess.crop_resize_normalize(frames, boxes, (32, 32))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-4)
    mean = jnp.asarray(preprocess.IMAGENET_MEAN)
    std = jnp.asarray(preprocess.IMAGENET_STD)
    expect_zero = np.asarray((0.0 - mean) / std)
    np.testing.assert_allclose(np.asarray(fast[0, 0, 0]), expect_zero, atol=1e-3)


def test_identity_crop_preserves_pixels():
    # A box exactly covering the frame with out size == frame size is identity.
    rng = np.random.default_rng(2)
    h = w = 32
    frames = jnp.asarray(rng.integers(0, 256, (1, h, w, 3)), dtype=jnp.uint8)
    boxes = jnp.array([[(w - 1) / 2, (h - 1) / 2, float(w - 1), float(h - 1)]])
    out = preprocess.crop_resize_normalize(
        frames, boxes, (h, w), mean=(0, 0, 0), std=(1 / 255, 1 / 255, 1 / 255)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(frames, dtype=np.float32), atol=1e-2
    )


def test_bf16_path_close():
    rng = np.random.default_rng(3)
    frames, boxes = _frames_boxes(rng)
    ref = preprocess.crop_resize_normalize(frames, boxes, (64, 48))
    bf = preprocess.crop_resize_normalize(frames, boxes, (64, 48), dtype=jnp.bfloat16)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf, dtype=np.float32), np.asarray(ref), atol=0.1
    )
