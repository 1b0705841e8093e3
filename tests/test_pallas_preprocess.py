"""Pallas fused preprocess kernel vs XLA fast path / gather oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import preprocess
from golfaction_tpu.ops.pallas import preprocess_kernel as ppk


def _frames_boxes(rng, b=2, h=120, w=160):
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3)), dtype=jnp.uint8)
    boxes = jnp.asarray(
        np.stack(
            [rng.uniform(40, w - 40, b), rng.uniform(40, h - 40, b),
             rng.uniform(30, 60, b), rng.uniform(40, 80, b)], axis=-1,
        ), jnp.float32,
    )
    return frames, boxes


@pytest.mark.slow
def test_matches_oracle():
    rng = np.random.default_rng(0)
    frames, boxes = _frames_boxes(rng)
    ref = preprocess.crop_resize_normalize_reference(frames, boxes, (64, 48))
    got = ppk.crop_resize_normalize_pallas(frames, boxes, (64, 48), chunk=32)
    # bf16 matmuls inside the kernel: tolerance matches the bf16 XLA path.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.06)


@pytest.mark.slow
def test_h_padding_path():
    # H=100 not divisible by chunk=32 exercises row padding; W=144 lane pad.
    rng = np.random.default_rng(1)
    frames, boxes = _frames_boxes(rng, b=1, h=100, w=144)
    ref = preprocess.crop_resize_normalize_reference(frames, boxes, (32, 32))
    got = ppk.crop_resize_normalize_pallas(frames, boxes, (32, 32), chunk=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.06)


def test_zero_border_semantics():
    frames = jnp.full((1, 50, 64, 3), 255, dtype=jnp.uint8)
    boxes = jnp.array([[0.0, 0.0, 60.0, 60.0]])  # hangs off top-left
    ref = preprocess.crop_resize_normalize_reference(frames, boxes, (32, 32))
    got = ppk.crop_resize_normalize_pallas(frames, boxes, (32, 32), chunk=50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.06)
