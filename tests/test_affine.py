"""Affine transform utilities: inverse/compose round-trips."""

import jax.numpy as jnp
import numpy as np

from golfaction_tpu.ops import affine


def _rand_boxes(rng, n):
    cx = rng.uniform(200, 1700, n)
    cy = rng.uniform(200, 900, n)
    w = rng.uniform(100, 600, n)
    h = rng.uniform(100, 600, n)
    return jnp.asarray(np.stack([cx, cy, w, h], axis=-1), dtype=jnp.float32)


def test_box_to_center_scale_aspect():
    rng = np.random.default_rng(0)
    boxes = _rand_boxes(rng, 16)
    out = affine.box_to_center_scale(boxes, aspect_ratio=192 / 256)
    np.testing.assert_allclose(out[:, 2] / out[:, 3], 192 / 256, rtol=1e-5)
    # Center preserved.
    np.testing.assert_allclose(out[:, :2], boxes[:, :2], rtol=1e-6)
    # Expanded box contains the original.
    assert (out[:, 2] >= boxes[:, 2] - 1e-3).all()
    assert (out[:, 3] >= boxes[:, 3] - 1e-3).all()


def test_invert_round_trip():
    rng = np.random.default_rng(1)
    boxes = _rand_boxes(rng, 8)
    mat = affine.crop_transform(boxes, (256, 192))
    inv = affine.invert_transform(mat)
    pts = jnp.asarray(rng.uniform(0, 200, (8, 10, 2)), dtype=jnp.float32)
    back = affine.apply_transform(inv, affine.apply_transform(mat, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_crop_transform_corners():
    # Output corner (0,0) maps to box top-left; (W-1,H-1) to bottom-right.
    boxes = jnp.array([[100.0, 50.0, 80.0, 40.0]])
    mat = affine.crop_transform(boxes, (256, 192))
    corners = jnp.array([[[0.0, 0.0], [191.0, 255.0]]])
    out = affine.apply_transform(mat, corners)
    np.testing.assert_allclose(
        np.asarray(out[0]), [[60.0, 30.0], [140.0, 70.0]], atol=1e-4
    )


def test_compose_matches_sequential():
    rng = np.random.default_rng(2)
    a = affine.crop_transform(_rand_boxes(rng, 4), (256, 192))
    b = affine.crop_transform(_rand_boxes(rng, 4), (64, 48))
    pts = jnp.asarray(rng.uniform(0, 48, (4, 5, 2)), dtype=jnp.float32)
    seq = affine.apply_transform(a, affine.apply_transform(b, pts))
    fused = affine.apply_transform(affine.compose(a, b), pts)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq), rtol=1e-4, atol=1e-2)
