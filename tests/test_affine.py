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


# ---------------------------------------------------------------------------
# Keypoint-seeded box tracking ops
# ---------------------------------------------------------------------------

def test_boxes_from_keypoints_contains_points_with_margin():
    rng = np.random.default_rng(0)
    kpts = rng.uniform(100, 300, (6, 17, 3)).astype(np.float32)
    boxes = affine.boxes_from_keypoints(jnp.asarray(kpts), (540, 960))
    b = np.asarray(boxes)
    xy = kpts[..., :2]
    lo, hi = xy.min(1), xy.max(1)
    np.testing.assert_allclose(b[:, :2], (lo + hi) / 2, atol=1e-4)
    assert (b[:, 2:] >= (hi - lo) * 1.2 - 1e-3).all()


def test_boxes_from_keypoints_min_size_floor():
    kpts = jnp.full((3, 17, 2), 200.0)  # degenerate: all joints same point
    b = np.asarray(affine.boxes_from_keypoints(kpts, (540, 960), min_size=64.0))
    assert (b[:, 2:] == 64.0).all()


def test_smooth_boxes_flattens_jitter_keeps_trend():
    t = np.arange(32, dtype=np.float32)
    clean = np.stack([100 + 2 * t, 200 + t, 80 + 0 * t, 120 + 0 * t], -1)
    noisy = clean + np.random.default_rng(1).normal(0, 5, clean.shape)
    sm = np.asarray(affine.smooth_boxes(jnp.asarray(noisy, jnp.float32), 9))
    # interior frames: smoothed is closer to the clean trend than the noise
    err_sm = np.abs(sm[6:-6] - clean[6:-6]).mean()
    err_noisy = np.abs(noisy[6:-6] - clean[6:-6]).mean()
    assert err_sm < err_noisy


def test_interp_boxes_linear_between_strides():
    bs = jnp.asarray([[0.0, 0, 10, 10], [8.0, 8, 10, 10], [16.0, 16, 10, 10]])
    out = np.asarray(affine.interp_boxes(bs, 4, 12))
    assert out.shape == (12, 4)
    np.testing.assert_allclose(out[0, 0], 0.0)
    np.testing.assert_allclose(out[2, 0], 4.0)   # halfway 0 -> 8
    np.testing.assert_allclose(out[4, 0], 8.0)
    np.testing.assert_allclose(out[11, 0], 16.0)  # holds last value
