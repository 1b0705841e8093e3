"""Heatmap decode: sub-pixel exactness on synthetic Gaussians, round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from golfaction_tpu.ops import heatmap


def _gaussian_heatmaps(centers, hw, sigma=2.0):
    """centers [..., K, 2] sub-pixel -> heatmaps [..., K, H, W]."""
    t, _ = heatmap.make_heatmap_targets(jnp.asarray(centers, jnp.float32), hw, sigma)
    return t


def test_argmax_decode_integer_peaks():
    centers = jnp.array([[[10.0, 20.0], [47.0, 63.0], [0.0, 0.0]]])
    hm = _gaussian_heatmaps(centers, (64, 48))
    kpts = heatmap.decode_heatmaps(hm, method="argmax")
    np.testing.assert_allclose(np.asarray(kpts[..., :2]), np.asarray(centers), atol=0)
    assert (np.asarray(kpts[..., 2]) > 0.99).all()


def test_udp_decode_subpixel_exact():
    # DARK refinement is exact for an ideal Gaussian: sub-pixel error << 0.05px.
    rng = np.random.default_rng(0)
    centers = rng.uniform(5, 40, (4, 17, 2)).astype(np.float32)
    hm = _gaussian_heatmaps(centers, (64, 48), sigma=2.0)
    kpts = heatmap.decode_heatmaps(hm, method="udp")
    err = np.abs(np.asarray(kpts[..., :2]) - centers)
    assert err.max() < 0.01, f"max sub-pixel error {err.max()}"


def test_quarter_decode_improves_on_argmax():
    rng = np.random.default_rng(1)
    centers = rng.uniform(5, 40, (8, 17, 2)).astype(np.float32)
    hm = _gaussian_heatmaps(centers, (64, 48))
    err_am = np.abs(
        np.asarray(heatmap.decode_heatmaps(hm, "argmax")[..., :2]) - centers
    ).mean()
    err_q = np.abs(
        np.asarray(heatmap.decode_heatmaps(hm, "quarter")[..., :2]) - centers
    ).mean()
    assert err_q < err_am


def test_udp_edge_peak_no_nan():
    # Peak on the border: Hessian guard must kick in, offsets stay finite.
    centers = jnp.array([[[0.0, 0.0], [47.0, 0.0], [0.0, 63.0], [47.0, 63.0]]])
    hm = _gaussian_heatmaps(centers, (64, 48))
    kpts = np.asarray(heatmap.decode_heatmaps(hm, method="udp"))
    assert np.isfinite(kpts).all()
    np.testing.assert_allclose(kpts[..., :2], np.asarray(centers), atol=0.5)


def test_image_round_trip():
    # image kpts -> heatmap coords -> image kpts is identity.
    rng = np.random.default_rng(2)
    boxes = jnp.asarray(
        np.stack(
            [rng.uniform(400, 1500, 6), rng.uniform(300, 800, 6),
             np.full(6, 300.0), np.full(6, 400.0)], axis=-1
        ), jnp.float32,
    )
    kpts_img = jnp.asarray(
        np.concatenate(
            [rng.uniform(300, 1500, (6, 17, 2)), np.ones((6, 17, 1))], axis=-1
        ), jnp.float32,
    )
    hm_kpts = heatmap.image_keypoints_to_heatmap(kpts_img, boxes, (64, 48), (256, 192))
    back = heatmap.keypoints_to_image(hm_kpts, boxes, (64, 48), (256, 192))
    np.testing.assert_allclose(np.asarray(back), np.asarray(kpts_img), atol=1e-2)


def test_decode_to_image_end_to_end():
    # Keypoints placed in image space survive target-gen + decode + map-back.
    boxes = jnp.array([[960.0, 540.0, 300.0, 400.0]])
    kpts_img = jnp.array([[[900.0, 450.0, 1.0], [1000.0, 600.0, 1.0]]])
    hm_kpts = heatmap.image_keypoints_to_heatmap(kpts_img, boxes, (64, 48), (256, 192))
    hm, w = heatmap.make_heatmap_targets(hm_kpts[..., :2], (64, 48))
    assert (np.asarray(w) == 1).all()
    decoded = heatmap.decode_heatmaps(hm, method="udp")
    out = heatmap.keypoints_to_image(decoded, boxes, (64, 48), (256, 192))
    # Heatmap stride is ~6px/heatmap-px here; sub-pixel decode lands within 0.5px.
    np.testing.assert_allclose(
        np.asarray(out[..., :2]), np.asarray(kpts_img[..., :2]), atol=0.5
    )


def test_decode_jit_compatible():
    hm = _gaussian_heatmaps(jnp.array([[[10.0, 20.0]]]), (64, 48))
    fn = jax.jit(lambda h: heatmap.decode_heatmaps(h, method="udp"))
    np.testing.assert_allclose(
        np.asarray(fn(hm)), np.asarray(heatmap.decode_heatmaps(hm, "udp")), rtol=1e-6
    )


def test_moment_stats_single_gaussian():
    centers = jnp.array([[[20.0, 30.0], [40.0, 10.0]]])
    sigma = 2.0
    hm = _gaussian_heatmaps(centers, (64, 48), sigma)
    m = np.asarray(heatmap.moment_stats(hm, radius=8.0))
    np.testing.assert_allclose(m[..., :2], np.asarray(centers), atol=0.05)
    # Windowed Gaussian variance is slightly below sigma^2 (tail clipping).
    np.testing.assert_allclose(m[..., 2], sigma**2, rtol=0.1)
    np.testing.assert_allclose(m[..., 4], sigma**2, rtol=0.1)
    np.testing.assert_allclose(m[..., 3], 0.0, atol=0.05)


def test_moment_stats_merged_mixture_reads_separation():
    # Two sigma-2 components 2.6 px apart along x merge into ONE blob
    # (below the 2-sigma bimodality threshold) -- the regime where the
    # mode decode fails.  The second moment must still expose the
    # separation: var_x ~= sigma^2 + w(1-w) d^2.
    sigma, d, w = 2.0, 2.6, 0.35
    a = _gaussian_heatmaps(jnp.array([[[20.0, 30.0]]]), (64, 48), sigma)
    b = _gaussian_heatmaps(jnp.array([[[20.0 + d, 30.0]]]), (64, 48), sigma)
    hm = (1 - w) * a + w * b
    m = np.asarray(heatmap.moment_stats(hm, radius=8.0))[0, 0]
    expect_var = sigma**2 + w * (1 - w) * d**2
    assert abs(m[2] - expect_var) < 0.35, (m[2], expect_var)
    # ... while the y variance stays at the single-component value.
    assert abs(m[4] - sigma**2) < 0.35, m[4]
    # Mean moved only w*d (the attenuated decode).
    assert abs(m[0] - (20.0 + w * d)) < 0.1


def test_moment_stats_window_excludes_far_ghost():
    a = _gaussian_heatmaps(jnp.array([[[20.0, 30.0]]]), (64, 48), 2.0)
    ghost = 0.5 * _gaussian_heatmaps(jnp.array([[[40.0, 10.0]]]), (64, 48), 2.0)
    m = np.asarray(heatmap.moment_stats(a + ghost, radius=8.0))[0, 0]
    np.testing.assert_allclose(m[:2], [20.0, 30.0], atol=0.05)
    np.testing.assert_allclose(m[2], 4.0, rtol=0.1)
