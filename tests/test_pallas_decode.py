"""Pallas decode kernel vs pure-JAX oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import heatmap
from golfaction_tpu.ops.pallas import decode_kernel


def _gaussians(centers, hw, sigma=2.0):
    t, _ = heatmap.make_heatmap_targets(jnp.asarray(centers, jnp.float32), hw, sigma)
    return t


@pytest.mark.parametrize("shape", [(1, 17), (3, 17), (2, 4)])
def test_matches_oracle_on_gaussians(shape):
    rng = np.random.default_rng(0)
    centers = rng.uniform(3, 40, (*shape, 2)).astype(np.float32)
    hm = _gaussians(centers, (64, 48))
    ref = np.asarray(heatmap.decode_heatmaps(hm, method="udp"))
    got = np.asarray(decode_kernel.decode_heatmaps_pallas(hm, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_matches_oracle_on_noise():
    # Arbitrary (non-gaussian) heatmaps, including negatives and border peaks.
    rng = np.random.default_rng(1)
    hm = jnp.asarray(rng.normal(size=(5, 17, 64, 48)), jnp.float32)
    ref = np.asarray(heatmap.decode_heatmaps(hm, method="udp"))
    got = np.asarray(decode_kernel.decode_heatmaps_pallas(hm, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_argmax_tie_breaking_matches():
    # Two identical peaks: both paths must pick the same (first) one.
    hm = np.zeros((1, 1, 64, 48), np.float32)
    hm[0, 0, 10, 10] = 1.0
    hm[0, 0, 40, 20] = 1.0
    ref = np.asarray(heatmap.decode_heatmaps(jnp.asarray(hm), method="udp"))
    got = np.asarray(decode_kernel.decode_heatmaps_pallas(jnp.asarray(hm), interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_row_padding_boundary():
    # M not a multiple of block_rows exercises the pad/trim path.
    rng = np.random.default_rng(2)
    hm = jnp.asarray(rng.normal(size=(7, 64, 48)), jnp.float32)
    ref = np.asarray(heatmap.decode_heatmaps(hm, method="udp"))
    got = np.asarray(
        decode_kernel.decode_heatmaps_pallas(hm, block_rows=4, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)
