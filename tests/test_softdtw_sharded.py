"""Sharded (row-band systolic) soft-DTW vs the NumPy oracle (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import softdtw
from golfaction_tpu.ops.softdtw_sharded import softdtw_cost_sharded
from golfaction_tpu.parallel import mesh as mesh_mod
from golfaction_tpu import config as cfg_mod

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return mesh_mod.make_mesh(cfg_mod.MeshConfig())


@pytest.mark.parametrize("shape,gamma", [((64, 48), 0.1), ((64, 64), 1.0)])
def test_sharded_cost_matches_oracle(shape, gamma):
    rng = np.random.default_rng(3)
    D = rng.uniform(0, 2, shape).astype(np.float32)
    want, _ = softdtw.softdtw_reference(D.astype(np.float64), gamma)
    got = float(softdtw_cost_sharded(jnp.asarray(D), gamma, _mesh()))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_sharded_cost_nonmultiple_lengths():
    # Ta=61 rows pad to 8 bands of 8; Tb=45 pads inside the column chunks.
    rng = np.random.default_rng(5)
    D = rng.uniform(0, 3, (61, 45)).astype(np.float32)
    want, _ = softdtw.softdtw_reference(D.astype(np.float64), 0.3)
    got = float(softdtw_cost_sharded(jnp.asarray(D), 0.3, _mesh()))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_sharded_cost_more_col_chunks():
    rng = np.random.default_rng(7)
    D = rng.uniform(0, 1, (32, 96)).astype(np.float32)
    want, _ = softdtw.softdtw_reference(D.astype(np.float64), 0.5)
    got = float(softdtw_cost_sharded(jnp.asarray(D), 0.5, _mesh(),
                                     col_chunks=12))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_sharded_gradient_matches_e_recursion():
    # jax.grad through the scan/ppermute pipeline must equal the
    # Cuturi–Blondel E matrix (the hand-derived soft-DTW gradient).
    rng = np.random.default_rng(13)
    D = rng.uniform(0, 2, (32, 24)).astype(np.float32)
    gamma = 0.5
    _, R = softdtw.softdtw_reference(D.astype(np.float64), gamma)
    want = softdtw.softdtw_grad_reference(D.astype(np.float64), R, gamma)
    mesh = _mesh()
    got = jax.grad(
        lambda d: softdtw_cost_sharded(d, gamma, mesh))(jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_sharded_matches_single_device_scan():
    # Agreement with the production single-device wavefront, not just the
    # float64 oracle (same f32 softmin conventions).
    rng = np.random.default_rng(11)
    D = rng.uniform(0, 2, (40, 40)).astype(np.float32)
    want = float(softdtw.softdtw_cost(jnp.asarray(D), 0.2))
    got = float(softdtw_cost_sharded(jnp.asarray(D), 0.2, _mesh()))
    np.testing.assert_allclose(got, want, rtol=1e-5)
