"""Pallas soft-DTW wavefront kernel vs oracle / lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import softdtw
from golfaction_tpu.ops.pallas import softdtw_kernel as pk


def _rand_D(rng, b, ta, tb):
    a = rng.normal(size=(b, ta, 8)).astype(np.float32)
    c = rng.normal(size=(b, tb, 8)).astype(np.float32)
    return softdtw.pairwise_sqdist(jnp.asarray(a), jnp.asarray(c))


def test_skew_unskew_roundtrip():
    rng = np.random.default_rng(0)
    D = _rand_D(rng, 2, 7, 11)
    S = pk.skew(D)
    assert S.shape == (2, 17, 7)
    back = pk.unskew(S, 7, 11)
    np.testing.assert_allclose(np.asarray(back), np.asarray(D), atol=0)


@pytest.mark.parametrize("ta,tb", [(6, 6), (5, 12), (12, 5)])
def test_cost_matches_oracle(ta, tb):
    rng = np.random.default_rng(ta + tb)
    D = _rand_D(rng, 3, ta, tb)
    cost, R = pk.softdtw_table_pallas(D, 0.1)
    for k in range(3):
        ref, Rref = softdtw.softdtw_reference(np.asarray(D[k]), 0.1)
        np.testing.assert_allclose(float(cost[k]), ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(R[k]), Rref[1:, 1:], rtol=1e-4, atol=1e-3
        )


@pytest.mark.slow
def test_gradient_matches_scan_implementation():
    rng = np.random.default_rng(1)
    D = _rand_D(rng, 2, 6, 9)
    g_pallas = jax.grad(lambda d: pk.softdtw_cost_pallas(d, 0.1).sum())(D)
    g_scan = jax.grad(
        lambda d: softdtw.softdtw_cost_batch(d, 0.1).sum()
    )(D)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_scan), rtol=1e-3, atol=1e-5
    )


@pytest.mark.slow
def test_path_matches_oracle_with_lengths():
    rng = np.random.default_rng(2)
    D = _rand_D(rng, 2, 10, 12)
    la = jnp.asarray([10, 7], jnp.int32)
    lb = jnp.asarray([12, 9], jnp.int32)
    path, length = pk.dtw_path_pallas(D, la, lb)
    for k in range(2):
        ref = softdtw.dtw_path_reference(np.asarray(D[k])[: int(la[k]), : int(lb[k])])
        L = int(length[k])
        assert L == len(ref)
        np.testing.assert_array_equal(np.asarray(path[k])[:L], ref)


def test_hard_gamma_zero():
    rng = np.random.default_rng(3)
    D = _rand_D(rng, 1, 8, 8)
    cost, _ = pk.softdtw_table_pallas(D, 0.0)
    hard = float(softdtw._hard_forward(D[0])[-1, -1])
    np.testing.assert_allclose(float(cost[0]), hard, rtol=1e-5)


def test_long_sequence_fallback_path():
    # Beyond the VMEM budget the implementation falls back to the scan
    # wavefront; results must stay identical.
    assert pk.fits_vmem(64, 64)
    assert not pk.fits_vmem(2000, 2000)
    rng = np.random.default_rng(9)
    D = _rand_D(rng, 1, 8, 8)
    cost_kernel, _ = pk.softdtw_table_pallas(D, 0.1)
    # Force the fallback by shrinking the budget.
    orig = pk._VMEM_BUDGET_BYTES
    try:
        pk._VMEM_BUDGET_BYTES = 0
        cost_fb, _ = pk.softdtw_table_pallas(D, 0.1)
        path_fb, len_fb = pk.dtw_path_pallas(D)
    finally:
        pk._VMEM_BUDGET_BYTES = orig
    np.testing.assert_allclose(np.asarray(cost_fb), np.asarray(cost_kernel),
                               rtol=1e-5)
    ref = softdtw.dtw_path_reference(np.asarray(D[0]))
    np.testing.assert_array_equal(np.asarray(path_fb[0])[: int(len_fb[0])], ref)


def test_masked_cost_matches_trimmed_oracle():
    # Masked batched cost (the analyze_batch alignment path on TPU).
    rng = np.random.default_rng(7)
    D = _rand_D(rng, 3, 10, 13)
    la = np.array([10, 7, 4], np.int32)
    lb = np.array([13, 9, 13], np.int32)
    got = pk.softdtw_cost_masked_pallas(D, jnp.asarray(la), jnp.asarray(lb), 0.1)
    for k in range(3):
        ref, _ = softdtw.softdtw_reference(
            np.asarray(D[k])[: la[k], : lb[k]], 0.1
        )
        np.testing.assert_allclose(float(got[k]), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ta,tb", [(6, 6), (5, 12), (12, 5)])
def test_backward_kernel_matches_scan_E(ta, tb):
    """Pallas reverse-wavefront E vs the scan E-recursion, batched."""
    rng = np.random.default_rng(100 + ta * tb)
    D = _rand_D(rng, 3, ta, tb)
    cost, E = pk.softdtw_alignment_pallas(D, 0.1)
    for k in range(3):
        R = softdtw._forward_scan(D[k], 0.1)
        E_ref = softdtw._backward_scan(D[k], R, 0.1)
        np.testing.assert_allclose(
            np.asarray(E[k]), np.asarray(E_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(float(cost[k]), float(R[-1, -1]),
                                   rtol=1e-5, atol=1e-5)


def test_backward_kernel_grad_vs_oracle():
    """jax.grad through softdtw_cost_pallas (Pallas fwd+bwd) vs numerical
    gradient of the NumPy oracle on a tiny problem."""
    rng = np.random.default_rng(7)
    D = _rand_D(rng, 1, 4, 5)
    gamma = 0.2
    g = jax.grad(lambda d: pk.softdtw_cost_pallas(d, gamma).sum())(D)
    Dn = np.asarray(D[0], np.float64)
    eps = 1e-4
    g_num = np.zeros_like(Dn)
    for i in range(Dn.shape[0]):
        for j in range(Dn.shape[1]):
            dp, dm = Dn.copy(), Dn.copy()
            dp[i, j] += eps
            dm[i, j] -= eps
            cp, _ = softdtw.softdtw_reference(dp, gamma)
            cm, _ = softdtw.softdtw_reference(dm, gamma)
            g_num[i, j] = (cp - cm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g[0]), g_num, rtol=1e-3, atol=1e-4)


def test_backward_kernel_large_falls_back():
    """Beyond the bwd VMEM budget the alignment path uses the scan pair."""
    assert not pk.fits_vmem_bwd(1024, 1024)
    assert pk.fits_vmem_bwd(128, 128)


def test_lane_group_padding_parity():
    """G>1 lane batching (8 pairs per grid step) with a batch that is NOT a
    multiple of G: padded pairs must not perturb real ones, forward or E."""
    assert pk._lane_group(6 + 6 - 1, 6, 2) == 8   # tiny tables -> full vreg
    rng = np.random.default_rng(31)
    D = _rand_D(rng, 5, 6, 6)                     # B=5 -> pads to 8
    cost, E = pk.softdtw_alignment_pallas(D, 0.1)
    assert cost.shape == (5,) and E.shape == (5, 6, 6)
    for k in range(5):
        R = softdtw._forward_scan(D[k], 0.1)
        np.testing.assert_allclose(float(cost[k]), float(R[-1, -1]),
                                   rtol=1e-5, atol=1e-5)
        E_ref = softdtw._backward_scan(D[k], R, 0.1)
        np.testing.assert_allclose(np.asarray(E[k]), np.asarray(E_ref),
                                   rtol=1e-4, atol=1e-5)
