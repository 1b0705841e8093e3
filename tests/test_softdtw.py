"""Soft-DTW: wavefront scan vs O(T²) NumPy oracle; gradient; path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import softdtw


def _rand_cost(rng, ta, tb):
    a = rng.normal(size=(ta, 8))
    b = rng.normal(size=(tb, 8))
    return np.asarray(
        softdtw.pairwise_sqdist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    )


@pytest.mark.parametrize("ta,tb", [(5, 5), (7, 12), (12, 7), (1, 9), (9, 1), (1, 1)])
@pytest.mark.parametrize("gamma", [0.01, 0.1, 1.0])
def test_cost_matches_oracle(ta, tb, gamma):
    rng = np.random.default_rng(ta * 100 + tb)
    D = _rand_cost(rng, ta, tb)
    ref, _ = softdtw.softdtw_reference(D, gamma)
    got = float(softdtw.softdtw_cost(jnp.asarray(D), gamma))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ta,tb", [(6, 6), (5, 9)])
def test_gradient_matches_oracle(ta, tb):
    gamma = 0.1
    rng = np.random.default_rng(0)
    D = _rand_cost(rng, ta, tb)
    _, R = softdtw.softdtw_reference(D, gamma)
    E_ref = softdtw.softdtw_grad_reference(D, R, gamma)
    grad = jax.grad(lambda d: softdtw.softdtw_cost(d, gamma))(jnp.asarray(D))
    np.testing.assert_allclose(np.asarray(grad), E_ref, rtol=1e-3, atol=1e-4)


def test_gradient_matches_finite_differences():
    gamma = 0.5
    rng = np.random.default_rng(1)
    # float64 so the +-eps perturbation isn't destroyed by float32 rounding.
    D = _rand_cost(rng, 4, 5).astype(np.float64)
    grad = np.asarray(jax.grad(lambda d: softdtw.softdtw_cost(d, gamma))(jnp.asarray(D)))
    eps = 1e-3
    for i, j in [(0, 0), (2, 3), (3, 4), (1, 2)]:
        Dp, Dm = D.copy(), D.copy()
        Dp[i, j] += eps
        Dm[i, j] -= eps
        fd = (
            softdtw.softdtw_reference(Dp, gamma)[0]
            - softdtw.softdtw_reference(Dm, gamma)[0]
        ) / (2 * eps)
        np.testing.assert_allclose(grad[i, j], fd, rtol=5e-3, atol=1e-4)


def test_soft_alignment_is_distribution_like():
    # E sums to expected path cardinality-ish; every row/col gets some mass;
    # entries are non-negative.
    rng = np.random.default_rng(2)
    D = jnp.asarray(_rand_cost(rng, 10, 14))
    cost, E = softdtw.softdtw_with_alignment(D, 0.1)
    E = np.asarray(E)
    assert (E >= -1e-6).all()
    assert E[0, 0] > 0.5 and E[-1, -1] > 0.99
    assert (E.sum(axis=1) > 0.2).all() and (E.sum(axis=0) > 0.2).all()


@pytest.mark.parametrize("ta,tb", [(6, 6), (5, 11), (11, 5)])
def test_hard_path_matches_oracle(ta, tb):
    rng = np.random.default_rng(ta + tb)
    D = _rand_cost(rng, ta, tb)
    ref_path = softdtw.dtw_path_reference(D)
    path, length = softdtw.dtw_path(jnp.asarray(D))
    path = np.asarray(path)
    length = int(length)
    assert length == len(ref_path)
    np.testing.assert_array_equal(path[:length], ref_path)
    assert (path[length:] == -1).all()


def test_path_monotonic_and_bounded():
    rng = np.random.default_rng(5)
    D = jnp.asarray(_rand_cost(rng, 20, 30))
    path, length = softdtw.dtw_path(D)
    p = np.asarray(path)[: int(length)]
    assert tuple(p[0]) == (0, 0) and tuple(p[-1]) == (19, 29)
    steps = np.diff(p, axis=0)
    assert ((steps == 0) | (steps == 1)).all()
    assert (steps.sum(axis=1) >= 1).all()


def test_batched_and_jit():
    rng = np.random.default_rng(7)
    Ds = jnp.asarray(np.stack([_rand_cost(rng, 8, 9) for _ in range(4)]))
    costs = jax.jit(softdtw.softdtw_cost_batch, static_argnums=1)(Ds, 0.1)
    for k in range(4):
        ref, _ = softdtw.softdtw_reference(np.asarray(Ds[k]), 0.1)
        np.testing.assert_allclose(float(costs[k]), ref, rtol=1e-4, atol=1e-4)


def test_gamma_to_zero_approaches_hard_dtw():
    rng = np.random.default_rng(9)
    D = _rand_cost(rng, 8, 8)
    hard = float(softdtw._hard_forward(jnp.asarray(D))[-1, -1])
    soft = float(softdtw.softdtw_cost(jnp.asarray(D), 0.001))
    assert abs(soft - hard) < 0.05 * abs(hard) + 0.05
    assert soft <= hard + 1e-5  # softmin is a lower bound of min


def test_warp_by_path_averages_and_pads():
    # ref frames 0..3 as distinct values; path aligns clip frames
    # t=0 -> ref {0, 1}, t=1 -> ref {2}, t=2 -> ref {3}; clip padded to T=5.
    ref = jnp.arange(4, dtype=jnp.float32)[:, None, None]  # [4, 1, 1]
    path = jnp.asarray(
        [[0, 0], [0, 1], [1, 2], [2, 3], [-1, -1], [-1, -1], [-1, -1],
         [-1, -1]], jnp.int32)
    out = softdtw.warp_by_path(ref, path, 4, 5)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]),
                               [0.5, 2.0, 3.0, 0.0, 0.0])
