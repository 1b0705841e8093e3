"""Fused int8 GN+requant epilogue kernel vs pure-jnp oracle (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops.pallas import requant_kernel as rk


def _mk(rng, n=2, h=8, w=16, c=32):
    y = jnp.asarray(rng.integers(-20000, 20000, (n, h, w, c)), jnp.int32)
    sy = jnp.asarray(rng.uniform(1e-4, 3e-4, (c,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1.0, 0.1, (c,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0.0, 0.1, (c,)), jnp.float32)
    return y, sy, gamma, beta


@pytest.mark.parametrize("out_scale", [None, 0.05])
@pytest.mark.parametrize("relu", [True, False])
def test_epilogue_matches_oracle_no_residual(out_scale, relu):
    rng = np.random.default_rng(0)
    y, sy, gamma, beta = _mk(rng)
    got = rk.requant_epilogue_pallas(y, sy, gamma, beta, groups=8,
                                     relu=relu, out_scale=out_scale,
                                     interpret=True)
    ref = rk.requant_epilogue_reference(y, sy, gamma, beta, groups=8,
                                        relu=relu, out_scale=out_scale)
    if out_scale is None:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
    else:
        # int8 outputs: allow off-by-one on round boundaries
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.99


def test_epilogue_int8_identity_residual():
    rng = np.random.default_rng(1)
    y, sy, gamma, beta = _mk(rng)
    r = jnp.asarray(rng.integers(-127, 128, y.shape), jnp.int8)
    got = rk.requant_epilogue_pallas(y, sy, gamma, beta, groups=8,
                                     residual=r, res_scale=0.02,
                                     out_scale=0.04, interpret=True)
    ref = rk.requant_epilogue_reference(y, sy, gamma, beta, groups=8,
                                        residual=r, res_scale=0.02,
                                        out_scale=0.04)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert (diff <= 1).all() and (diff == 0).mean() > 0.99


def test_epilogue_conv_residual_with_own_gn():
    rng = np.random.default_rng(2)
    y, sy, gamma, beta = _mk(rng)
    r = jnp.asarray(rng.integers(-20000, 20000, y.shape), jnp.int32)
    rs = jnp.asarray(rng.uniform(1e-4, 3e-4, (y.shape[-1],)), jnp.float32)
    rg = jnp.asarray(rng.normal(1.0, 0.1, (y.shape[-1],)), jnp.float32)
    rb = jnp.asarray(rng.normal(0.0, 0.1, (y.shape[-1],)), jnp.float32)
    got = rk.requant_epilogue_pallas(y, sy, gamma, beta, groups=8,
                                     residual=r, res_scale=rs,
                                     res_gamma=rg, res_beta=rb,
                                     out_scale=0.04, interpret=True)
    ref = rk.requant_epilogue_reference(y, sy, gamma, beta, groups=8,
                                        residual=r, res_scale=rs,
                                        res_gamma=rg, res_beta=rb,
                                        out_scale=0.04)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert (diff <= 1).all() and (diff == 0).mean() > 0.99


def test_epilogue_odd_group_count_and_shape():
    rng = np.random.default_rng(3)
    y, sy, gamma, beta = _mk(rng, n=1, h=5, w=7, c=16)
    got = rk.requant_epilogue_pallas(y, sy, gamma, beta, groups=4,
                                     out_scale=0.03, interpret=True)
    ref = rk.requant_epilogue_reference(y, sy, gamma, beta, groups=4,
                                        out_scale=0.03)
    assert got.shape == (1, 5, 7, 16) and got.dtype == jnp.int8
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(ref, np.int32))
    assert (diff <= 1).all()
