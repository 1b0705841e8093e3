"""Fused GCN block kernel vs the flax model (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.config import GCNConfig
from golfaction_tpu.models import gcn as gcn_mod
from golfaction_tpu.ops.pallas import gcn_kernel as gk

CFG = GCNConfig(block_channels=(16, 32), temporal_branches=((3, 1), (3, 2)),
                dropout=0.0, dtype="float32")


@pytest.fixture(scope="module")
def setup():
    model = gcn_mod.create_gcn_model(CFG)
    T = 12
    x = jax.random.normal(jax.random.key(0), (2, T, 17, 3))
    valid = jnp.stack([
        jnp.ones((T,), bool),
        jnp.arange(T) < 9,          # one padded clip
    ])
    params = model.init(jax.random.key(1), x, valid)
    return model, params, x, valid


def test_forward_matches_flax(setup):
    model, params, x, valid = setup
    ref = model.apply(params, x, valid)
    got = gk.gcn_forward_pallas(params, CFG, x, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_padding_isolation(setup):
    model, params, x, valid = setup
    base = gk.gcn_forward_pallas(params, CFG, x, valid)
    x2 = x.at[1, 9:].set(77.0)      # poke padded frames of clip 1
    pert = gk.gcn_forward_pallas(params, CFG, x2, valid)
    np.testing.assert_allclose(np.asarray(base[1, :9]), np.asarray(pert[1, :9]),
                               atol=1e-4)


@pytest.mark.slow
def test_default_config_shapes():
    # Default 6-block config (the production model) builds and runs.
    cfg = GCNConfig(dropout=0.0, dtype="float32")
    model = gcn_mod.create_gcn_model(cfg)
    T = 8
    x = jax.random.normal(jax.random.key(2), (1, T, 17, 3))
    valid = jnp.ones((1, T), bool)
    params = model.init(jax.random.key(3), x, valid)
    ref = model.apply(params, x, valid)
    got = gk.gcn_forward_pallas(params, cfg, x, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
