"""GCN action segmentation: shapes, padding-mask isolation, normalization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.config import GCNConfig
from golfaction_tpu.models import gcn

TINY = GCNConfig(
    block_channels=(16, 32),
    temporal_branches=((3, 1), (3, 2)),
    dropout=0.0,
    dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = gcn.create_gcn_model(TINY)
    x = jnp.zeros((1, 8, TINY.num_joints, TINY.in_channels))
    valid = jnp.ones((1, 8), bool)
    params = model.init(jax.random.key(0), x, valid)
    return model, params


@pytest.mark.slow
def test_output_shape(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(1), (2, 16, TINY.num_joints, 3))
    valid = jnp.ones((2, 16), bool)
    logits = model.apply(params, x, valid)
    assert logits.shape == (2, 16, TINY.num_phases)
    assert logits.dtype == jnp.float32


@pytest.mark.slow
def test_padding_does_not_leak(model_and_params):
    # Changing the content of padded frames must not change valid-frame logits.
    model, params = model_and_params
    T, Tv = 16, 10
    x = jax.random.normal(jax.random.key(2), (1, T, TINY.num_joints, 3))
    valid = (jnp.arange(T) < Tv)[None, :]
    base = model.apply(params, x, valid)
    x2 = x.at[:, Tv:].set(jax.random.normal(jax.random.key(3), (1, T - Tv, 17, 3)) * 50)
    pert = model.apply(params, x2, valid)
    np.testing.assert_allclose(
        np.asarray(base[:, :Tv]), np.asarray(pert[:, :Tv]), atol=1e-5
    )


@pytest.mark.slow
def test_jit_deterministic(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(4), (2, 12, TINY.num_joints, 3))
    valid = jnp.ones((2, 12), bool)
    f = jax.jit(lambda p, a, v: model.apply(p, a, v))
    np.testing.assert_array_equal(np.asarray(f(params, x, valid)),
                                  np.asarray(f(params, x, valid)))


def test_temporal_context_used(model_and_params):
    # Per-frame logits must depend on *other* frames (temporal conv works):
    # perturbing frame 0 should change logits at frame 1.
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(5), (1, 8, TINY.num_joints, 3))
    valid = jnp.ones((1, 8), bool)
    base = model.apply(params, x, valid)
    x2 = x.at[:, 0].add(1.0)
    pert = model.apply(params, x2, valid)
    assert np.abs(np.asarray(base[0, 1] - pert[0, 1])).max() > 1e-6


def test_normalize_skeleton_invariances():
    rng = np.random.default_rng(0)
    kpts = jnp.asarray(
        np.concatenate(
            [rng.uniform(200, 800, (1, 12, 17, 2)), rng.uniform(0.5, 1, (1, 12, 17, 1))],
            axis=-1,
        ), jnp.float32,
    )
    base = gcn.normalize_skeleton(kpts)
    # Translation invariance.
    shifted = kpts.at[..., :2].add(123.0)
    np.testing.assert_allclose(
        np.asarray(gcn.normalize_skeleton(shifted)), np.asarray(base), atol=1e-4
    )
    # Scale invariance (about the origin).
    scaled = kpts.at[..., :2].multiply(2.5)
    np.testing.assert_allclose(
        np.asarray(gcn.normalize_skeleton(scaled)), np.asarray(base), atol=1e-4
    )
    # Mid-hip is at the origin after normalization.
    out = np.asarray(base)
    midhip = (out[..., 11, :2] + out[..., 12, :2]) / 2
    np.testing.assert_allclose(midhip, 0.0, atol=1e-5)
    # Scores pass through untouched.
    np.testing.assert_allclose(out[..., 2], np.asarray(kpts[..., 2]), atol=1e-6)


@pytest.mark.slow
def test_uniform_graph_strategy_builds():
    cfg = dataclasses.replace(TINY, graph_strategy="uniform")
    model = gcn.create_gcn_model(cfg)
    x = jnp.zeros((1, 4, cfg.num_joints, 3))
    params = model.init(jax.random.key(0), x, jnp.ones((1, 4), bool))
    out = model.apply(params, x, jnp.ones((1, 4), bool))
    assert out.shape == (1, 4, cfg.num_phases)
