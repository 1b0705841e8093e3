"""AlignEncoder and ErrorClassifier unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.config import AlignConfig, ErrorConfig, NUM_ERRORS, NUM_PHASES
from golfaction_tpu.models import align, error

ACFG = AlignConfig(embed_dim=16, hidden_channels=(8, 16), dtype="float32")
ECFG = ErrorConfig(hidden_dim=32, dtype="float32")


@pytest.fixture(scope="module")
def align_model():
    m = align.create_align_model(ACFG)
    x = jnp.zeros((1, 8, 17, 3))
    p = m.init(jax.random.key(0), x, jnp.ones((1, 8), bool))
    return m, p


@pytest.fixture(scope="module")
def error_model():
    m = error.create_error_model(ECFG)
    x = jnp.zeros((1, 8, 17, 3))
    pl = jnp.zeros((1, 8, NUM_PHASES))
    p = m.init(jax.random.key(0), x, pl, jnp.ones((1, 8), bool))
    return m, p


def test_align_shapes_and_unit_norm(align_model):
    m, p = align_model
    x = jax.random.normal(jax.random.key(1), (2, 12, 17, 3))
    valid = jnp.ones((2, 12), bool)
    emb = m.apply(p, x, valid)
    assert emb.shape == (2, 12, ACFG.embed_dim)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_align_padding_isolation(align_model):
    m, p = align_model
    T, Tv = 12, 8
    x = jax.random.normal(jax.random.key(2), (1, T, 17, 3))
    valid = (jnp.arange(T) < Tv)[None]
    base = m.apply(p, x, valid)
    x2 = x.at[:, Tv:].set(99.0)
    pert = m.apply(p, x2, valid)
    np.testing.assert_allclose(
        np.asarray(base[:, :Tv]), np.asarray(pert[:, :Tv]), atol=1e-5
    )
    # Padded embeddings are zeroed.
    np.testing.assert_allclose(np.asarray(base[:, Tv:]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_error_shapes_and_mask(error_model):
    m, p = error_model
    T, Tv = 10, 6
    x = jax.random.normal(jax.random.key(3), (2, T, 17, 3))
    pl = jax.random.normal(jax.random.key(4), (2, T, NUM_PHASES))
    valid = (jnp.arange(T) < Tv)[None].repeat(2, 0)
    out = m.apply(p, x, pl, valid)
    assert out.shape == (2, NUM_ERRORS)
    # Padded-frame content must not affect the flags.
    x2 = x.at[:, Tv:].set(1e3)
    out2 = m.apply(p, x2, pl, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_error_depends_on_phases(error_model):
    m, p = error_model
    x = jax.random.normal(jax.random.key(5), (1, 10, 17, 3))
    pl = jax.random.normal(jax.random.key(6), (1, 10, NUM_PHASES))
    valid = jnp.ones((1, 10), bool)
    a = m.apply(p, x, pl, valid)
    b = m.apply(p, x, pl[:, ::-1], valid)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_angle_features_scale_and_translation_invariant():
    from golfaction_tpu.models import error as error_mod
    rng = np.random.default_rng(0)
    sk = rng.normal(size=(2, 5, 17, 3)).astype(np.float32)
    a1 = error_mod.angle_features(jnp.asarray(sk))
    sk2 = sk.copy()
    sk2[..., :2] = sk2[..., :2] * 3.7 + np.array([11.0, -4.0])
    a2 = error_mod.angle_features(jnp.asarray(sk2))
    assert a1.shape == (2, 5, error_mod.NUM_ANGLE_FEATURES)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)


def test_error_model_consumes_reference_deviations():
    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import error as error_mod
    cfg = cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32")
    model = error_mod.create_error_model(cfg)
    rng = np.random.default_rng(1)
    sk = jnp.asarray(rng.normal(size=(2, 6, 17, 3)), jnp.float32)
    pl_ = jnp.asarray(rng.normal(size=(2, 6, cfg_mod.NUM_PHASES)), jnp.float32)
    v = jnp.ones((2, 6), bool)
    params = model.init(jax.random.key(0), sk, pl_, v)
    base = model.apply(params, sk, pl_, v)
    # Same params must accept a reference and produce a different logit
    # (has-ref flag + deviation block change the feature vector).
    ref = sk + 0.5
    with_ref = model.apply(params, sk, pl_, v, ref)
    assert base.shape == with_ref.shape == (2, cfg_mod.NUM_ERRORS)
    assert not np.allclose(np.asarray(base), np.asarray(with_ref))
