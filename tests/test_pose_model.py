"""Pose model: shapes, determinism, jit/CPU-runnability (BASELINE config 1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.config import PoseConfig
from golfaction_tpu.models import pose

# Tiny config keeps CPU CI fast; the architecture code paths are identical.
# 3 stages -> backbone stride 16; input dims divide evenly down to heatmaps.
TINY = PoseConfig(
    input_hw=(64, 48),
    heatmap_hw=(16, 12),
    stage_blocks=(1, 1, 1),
    stage_channels=(16, 32, 64),
    deconv_channels=(32, 32),
    dtype="float32",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = pose.create_pose_model(TINY)
    x = jnp.zeros((1, *TINY.input_hw, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    return model, params


def test_output_shape(model_and_params):
    model, params = model_and_params
    x = jnp.ones((2, *TINY.input_hw, 3), jnp.float32)
    hm = model.apply(params, x)
    assert hm.shape == (2, TINY.num_joints, *TINY.heatmap_hw)
    assert hm.dtype == jnp.float32


def test_jit_and_determinism(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(1), (2, *TINY.input_hw, 3))
    f = jax.jit(model.apply)
    a, b = f(params, x), f(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_batch_independence(model_and_params):
    # Per-sample outputs must not depend on batch composition (no BatchNorm).
    model, params = model_and_params
    x = jax.random.normal(jax.random.key(2), (3, *TINY.input_hw, 3))
    full = model.apply(params, x)
    single = model.apply(params, x[1:2])
    np.testing.assert_allclose(
        np.asarray(full[1]), np.asarray(single[0]), atol=1e-5
    )


@pytest.mark.slow
def test_bfloat16_config_builds():
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    model = pose.create_pose_model(cfg)
    x = jnp.zeros((1, *cfg.input_hw, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)
    hm = model.apply(params, x)
    assert hm.dtype == jnp.float32  # head casts back for decode stability
