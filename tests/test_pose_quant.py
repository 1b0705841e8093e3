"""int8 PTQ pose path: float-ref parity with flax, quantized accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.config import PoseConfig
from golfaction_tpu.models import pose, pose_quant

TINY = PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                  stage_blocks=(1, 1, 1), stage_channels=(16, 32, 64),
                  deconv_channels=(32, 32), dtype="float32")


@pytest.fixture(scope="module")
def setup():
    model = pose.create_pose_model(TINY)
    x = jax.random.normal(jax.random.key(0), (2, *TINY.input_hw, 3))
    params = model.init(jax.random.key(1), x)
    return model, params, x


def test_ref_forward_matches_flax(setup):
    model, params, x = setup
    ref = model.apply(params, x)
    got = pose_quant.pose_forward_ref(params, TINY, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_int8_forward_close_to_float(setup):
    model, params, x = setup
    calib = jax.random.normal(jax.random.key(2), (8, *TINY.input_hw, 3))
    qw, scales = pose_quant.prepare_int8(params, TINY, calib)
    ref = np.asarray(model.apply(params, x))
    got = np.asarray(pose_quant.pose_forward_int8(params, qw, scales, TINY, x))
    # int8 path: heatmap values within a few percent of the dynamic range.
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / max(scale, 1e-6)
    assert err < 0.12, f"relative heatmap error {err}"
    # Peaks (what decode consumes) mostly agree.  Random-weight heatmaps are
    # near-flat (no trained peaks), making argmax the worst case — the
    # trained-model PCK check lives in scripts/quantize_eval.py.
    ref_arg = ref.reshape(*ref.shape[:2], -1).argmax(-1)
    got_arg = got.reshape(*got.shape[:2], -1).argmax(-1)
    agree = (ref_arg == got_arg).mean()
    assert agree > 0.7, f"argmax agreement {agree}"


@pytest.mark.slow
def test_int8_weights_are_int8(setup):
    _, params, _ = setup
    qw = pose_quant.quantize_weights(params, TINY)
    w0, s0 = qw["Conv_0"]
    assert w0.dtype == jnp.int8
    assert s0.shape == (64,)
    rb = qw["ResBlock_0"]
    assert rb["Conv_0"][0].dtype == jnp.int8


@pytest.mark.slow
def test_calibration_scales_cover_all_conv_layers(setup):
    _, params, _ = setup
    calib = jax.random.normal(jax.random.key(3), (4, *TINY.input_hw, 3))
    scales = pose_quant.calibrate(params, TINY, calib)
    qw = pose_quant.quantize_weights(params, TINY)
    need = {"Conv_0"}
    for name, entry in qw.items():
        if isinstance(entry, dict):
            need |= {f"{name}/{k}" for k in entry}
        else:
            need.add(name)
    assert need <= set(scales), sorted(need - set(scales))
    assert all(s > 0 for s in scales.values())


def test_int8_fused_matches_unfused(setup):
    # The fused-epilogue forward is the same quantized graph as
    # pose_forward_int8 (identical quant points); differences are only
    # epilogue precision (f32 vs bf16 GN) and the re-quantized identity
    # shortcut, so outputs must agree tightly.
    model, params, x = setup
    calib = jax.random.normal(jax.random.key(2), (8, *TINY.input_hw, 3))
    qw, scales = pose_quant.prepare_int8(params, TINY, calib)
    a = np.asarray(pose_quant.pose_forward_int8(params, qw, scales, TINY, x))
    b = np.asarray(pose_quant.pose_forward_int8_fused(
        params, qw, scales, TINY, x, interpret=True))
    scale = np.abs(a).max()
    err = np.abs(a - b).max() / max(scale, 1e-6)
    # Same tolerance as int8-vs-float: the fused path re-quantizes the
    # identity shortcut (the unfused one keeps it bf16), worth ~1 LSB.
    assert err < 0.12, f"fused-vs-unfused relative error {err}"


@pytest.mark.slow
def test_int8_mixed_forward_close_to_float(setup):
    """Mixed path (int8 early stages, bf16 tail) stays close to float and
    approaches the float output as int8_stages -> 0 coverage shrinks."""
    model, params, x = setup
    calib = jax.random.normal(jax.random.key(3), (8, *TINY.input_hw, 3))
    qw, scales = pose_quant.prepare_int8(params, TINY, calib)
    ref = np.asarray(model.apply(params, x))
    scale = np.abs(ref).max()
    errs = {}
    for k in (1, 2, 3):
        got = np.asarray(pose_quant.pose_forward_int8_mixed(
            params, qw, scales, TINY, x, int8_stages=k))
        errs[k] = np.abs(got - ref).max() / max(scale, 1e-6)
        assert errs[k] < 0.15, f"int8_stages={k} relative error {errs[k]}"
    # Full-depth mixed (k=3 == every stage int8) should not beat the
    # shallow variant by construction noise alone; just sanity-order check
    # that quantizing fewer stages does not *increase* error massively.
    assert errs[1] <= errs[3] + 0.05
