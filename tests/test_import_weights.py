"""Torch-weight importer: layout conversion and round-trip through the model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from golfaction_tpu.config import PoseConfig
from golfaction_tpu.models import pose
from golfaction_tpu.train import import_weights

TINY = PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                  stage_blocks=(1,), stage_channels=(8,),
                  deconv_channels=(8,), dtype="float32")


def test_conv_layout_round_trip():
    # A torch conv applied to NCHW equals our flax conv with imported kernel.
    tconv = torch.nn.Conv2d(3, 4, 3, padding=1, bias=True)
    x = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    import flax.linen as nn

    fconv = nn.Conv(4, (3, 3), padding="SAME")
    params = fconv.init(jax.random.key(0), jnp.asarray(x))
    sd = {"conv.weight": tconv.weight, "conv.bias": tconv.bias}
    new_params, report = import_weights.import_torch_state_dict(params, sd)
    assert report["coverage"] == 1.0
    out = fconv.apply(new_params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_layout():
    import flax.linen as nn

    tl = torch.nn.Linear(6, 3)
    x = np.random.default_rng(1).normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.tensor(x)).numpy()
    fd = nn.Dense(3)
    params = fd.init(jax.random.key(0), jnp.asarray(x))
    new_params, report = import_weights.import_torch_state_dict(
        params, {"w": tl.weight, "b": tl.bias})
    assert report["coverage"] == 1.0
    np.testing.assert_allclose(np.asarray(fd.apply(new_params, jnp.asarray(x))),
                               ref, atol=1e-5)


def test_partial_import_reports_skips():
    model = pose.create_pose_model(TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, *TINY.input_hw, 3)))
    # Source with only the stem conv (7x7x3->64... here stage_channels[0]=8,
    # stem is fixed 64): provide one matching tensor for the stem.
    sd = {"stem.weight": torch.zeros(64, 3, 7, 7)}
    new_params, report = import_weights.import_torch_state_dict(params, sd)
    assert len(report["imported"]) == 1
    assert report["coverage"] < 1.0
    assert report["unused_torch"] == []
    with pytest.raises(ValueError):
        import_weights.import_torch_state_dict(params, sd, strict=True)
    # The imported stem kernel (7,7,3,64) is actually the zeroed source.
    found = [l for _, l in jax.tree.flatten_with_path(new_params)[0]
             if tuple(np.shape(l)) == (7, 7, 3, 64)]
    assert found and np.allclose(np.asarray(found[0]), 0.0)
