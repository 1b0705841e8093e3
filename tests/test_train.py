"""Training loops: losses decrease on synthetic data; metrics; checkpoints."""

import pytest

import os

import jax
import jax.numpy as jnp
import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.train import checkpoint, data, loops, losses, metrics

TRAIN = cfg_mod.TrainConfig(
    batch_size=4, learning_rate=3e-3, warmup_steps=2, total_steps=8, seed=0
)


@pytest.mark.slow
def test_gcn_training_reduces_loss():
    gcn_cfg = cfg_mod.GCNConfig(block_channels=(8, 16), temporal_branches=((3, 1),),
                                dropout=0.0, dtype="float32")
    state, hist = loops.train_gcn(gcn_cfg, TRAIN, frames_per_clip=24, log_every=1)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert state.step == TRAIN.total_steps


@pytest.mark.slow
def test_error_training_reduces_loss():
    err_cfg = cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32")
    state, hist = loops.train_error(err_cfg, TRAIN, frames_per_clip=24, log_every=1)
    assert hist[-1]["loss"] < hist[0]["loss"]


@pytest.mark.slow
def test_align_training_reduces_loss():
    al_cfg = cfg_mod.AlignConfig(embed_dim=8, hidden_channels=(8,), dtype="float32")
    cfg = cfg_mod.TrainConfig(batch_size=2, learning_rate=3e-3, warmup_steps=2,
                              total_steps=6, seed=0)
    state, hist = loops.train_align(al_cfg, cfg, frames_per_clip=16, log_every=1)
    assert hist[-1]["loss"] < hist[0]["loss"]


@pytest.mark.slow
def test_pose_training_reduces_loss():
    pose_cfg = cfg_mod.PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                                  stage_blocks=(1, 1, 1), stage_channels=(8, 8, 16),
                                  deconv_channels=(8, 8), dtype="float32")
    cfg = cfg_mod.TrainConfig(batch_size=2, learning_rate=1e-3, warmup_steps=2,
                              total_steps=6, seed=0)
    state, hist = loops.train_pose(pose_cfg, cfg, image_hw=(96, 128),
                                   clips_per_epoch=1, frames_per_clip=8, log_every=1,
                                   pool_clips=6, pool_fault_prob=0.7,
                                   fast_frame_boost=2.0, fault_frame_boost=2.0,
                                   fault_joint_boost=2.0, arm_wander=0.1)
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_metrics_pck_and_f1():
    gt = jnp.zeros((2, 17, 2))
    pred = gt.at[:, 0, 0].add(10.0)  # one joint off by 10px
    bbox = jnp.full((2,), 100.0)
    p = metrics.pck(pred, gt, bbox, alpha=0.05)
    np.testing.assert_allclose(float(p), 32 / 34, atol=1e-6)

    labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    perfect = metrics.phase_f1(labels, labels, 3)
    np.testing.assert_allclose(float(perfect), 1.0)
    worst = metrics.phase_f1(labels, (labels + 1) % 3, 3)
    assert float(worst) < 0.01
    acc = metrics.phase_accuracy(labels, labels.at[0].set(1))
    np.testing.assert_allclose(float(acc), 5 / 6)


def test_metrics_confusion_and_error():
    labels = jnp.asarray([0, 1, 1, 2])
    pred = jnp.asarray([0, 1, 2, 2])
    cm = np.asarray(metrics.phase_confusion(pred, labels, 3))
    assert cm.sum() == 4 and cm[1, 2] == 1 and cm[0, 0] == 1
    em = metrics.error_detection_metrics(
        jnp.asarray([[0.9, 0.1], [0.8, 0.7]]), jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    )
    np.testing.assert_allclose(float(em["recall"]), 1.0)
    assert float(em["precision"]) < 1.0


def test_losses_basic_properties():
    # CE is minimized by the true labels.
    logits = jnp.zeros((1, 4, 3)).at[..., 0].set(5.0)
    good = losses.phase_cross_entropy(logits, jnp.zeros((1, 4), jnp.int32))
    bad = losses.phase_cross_entropy(logits, jnp.ones((1, 4), jnp.int32))
    assert float(good) < float(bad)
    # soft-DTW divergence of identical sequences ~ 0, different > same.
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    same = float(losses.softdtw_divergence(a, a, 0.1))
    diff = float(losses.softdtw_divergence(a, b, 0.1))
    assert abs(same) < 1e-3
    assert diff > same


def test_checkpoint_round_trip(tmp_path):
    params = {
        "pose": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "gcn": {"b": jnp.ones((4,), jnp.bfloat16)},
    }
    path = checkpoint.save_params(str(tmp_path / "ckpt"), params, step=7)
    assert "step_00000007" in path
    restored = checkpoint.restore_params(path, like=params)
    assert restored["gcn"]["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["pose"]["w"]), np.asarray(params["pose"]["w"])
    )
    assert checkpoint.latest_step_dir(str(tmp_path / "ckpt")) == path

    # Metadata-based restore: no `like` tree, structure/dtypes come from the
    # checkpoint itself (the fast path bench.py uses to skip model init).
    import jax

    blind = checkpoint.restore_params(path)
    assert blind["gcn"]["b"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(blind["pose"]["w"]), np.asarray(params["pose"]["w"])
    )
    dev = jax.local_devices()[0]
    assert blind["pose"]["w"].sharding == jax.sharding.SingleDeviceSharding(dev)


def test_checkpoint_npz_round_trip(tmp_path):
    # save_params_npz is the git-committable compact form: f16 floats,
    # int leaves untouched, '/'-joined nested dict keys.
    params = {
        "params": {
            "Conv_0": {"kernel": jnp.linspace(-1, 1, 24,
                                              dtype=jnp.float32).reshape(2, 3, 4)},
            "Dense_0": {"bias": jnp.ones((4,), jnp.float32)},
        },
        "steps": np.asarray(7, np.int32),
    }
    path = checkpoint.save_params_npz(str(tmp_path / "pose.npz"), params)
    restored = checkpoint.restore_params_npz(path)
    k = restored["params"]["Conv_0"]["kernel"]
    assert k.dtype == np.float32           # cast back to the training dtype
    np.testing.assert_allclose(
        k, np.asarray(params["params"]["Conv_0"]["kernel"]), atol=1e-3)
    assert restored["steps"].dtype == np.int32 and int(restored["steps"]) == 7

    # load_pipeline_params falls back to <base>/<name>.npz when no Orbax
    # step dir exists (fresh-clone path: the Orbax pose tree is gitignored).
    (tmp_path / "params").mkdir()
    checkpoint.save_params_npz(str(tmp_path / "params" / "pose.npz"), params)
    like = {"pose": jax.tree.map(lambda x: np.zeros_like(x), params)}
    out = checkpoint.load_pipeline_params(str(tmp_path), like=like)
    np.testing.assert_allclose(
        out["pose"]["params"]["Dense_0"]["bias"], np.ones((4,)), atol=1e-3)


def test_detect_pose_in_frames_npz(tmp_path):
    (tmp_path / "params").mkdir()
    params = {"params": {"Conv_0": {"kernel": np.zeros((7, 7, 9, 8),
                                                       np.float32)}}}
    checkpoint.save_params_npz(str(tmp_path / "params" / "pose.npz"), params)
    assert checkpoint.detect_pose_in_frames(str(tmp_path)) == 3


@pytest.mark.slow
def test_checkpoint_resume_continues_training(tmp_path):
    # Train 8 steps with checkpointing every 4; resume from step 4 and verify
    # the final params match an uninterrupted run (same data stream).
    import dataclasses
    gcn_cfg = cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                                dropout=0.0, dtype="float32")
    tc = dataclasses.replace(TRAIN, checkpoint_dir=str(tmp_path),
                             checkpoint_every=4)
    full, _ = loops.train_gcn(gcn_cfg, tc, frames_per_clip=16, log_every=4,
                              checkpoint_tag="gcn")
    ck4 = checkpoint.latest_step_dir(str(tmp_path / "gcn"))
    assert ck4 and ck4.endswith("step_00000008")
    mid = str(tmp_path / "gcn" / "step_00000004")
    resumed, hist = loops.train_gcn(gcn_cfg, tc, frames_per_clip=16, log_every=4,
                                    resume_from=mid)
    assert hist[0]["step"] == 4
    import jax
    for a, b in zip(jax.tree.leaves(full.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_detect_pose_in_frames(tmp_path):
    """config_for_artifacts self-configures pose.in_frames from the saved
    stem kernel width (multi-frame checkpoints are width-incompatible)."""
    import jax
    import jax.numpy as jnp

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import pose as pose_mod
    from golfaction_tpu.train import checkpoint

    pc = cfg_mod.PoseConfig(input_hw=(32, 24), heatmap_hw=(8, 6),
                            stage_blocks=(1,), stage_channels=(8,),
                            deconv_channels=(8,), in_frames=3,
                            dtype="float32")
    model = pose_mod.create_pose_model(pc)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 24, 9)))
    checkpoint.save_params(str(tmp_path / "params" / "pose"), params, step=1)
    assert checkpoint.detect_pose_in_frames(str(tmp_path)) == 3
    # Relative paths must work too: Orbax metadata() returns None for them,
    # which silently mis-detected every multi-frame checkpoint as 1-frame.
    cwd = os.getcwd()
    os.chdir(tmp_path.parent)
    try:
        assert checkpoint.detect_pose_in_frames(tmp_path.name) == 3
    finally:
        os.chdir(cwd)
    cfg = cfg_mod.get_config("full_pipeline")
    cfg2 = checkpoint.config_for_artifacts(cfg, str(tmp_path))
    assert cfg2.pose.in_frames == 3
    # missing checkpoint -> conservative single-frame
    assert checkpoint.detect_pose_in_frames(str(tmp_path / "nope")) == 1


def test_pose_meta_roundtrip(tmp_path):
    """pose_meta.json carries decode configuration that checkpoint array
    shapes cannot reveal (sigma-1.25 vs sigma-2 nets are shape-identical);
    config_for_artifacts applies it as overrides."""
    import pytest

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.train import checkpoint

    checkpoint.save_pose_meta(str(tmp_path), sigma=1.25, decode_tracking=4,
                              track_suppress_radius=2.0)
    cfg = cfg_mod.get_config("full_pipeline")
    cfg2 = checkpoint.config_for_artifacts(cfg, str(tmp_path))
    assert cfg2.pose.sigma == 1.25
    assert cfg2.pose.decode_tracking == 4
    assert cfg2.pose.track_suppress_radius == 2.0
    assert cfg2.pose.track_lambda == cfg.pose.track_lambda  # untouched
    # no sidecar -> untouched config; unknown keys rejected at save time
    assert checkpoint.load_pose_meta(str(tmp_path / "nope")) == {}
    with pytest.raises(ValueError):
        checkpoint.save_pose_meta(str(tmp_path), bogus=1)
