"""Mesh / DP sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.models import gcn as gcn_mod
from golfaction_tpu.parallel import mesh as mesh_mod
from golfaction_tpu.parallel import train_step as ts
from golfaction_tpu.train import data as data_mod
from golfaction_tpu.train import loops, losses

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

GCN_CFG = cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                            dropout=0.0, dtype="float32")


def test_make_mesh_shapes():
    mesh = mesh_mod.make_mesh(cfg_mod.MeshConfig())
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = mesh_mod.make_mesh(cfg_mod.MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(cfg_mod.MeshConfig(data_parallel=16, model_parallel=1))


def _gcn_setup():
    model = gcn_mod.create_gcn_model(GCN_CFG)
    T = 16
    params = model.init(jax.random.key(0), jnp.zeros((1, T, 17, 3)),
                        jnp.ones((1, T), bool))

    def loss_fn(params, batch):
        sk, labels, valid = batch
        logits = model.apply(params, sk, valid)
        return losses.phase_cross_entropy(logits, labels, valid), {}

    samples = data_mod.make_swing_batch(8, T, seed=0)
    batch = loops.build_gcn_batch(samples)
    return model, params, loss_fn, batch


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    model, params, loss_fn, batch = _gcn_setup()
    tx = optax.sgd(1e-2)

    # Single-device reference step.
    def single(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    opt0 = tx.init(params)
    ref_params, ref_loss = single(params, opt0, batch)

    # 8-way DP step.
    mesh = mesh_mod.make_mesh()
    p = mesh_mod.replicate(params, mesh)
    o = mesh_mod.replicate(tx.init(params), mesh)
    b = mesh_mod.shard_batch(batch, mesh)
    step = ts.make_dp_train_step(loss_fn, tx, mesh)
    new_p, _, aux = step(p, o, b)

    np.testing.assert_allclose(float(aux["loss"]), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree.leaves(ref_params)
    flat_dp = jax.tree.leaves(new_p)
    for a, c in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5)


@pytest.mark.slow
def test_dp_forward_sharded_output():
    model, params, loss_fn, batch = _gcn_setup()
    mesh = mesh_mod.make_mesh()
    sk, labels, valid = batch

    fwd = ts.make_dp_forward(
        lambda p, s, v: model.apply(p, s, v), mesh, n_batch_args=2
    )
    p = mesh_mod.replicate(params, mesh)
    s = mesh_mod.shard_batch(sk, mesh)
    v = mesh_mod.shard_batch(valid, mesh)
    out = fwd(p, s, v)
    assert out.shape == (8, 16, GCN_CFG.num_phases)
    # Output really is sharded over data axis.
    assert len(out.sharding.device_set) == 8
    # Matches unsharded forward.
    ref = model.apply(params, sk, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_grad_allreduce_semantics():
    # Loss averages over batch; DP grads must equal full-batch grads even for
    # batch-dependent normalization. Verify on a batch where shards differ.
    model, params, loss_fn, batch = _gcn_setup()
    sk, labels, valid = batch
    # Make shard losses asymmetric.
    labels = labels.at[:4].set(0)
    batch = (sk, labels, valid)
    g_ref = jax.grad(lambda p: loss_fn(p, batch)[0])(params)
    mesh = mesh_mod.make_mesh()
    g_dp = jax.jit(
        jax.grad(lambda p, b: loss_fn(p, b)[0]),
        in_shardings=(mesh_mod.replicated(mesh), mesh_mod.batch_sharding(mesh)),
        out_shardings=mesh_mod.replicated(mesh),
    )(mesh_mod.replicate(params, mesh), mesh_mod.shard_batch(batch, mesh))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.slow
def test_pipeline_analyze_batch_over_mesh():
    # analyze_batch sharded over the 8-device CPU mesh == single-device result.
    from golfaction_tpu.pipeline import orchestrator

    cfg = cfg_mod.PipelineConfig(
        pose=cfg_mod.PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                                stage_blocks=(1, 1, 1), stage_channels=(8, 8, 16),
                                deconv_channels=(8, 8), dtype="float32"),
        gcn=cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                              dropout=0.0, dtype="float32"),
        align=cfg_mod.AlignConfig(embed_dim=8, hidden_channels=(8,),
                                  dtype="float32"),
        error=cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32"),
        frame_batch=4, length_buckets=(8,),
    )
    single = orchestrator.Pipeline(cfg, seed=0)
    mesh = mesh_mod.make_mesh()
    sharded = orchestrator.Pipeline(cfg, params=single.params, mesh=mesh)

    rng = np.random.default_rng(0)
    clips = [rng.integers(0, 255, (5 + i % 3, 64, 80, 3)).astype(np.uint8)
             for i in range(5)]  # 5 clips on an 8-way mesh: padding path
    ref = single.analyze_batch(clips)
    got = sharded.analyze_batch(clips)
    assert len(got) == 5
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b.keypoints),
                                   np.asarray(a.keypoints), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(b.phase_labels),
                                      np.asarray(a.phase_labels))


@pytest.mark.slow
def test_align_batch_sharded_matches_unsharded():
    # Batched alignment (analyze_batch reference mode) under a DP mesh must
    # equal the meshless program: clips shard over `data`, reference
    # replicates, soft-DTW costs/paths identical.
    from golfaction_tpu.pipeline import orchestrator

    cfg = cfg_mod.PipelineConfig(
        pose=cfg_mod.PoseConfig(input_hw=(64, 48), heatmap_hw=(16, 12),
                                stage_blocks=(1,), stage_channels=(8,),
                                deconv_channels=(8,), dtype="float32"),
        gcn=GCN_CFG,
        align=cfg_mod.AlignConfig(embed_dim=8, hidden_channels=(8,),
                                  dtype="float32"),
        error=cfg_mod.ErrorConfig(hidden_dim=16, dtype="float32"),
        frame_batch=4, length_buckets=(16,), video_hw=(96, 128),
    )
    mesh = mesh_mod.make_mesh(cfg_mod.MeshConfig())
    pipe_m = orchestrator.Pipeline(cfg, seed=0, mesh=mesh)
    pipe_s = orchestrator.Pipeline(cfg, seed=0)

    rng = np.random.default_rng(0)
    N, T = 8, 16
    kpts = jnp.asarray(rng.uniform(10, 80, (N, T, 17, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(N, T)) > 0.2)
    valid = valid.at[:, 0].set(True)
    ref_k = jnp.asarray(rng.uniform(10, 80, (T, 17, 3)), jnp.float32)
    ref_v = jnp.ones((T,), bool)
    pl_ = jnp.asarray(rng.normal(size=(N, T, cfg_mod.NUM_PHASES)), jnp.float32)

    a = pipe_m._align_batch(pipe_m.params, kpts, valid, ref_k, ref_v, pl_)
    b = pipe_s._align_batch(pipe_s.params, kpts, valid, ref_k, ref_v, pl_)
    np.testing.assert_allclose(np.asarray(a["cost"]), np.asarray(b["cost"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a["path"]), np.asarray(b["path"]))
    np.testing.assert_allclose(np.asarray(a["error_logits"]),
                               np.asarray(b["error_logits"]),
                               rtol=1e-4, atol=1e-4)
