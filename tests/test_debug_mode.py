"""Debug-mode CI job (SURVEY.md §5 "race detection / sanitizers"):
jax_debug_nans over a train step, and donation-aliasing correctness."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.models import gcn as gcn_mod
from golfaction_tpu.train import data, loops, losses

CFG = cfg_mod.GCNConfig(block_channels=(8,), temporal_branches=((3, 1),),
                        dropout=0.0, dtype="float32")


def _setup():
    model = gcn_mod.create_gcn_model(CFG)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 17, 3)),
                        jnp.ones((1, 8), bool))

    def loss_fn(params, batch):
        sk, labels, valid = batch
        logits = model.apply(params, sk, valid)
        return losses.phase_cross_entropy(logits, labels, valid), {}

    batch = loops.build_gcn_batch(data.make_swing_batch(2, 8, seed=0))
    return params, loss_fn, batch


@pytest.mark.slow
def test_train_step_clean_under_debug_nans():
    params, loss_fn, batch = _setup()
    with jax.debug_nans(True):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        jax.block_until_ready(grads)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_donation_does_not_corrupt_results():
    # The donated step must produce the same params as a non-donated step.
    params, loss_fn, batch = _setup()
    tx = optax.sgd(1e-2)

    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    plain = jax.jit(step)
    donated = jax.jit(step, donate_argnums=(0, 1))

    p1, o1, l1 = plain(params, tx.init(params), batch)
    p2, o2, l2 = donated(jax.tree.map(jnp.copy, params), tx.init(params), batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_masked_ops_produce_no_nans_on_empty_valid():
    # All-padding clip: every masked mean/softmax denominator is guarded.
    model = gcn_mod.create_gcn_model(CFG)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 17, 3)),
                        jnp.ones((1, 8), bool))
    x = jax.random.normal(jax.random.key(1), (1, 8, 17, 3))
    valid = jnp.zeros((1, 8), bool)
    with jax.debug_nans(True):
        out = model.apply(params, x, valid)
        jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()
