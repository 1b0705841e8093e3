"""Data-parallel training and inference over a device mesh.

Gradient psum / batch sharding are expressed declaratively: params live
replicated, batches are sharded on the `data` axis, and jit + NamedSharding
makes XLA insert the all-reduce over ICI (SURVEY.md §5 "Distributed
communication backend" — the TPU-native equivalent of the torch/NCCL DP the
reference's stack would have used had it scaled).

Works identically on a real slice and on the 8-virtual-device CPU mesh used
in CI (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax

from golfaction_tpu.parallel import mesh as mesh_mod


def make_dp_train_step(
    loss_fn: Callable[[Any, Any], tuple[jax.Array, dict]],
    tx: optax.GradientTransformation,
    mesh,
) -> Callable:
    """Build a jitted DP train step.

    loss_fn(params, local_batch) -> (loss, aux) written exactly as in the
    single-device loops; the mean over the global batch emerges from the
    sharded loss computation (loss_fn must average over the batch axis).

    Returns step(params, opt_state, batch) -> (params, opt_state, aux);
    params/opt_state replicated, batch sharded on `data`.
    """
    rep = mesh_mod.replicated(mesh)
    bsh = mesh_mod.batch_sharding(mesh)

    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, aux

    return jax.jit(
        step,
        in_shardings=(rep, rep, bsh),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_dp_forward(apply_fn: Callable, mesh, n_batch_args: int = 1) -> Callable:
    """Jitted data-parallel inference: batch sharded in, batch sharded out.

    apply_fn(params, *batch_arrays) with each of the `n_batch_args` batch
    arrays leading-axis sharded over `data` — the multi-clip throughput path
    (BASELINE config 5 scaled across chips).  Output pytree leaves are
    batch-sharded too, so results stay distributed until fetched.
    """
    rep = mesh_mod.replicated(mesh)
    bsh = mesh_mod.batch_sharding(mesh)
    return jax.jit(
        apply_fn,
        in_shardings=(rep, *([bsh] * n_batch_args)),
        out_shardings=bsh,
    )
