"""Training losses for the four models (SURVEY.md §2 "Training + evaluation
harness"; reference README.md:24-48 shows the corresponding training curves).

All losses are masked (padding-aware) and return scalars in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from golfaction_tpu.ops import softdtw


def heatmap_mse(pred, target, joint_weights=None):
    """Pose loss: per-joint MSE over heatmaps [B, K, H, W]."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_joint = err.mean(axis=(-2, -1))                 # [B, K]
    if joint_weights is not None:
        per_joint = per_joint * joint_weights
        denom = jnp.maximum(joint_weights.sum(), 1.0)
        return per_joint.sum() / denom
    return per_joint.mean()


def phase_cross_entropy(logits, labels, valid=None, label_smoothing=0.0):
    """Segmentation loss: per-frame CE.  logits [B,T,P], labels [B,T]."""
    P = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, P)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / P
    ce = -(onehot * logp).sum(-1)                       # [B, T]
    if valid is not None:
        v = valid.astype(jnp.float32)
        return (ce * v).sum() / jnp.maximum(v.sum(), 1.0)
    return ce.mean()


def error_bce(logits, flags, fault_weights=None):
    """Multi-label fault loss.  logits [B,E], flags [B,E] in {0,1}.

    `fault_weights` [E] (optional) reweights each fault's BCE term:
    subtle small-deflection faults (early_extension: 17 px of hip lift
    confined to the short downswing window, the smallest signature in the
    set) otherwise contribute so little to the mean that the head can sit
    at ~3% aggregate-accuracy cost while never learning them at all
    (measured round 5: train acc 0.97 with EE stage-wise prob 0.12)."""
    logits = logits.astype(jnp.float32)
    per = (jnp.maximum(logits, 0) - logits * flags
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))              # [B, E]
    if fault_weights is None:
        return jnp.mean(per)
    w = jnp.asarray(fault_weights, jnp.float32)
    return jnp.sum(per * w) / (per.shape[0] * jnp.sum(w))


def softdtw_divergence(emb_a, emb_b, gamma: float):
    """Alignment loss: soft-DTW divergence between two embedding sequences.

    div(a,b) = sdtw(a,b) - (sdtw(a,a) + sdtw(b,b)) / 2  — non-negative-ish,
    zero when the sequences traverse the same trajectory; gradients flow
    through the custom-VJP wavefront (ops.softdtw).
    """
    Dab = softdtw.pairwise_sqdist(emb_a, emb_b)
    Daa = softdtw.pairwise_sqdist(emb_a, emb_a)
    Dbb = softdtw.pairwise_sqdist(emb_b, emb_b)
    return (
        softdtw.softdtw_cost(Dab, gamma)
        - 0.5 * (softdtw.softdtw_cost(Daa, gamma) + softdtw.softdtw_cost(Dbb, gamma))
    )


softdtw_divergence_batch = jax.vmap(softdtw_divergence, in_axes=(0, 0, None))


def softdtw_divergence_batched(emb_a, emb_b, gamma: float, use_pallas=None):
    """Batched soft-DTW divergence with a TPU fast path.  emb [B, T, D].

    On TPU the three cost evaluations (ab, aa, bb) run as ONE batched
    Pallas wavefront launch, with the reverse-wavefront E-recursion kernel
    as the custom VJP — the vmapped `lax.scan` E-recursion that
    `softdtw_divergence_batch` differentiates through compiles
    pathologically slowly at batch on TPU (measured in
    `scripts/softdtw_bwd_bench.py`; BASELINE.md round 3).  Elsewhere (CPU
    CI) the scan path is used — same math, parity-tested in
    tests/test_pallas_softdtw.py.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return softdtw_divergence_batch(emb_a, emb_b, gamma)
    from golfaction_tpu.ops.pallas import softdtw_kernel as sk

    Dab = jax.vmap(softdtw.pairwise_sqdist)(emb_a, emb_b)
    Daa = jax.vmap(softdtw.pairwise_sqdist)(emb_a, emb_a)
    Dbb = jax.vmap(softdtw.pairwise_sqdist)(emb_b, emb_b)
    D = jnp.concatenate([Dab, Daa, Dbb], axis=0)
    cost = sk.softdtw_cost_pallas(D, gamma)
    B = emb_a.shape[0]
    return cost[:B] - 0.5 * (cost[B : 2 * B] + cost[2 * B :])


def alignment_contrastive(emb_a, emb_b, progress_a, progress_b, temperature=0.1):
    """Auxiliary alignment loss: frames close in swing *progress* should have
    close embeddings across videos (regression-to-progress contrastive, in
    the TCC family).  emb [T,D] unit-norm, progress [T] in [0,1].
    """
    sim = jnp.einsum("td,sd->ts", emb_a, emb_b) / temperature    # [Ta, Tb]
    # Soft nearest neighbor of each a-frame among b-frames.
    w = jax.nn.softmax(sim, axis=-1)
    pred_progress = w @ progress_b                                # [Ta]
    return jnp.mean((pred_progress - progress_a) ** 2)


alignment_contrastive_batch = jax.vmap(alignment_contrastive, in_axes=(0, 0, 0, 0))
