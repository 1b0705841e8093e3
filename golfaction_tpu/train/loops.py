"""Optax training loops for the four models (SURVEY.md §3.5, §7 step 8).

Each model gets: a batch builder (host, from the synthetic generator), a
jitted `train_step` (donated state, single fused XLA program), and a
`train_*` driver that runs steps and returns a metrics history.  Data
parallelism over a device mesh lives in golfaction_tpu.parallel and wraps
these same loss functions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from golfaction_tpu import config as cfg_mod
from golfaction_tpu import graph
from golfaction_tpu.models import align as align_mod
from golfaction_tpu.models import error as error_mod
from golfaction_tpu.models import gcn as gcn_mod
from golfaction_tpu.models import pose as pose_mod
from golfaction_tpu.ops import heatmap
from golfaction_tpu.train import data as data_mod
from golfaction_tpu.train import losses


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_optimizer(cfg: cfg_mod.TrainConfig):
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
    )
    return optax.adamw(sched, weight_decay=cfg.weight_decay)


def _make_step(loss_fn: Callable, tx) -> Callable:
    """Build a jitted (state, batch) -> (state, aux) step with donation."""

    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, aux

    return jax.jit(step, donate_argnums=(0, 1))


def _run_training(
    step_fn: Callable,
    params,
    opt_state,
    batch_fn: Callable[[int], Any],
    train_cfg: cfg_mod.TrainConfig,
    log_every: int,
    aux_keys: tuple[str, ...] = (),
    resume_from: str | None = None,
    checkpoint_tag: str | None = None,
):
    """Shared step loop with optional checkpoint/resume (SURVEY.md §5).

    resume_from: a checkpoint dir previously written by this driver — restores
    params/opt_state/step and continues to total_steps.  checkpoint_tag: when
    set, saves {params, opt_state, step} under
    <train_cfg.checkpoint_dir>/<tag> every train_cfg.checkpoint_every steps.
    """
    from golfaction_tpu.train import checkpoint as ckpt_mod

    start_step = 0
    if resume_from:
        state = ckpt_mod.restore_params(
            resume_from,
            like={"params": params, "opt_state": opt_state,
                  "step": np.zeros((), np.int32)},
        )
        params, opt_state = state["params"], state["opt_state"]
        start_step = int(state["step"])

    from golfaction_tpu.utils.logging import TensorBoardScalars
    tb = TensorBoardScalars(getattr(train_cfg, "tb_logdir", None))

    history = []
    try:
        for step in range(start_step, train_cfg.total_steps):
            params, opt_state, aux = step_fn(params, opt_state, batch_fn(step))
            if step % log_every == 0 or step == train_cfg.total_steps - 1:
                rec = {"step": step, "loss": float(aux["loss"])}
                rec.update({k: float(aux[k]) for k in aux_keys})
                history.append(rec)
                tb.log(step, **{k: v for k, v in rec.items() if k != "step"})
            if (
                checkpoint_tag
                and train_cfg.checkpoint_every > 0
                and (step + 1) % train_cfg.checkpoint_every == 0
            ):
                ckpt_mod.save_params(
                    f"{train_cfg.checkpoint_dir}/{checkpoint_tag}",
                    {"params": params, "opt_state": opt_state,
                     "step": np.int32(step + 1)},
                    step=step + 1,
                )
    finally:
        tb.close()   # flush buffered scalars even when a step raises
    return TrainState(params, opt_state, train_cfg.total_steps), history


# ---------------------------------------------------------------------------
# Batch builders (host side)
# ---------------------------------------------------------------------------

def build_pose_batch(samples, pose_cfg: cfg_mod.PoseConfig, frame_stride=4,
                     box_jitter: float = 0.0, jitter_rng=None,
                     full_frame_prob: float = 0.0):
    """Rendered samples -> (crops, target heatmaps, weights) arrays.

    Takes every `frame_stride`-th frame of each rendered clip as an
    independent pose training example.  box_jitter > 0 randomly scales
    (1±j) and shifts (±j/2 of size) the person boxes so the model is robust
    to the runtime's estimated (not ground-truth) boxes.  full_frame_prob
    replaces that fraction of boxes with the WHOLE frame — the cold-start
    crop of the pipeline's keypoint-seeded box refinement, which must work
    from a full-frame view before any box is known.
    """
    from golfaction_tpu.ops import affine, preprocess

    jitter_rng = jitter_rng or np.random.default_rng(0)
    half = pose_cfg.in_frames // 2
    crops, targets, weights = [], [], []
    for s in samples:
        assert s.frames is not None, "render=True required for pose batches"
        idx = np.arange(0, len(s.frames), frame_stride)
        frames = jnp.asarray(s.frames[idx])
        raw_boxes = s.boxes[idx].copy()
        if box_jitter > 0:
            n = len(idx)
            raw_boxes[:, 2:] *= jitter_rng.uniform(
                1 - box_jitter, 1 + box_jitter, (n, 2))
            raw_boxes[:, :2] += (
                raw_boxes[:, 2:] * jitter_rng.uniform(
                    -box_jitter / 2, box_jitter / 2, (n, 2)))
        if full_frame_prob > 0:
            n = len(idx)
            H, W = s.frames.shape[1:3]
            ff = jitter_rng.uniform(size=n) < full_frame_prob
            raw_boxes[ff] = [W / 2.0, H / 2.0, float(W), float(H)]
        boxes = affine.box_to_center_scale(
            jnp.asarray(raw_boxes),
            aspect_ratio=pose_cfg.input_hw[1] / pose_cfg.input_hw[0],
        )
        if half == 0:
            crops.append(preprocess.crop_resize_normalize(
                frames, boxes, pose_cfg.input_hw))
        else:
            # Temporal context: crop t-1..t+1 (clip-edge clamped) with the
            # SAME (jittered) box as frame t, channel-concatenated — the
            # runtime orchestrator does exactly this (orchestrator._pose_pass).
            groups = []
            for off in range(-half, half + 1):
                nidx = np.clip(idx + off, 0, len(s.frames) - 1)
                groups.append(preprocess.crop_resize_normalize(
                    jnp.asarray(s.frames[nidx]), boxes, pose_cfg.input_hw))
            crops.append(jnp.concatenate(groups, axis=-1))
        kpts = jnp.asarray(s.keypoints[idx])
        hm_kpts = heatmap.image_keypoints_to_heatmap(
            kpts, boxes, pose_cfg.heatmap_hw, pose_cfg.input_hw
        )
        t, w = heatmap.make_heatmap_targets(
            hm_kpts[..., :2], pose_cfg.heatmap_hw, pose_cfg.sigma
        )
        targets.append(t)
        weights.append(w)
    return (
        jnp.concatenate(crops),
        jnp.concatenate(targets),
        jnp.concatenate(weights),
    )


def pose_eval_crops(frames_np, boxes, pose_cfg: cfg_mod.PoseConfig):
    """Inference-convention crops for stage-wise eval: the same multi-frame
    channel concat as orchestrator._pose_pass (neighbors cropped with frame
    t's box, clip-edge clamped)."""
    from golfaction_tpu.ops import preprocess

    half = pose_cfg.in_frames // 2
    if half == 0:
        return preprocess.crop_resize_normalize(
            jnp.asarray(frames_np), boxes, pose_cfg.input_hw)
    T = len(frames_np)
    groups = []
    for off in range(-half, half + 1):
        nidx = np.clip(np.arange(T) + off, 0, T - 1)
        groups.append(preprocess.crop_resize_normalize(
            jnp.asarray(frames_np[nidx]), boxes, pose_cfg.input_hw))
    return jnp.concatenate(groups, axis=-1)


def build_gcn_batch(samples):
    """Keypoint samples (same T) -> (skeletons_norm, labels, valid)."""
    kpts = jnp.asarray(np.stack([s.keypoints for s in samples]))
    labels = jnp.asarray(np.stack([s.phase_labels for s in samples]))
    valid = jnp.ones(labels.shape, bool)
    sk = gcn_mod.normalize_skeleton(kpts, valid)
    return sk, labels, valid


def build_align_batch(samples_a, samples_b):
    """Paired swings -> (sk_a, sk_b, prog_a, prog_b)."""
    ka = jnp.asarray(np.stack([s.keypoints for s in samples_a]))
    kb = jnp.asarray(np.stack([s.keypoints for s in samples_b]))
    va = jnp.ones(ka.shape[:2], bool)
    vb = jnp.ones(kb.shape[:2], bool)
    return (
        gcn_mod.normalize_skeleton(ka, va),
        gcn_mod.normalize_skeleton(kb, vb),
        jnp.asarray(np.stack([s.progress for s in samples_a])),
        jnp.asarray(np.stack([s.progress for s in samples_b])),
    )


def build_error_batch(samples, references=None):
    """-> (kpts RAW, phase_logits, flags, valid, ref_warp RAW | None).

    The error head consumes RAW keypoints (it clip-normalizes internally to
    keep global-drift fault signals — models/error.py).  references:
    optional list of clean reference swings (one per sample); each is
    warped onto its sample's timeline via ground-truth progress
    (data.progress_align_reference — the GT version of the runtime DTW
    warp), raw, training the alignment-deviation features.
    """
    kpts = jnp.asarray(np.stack([s.keypoints for s in samples]))
    labels = jnp.asarray(np.stack([s.phase_labels for s in samples]))
    valid = jnp.ones(labels.shape, bool)
    # Train against ground-truth phases as sharp logits (the runtime feeds
    # the GCN's soft posteriors; GT one-hot is the asymptotic version).
    phase_logits = jax.nn.one_hot(labels, cfg_mod.NUM_PHASES) * 10.0
    flags = jnp.asarray(np.stack([s.error_flags for s in samples]))
    ref_warp = None
    if references is not None:
        ref_warp = jnp.asarray(np.stack([
            data_mod.progress_align_reference(s, r)
            for s, r in zip(samples, references)
        ]))
    return kpts, phase_logits, flags, valid, ref_warp


# ---------------------------------------------------------------------------
# Per-model training drivers
# ---------------------------------------------------------------------------

def train_pose(
    pose_cfg: cfg_mod.PoseConfig,
    train_cfg: cfg_mod.TrainConfig,
    image_hw=(256, 320),
    clips_per_epoch: int = 4,
    frames_per_clip: int = 16,
    log_every: int = 20,
    resume_from: str | None = None,
    checkpoint_tag: str | None = None,
    pool_clips: int = 0,
    arm_weight: float = 1.0,
    fast_frame_boost: float = 0.0,
    pool_fault_prob: float | None = None,
    fault_frame_boost: float = 0.0,
    fault_joint_boost: float = 0.0,
    arm_wander: float = 0.0,
    init_from: str | None = None,
):
    """Pose training.  pool_clips > 0 pre-renders that many clips ONCE and
    samples batches from the pool each step — rendering (host NumPy) is ~100x
    slower than a TPU step, so the pool keeps the chip fed.

    Arm-fidelity knobs (round-3: the pose front attenuated fast-arm fault
    deflections to 0.14-0.52x, capping e2e error-detection F1 at 0.67 —
    BASELINE.md):
      arm_weight > 1 upweights elbow/wrist heatmap loss (joints 7-10);
      fast_frame_boost > 0 oversamples pool frames by wrist travel (the
        motion-blurred downswing frames are rare under uniform sampling,
        so the net learns the canonical trajectory prior instead of
        tracking the blurred arm);
      pool_fault_prob overrides the pool's fault rate (faulty swings move
        arms OFF the canonical path — image-trust supervision);
      fault_frame_boost / fault_joint_boost oversample pool frames and
        upweight the heatmap loss of exactly the joints an injected fault
        displaced (SwingSample.fault_defl).  Motivation: chicken_wing
        deflects one elbow in a handful of follow-through frames — under
        travel-boosted sampling those frames are anti-selected and the
        net keeps the canonical-elbow prior (measured transfer gain 0.11
        vs 1.0+ for downswing wrist faults).
    """
    model = pose_mod.create_pose_model(pose_cfg)
    tx = make_optimizer(train_cfg)

    jw = np.ones(len(graph.COCO_KEYPOINTS), np.float32)
    jw[[7, 8, 9, 10]] = arm_weight       # elbows + wrists
    # Hips at half the arm boost: the probe shows hip-fault deflections
    # (early_extension 0.20, hanging_back 0.44) also under-transfer.
    jw[[11, 12]] = 1.0 + 0.5 * (arm_weight - 1.0)
    jw = jnp.asarray(jw)

    def loss_fn(params, batch):
        crops, targets, weights = batch
        pred = model.apply(params, crops)
        return losses.heatmap_mse(pred, targets, weights * jw), {}

    step_fn = _make_step(loss_fn, tx)
    params = model.init(
        jax.random.key(train_cfg.seed),
        jnp.zeros((1, *pose_cfg.input_hw, 3 * pose_cfg.in_frames))
    )
    if init_from:
        # Params-only warm start (fresh optimizer, step 0): finetune an
        # existing pose checkpoint under a CHANGED training target —
        # e.g. poseG = poseF warm-started at sigma 1.25, where from-scratch
        # training under the narrow target stalls (eval PCK 0.69 vs 1.0;
        # BASELINE.md round 4).  Unlike resume_from, no opt_state/step is
        # expected, so a compact .npz or a params Orbax dir both work.
        from golfaction_tpu.train import checkpoint as ckpt_mod

        if init_from.endswith(".npz"):
            params = ckpt_mod.restore_params_npz(init_from)
        else:
            params = ckpt_mod.restore_params(init_from, like=params)
    opt_state = tx.init(params)

    if pool_clips > 0:
        # Half the pool is rendered with camera shake so estimated-box /
        # moving-camera crops are in-distribution.
        half = pool_clips // 2
        fault_kw = {}
        if pool_fault_prob is not None:
            fault_kw = dict(fault_prob=pool_fault_prob, sev_range=(0.3, 1.0))
        if arm_wander > 0:
            # Pose-pool-only: smooth random elbow/wrist wander kills the
            # canonical-arm prior (see data.swing_keypoints docstring).
            fault_kw["arm_wander"] = arm_wander
        pool = data_mod.make_swing_batch(
            pool_clips - half, frames_per_clip, seed=train_cfg.seed,
            image_hw=image_hw, render=True,
            scene_families=data_mod.TRAIN_SCENE_FAMILIES, **fault_kw,
        ) + data_mod.make_swing_batch(
            half, frames_per_clip, seed=train_cfg.seed + 50_000,
            image_hw=image_hw, render=True, camera_jitter=0.02,
            scene_families=data_mod.TRAIN_SCENE_FAMILIES, **fault_kw,
        )
        jr = np.random.default_rng(train_cfg.seed + 31)
        pool_batches = [
            build_pose_batch([s], pose_cfg, frame_stride=1,
                             box_jitter=0.25, jitter_rng=jr,
                             full_frame_prob=0.25)
            for s in pool
        ]
        crops = jnp.concatenate([b[0] for b in pool_batches])
        targets = jnp.concatenate([b[1] for b in pool_batches])
        weights = jnp.concatenate([b[2] for b in pool_batches])

        # Fault deflection per pooled crop/joint, normalized so ~15 px of
        # displacement reaches full boost (chicken_wing peaks at ~26 px at
        # the 540-row training render; an absolute scale keeps small-but-
        # real faults from being drowned by swaying's 68 px).
        defl = np.concatenate([
            s.fault_defl if s.fault_defl is not None
            else np.zeros(s.keypoints.shape[:2], np.float32)
            for s in pool
        ])                                              # [N, V] px
        defl_unit = np.minimum(defl / 15.0, 2.0) / 2.0  # [N, V] in [0, 1]
        if fault_joint_boost > 0:
            weights = weights * jnp.asarray(
                1.0 + fault_joint_boost * defl_unit)
        n = crops.shape[0]
        per_step = clips_per_epoch * max(frames_per_clip // 4, 1)

        # Sampling probabilities over pooled crops: uniform, optionally
        # boosted toward high-wrist-travel (motion-blurred) frames and
        # toward frames where an injected fault displaced any joint.
        travel = np.concatenate([
            np.linalg.norm(
                np.diff(s.keypoints[:, 9, :2], axis=0, prepend=s.keypoints[:1, 9, :2]),
                axis=-1,
            )
            for s in pool
        ])
        p_sample = (1.0 + fast_frame_boost * travel / max(travel.max(), 1e-6)
                    + fault_frame_boost * defl_unit.max(axis=-1))
        p_sample /= p_sample.sum()

        # Horizontal-flip augmentation table: mirror the crop's W axis and
        # swap left/right joint channels (graph.FLIP_PAIRS).
        perm = np.arange(len(graph.COCO_KEYPOINTS))
        for a, b in graph.FLIP_PAIRS:
            perm[a], perm[b] = b, a
        perm = jnp.asarray(perm)

        def batch_fn(step):
            rng = np.random.default_rng(train_cfg.seed + 7919 * step)
            idx = jnp.asarray(rng.choice(n, size=min(per_step, n),
                                         replace=False, p=p_sample))
            c, t, w = crops[idx], targets[idx], weights[idx]
            if rng.uniform() < 0.5:
                k = c.shape[0] // 2  # flip the first half of the batch
                c = jnp.concatenate([c[:k, :, ::-1], c[k:]])
                t = jnp.concatenate([t[:k][:, perm][..., ::-1], t[k:]])
                w = jnp.concatenate([w[:k][:, perm], w[k:]])
            # Photometric domain randomization (round 3): the scene-family
            # holdout exposed background/color overfitting (family-2 PCK
            # 0.51 vs 0.95 in-domain).  Per-crop color cast / contrast /
            # brightness / noise + random-erase clutter patches, applied in
            # normalized-crop space; the color cast is shared across the
            # temporal channel groups (consistent lighting over t±1).
            B, H, W_, C = c.shape
            # Ranges sized to span the held-out eval families' statistics
            # (dusk/composite sit ~0.14 darker with R/G cast ratios ~1.65
            # vs the train families' ~0.8 — measured in train/data.py
            # family stats), so transfer is an extrapolation of at most
            # one aug-width, not a leap.
            cast = np.tile(rng.uniform(0.6, 1.4, (B, 1, 1, 3)),
                           (1, 1, 1, C // 3)).astype(np.float32)
            contr = rng.uniform(0.65, 1.45, (B, 1, 1, 1)).astype(np.float32)
            bright = rng.normal(0, 0.32, (B, 1, 1, 1)).astype(np.float32)
            m = jnp.mean(c, axis=(1, 2, 3), keepdims=True)
            c = (c - m) * jnp.asarray(contr * cast) + m + jnp.asarray(bright)
            # Low-frequency multiplicative shading (lens vignette / uneven
            # lighting): per-crop linear gain field over the crop plane.
            # Crops are ImageNet-standardized (p - mean)/std, so a true
            # pixel-space gain p' = g*p maps to g*c + (g-1)*mean/std — the
            # additive term dominates (mean/std ≈ 2) and is what actually
            # darkens toward black rather than toward mid-gray.
            yy = np.linspace(-0.5, 0.5, H, dtype=np.float32)[None, :, None, None]
            xx = np.linspace(-0.5, 0.5, W_, dtype=np.float32)[None, None, :, None]
            ga = rng.uniform(-0.5, 0.5, (B, 1, 1, 1)).astype(np.float32)
            gb = rng.uniform(-0.5, 0.5, (B, 1, 1, 1)).astype(np.float32)
            g = np.clip(1.0 + ga * yy + gb * xx, 0.4, 1.6)
            from golfaction_tpu.ops.preprocess import (IMAGENET_MEAN,
                                                       IMAGENET_STD)
            k_ms = np.tile(
                (np.asarray(IMAGENET_MEAN, np.float32)
                 / np.asarray(IMAGENET_STD, np.float32))[None, None, None],
                (1, 1, 1, C // 3))
            c = c * jnp.asarray(g) + jnp.asarray((g - 1.0) * k_ms)
            sig = rng.uniform(0, 0.08, (B, 1, 1, 1)).astype(np.float32)
            c = c + jnp.asarray(rng.normal(0, 1, c.shape).astype(np.float32)
                                * sig)
            mask = np.zeros((B, H, W_, 1), np.float32)
            colors = np.tile(rng.normal(0, 1, (B, 1, 1, 3)),
                             (1, 1, 1, C // 3)).astype(np.float32)
            for bi in range(B):
                for _ in range(int(rng.integers(0, 3))):  # 0-2 erase rects
                    eh = int(rng.uniform(0.08, 0.3) * H)
                    ew = int(rng.uniform(0.08, 0.3) * W_)
                    y0 = int(rng.integers(0, max(H - eh, 1)))
                    x0 = int(rng.integers(0, max(W_ - ew, 1)))
                    mask[bi, y0:y0 + eh, x0:x0 + ew] = 1.0
            mask_j = jnp.asarray(mask)
            c = c * (1 - mask_j) + jnp.asarray(colors) * mask_j
            return c, t, w
    else:
        def batch_fn(step):
            samples = data_mod.make_swing_batch(
                clips_per_epoch, frames_per_clip, seed=train_cfg.seed + step,
                image_hw=image_hw, render=True,
                scene_families=data_mod.TRAIN_SCENE_FAMILIES,
            )
            return build_pose_batch(samples, pose_cfg)

    return _run_training(step_fn, params, opt_state, batch_fn, train_cfg,
                         log_every, resume_from=resume_from,
                         checkpoint_tag=checkpoint_tag)


def train_gcn(
    gcn_cfg: cfg_mod.GCNConfig,
    train_cfg: cfg_mod.TrainConfig,
    frames_per_clip: int = 64,
    log_every: int = 20,
    resume_from: str | None = None,
    checkpoint_tag: str | None = None,
):
    model = gcn_mod.create_gcn_model(gcn_cfg)
    tx = make_optimizer(train_cfg)

    def loss_fn(params, batch):
        sk, labels, valid = batch
        logits = model.apply(params, sk, valid, deterministic=False,
                             rngs={"dropout": jax.random.key(0)})
        loss = losses.phase_cross_entropy(logits, labels, valid, label_smoothing=0.05)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return loss, {"acc": acc}

    step_fn = _make_step(loss_fn, tx)
    t0 = frames_per_clip
    params = model.init(
        jax.random.key(train_cfg.seed),
        jnp.zeros((1, t0, gcn_cfg.num_joints, gcn_cfg.in_channels)),
        jnp.ones((1, t0), bool),
    )
    opt_state = tx.init(params)

    def batch_fn(step):
        samples = data_mod.make_swing_batch(
            train_cfg.batch_size, frames_per_clip, seed=train_cfg.seed + step
        )
        return build_gcn_batch(samples)

    return _run_training(step_fn, params, opt_state, batch_fn, train_cfg,
                         log_every, aux_keys=("acc",), resume_from=resume_from,
                         checkpoint_tag=checkpoint_tag)


def train_align(
    align_cfg: cfg_mod.AlignConfig,
    train_cfg: cfg_mod.TrainConfig,
    frames_per_clip: int = 48,
    log_every: int = 20,
    resume_from: str | None = None,
    checkpoint_tag: str | None = None,
):
    model = align_mod.create_align_model(align_cfg)
    tx = make_optimizer(train_cfg)

    def loss_fn(params, batch):
        sk_a, sk_b, prog_a, prog_b = batch
        va = jnp.ones(sk_a.shape[:2], bool)
        vb = jnp.ones(sk_b.shape[:2], bool)
        ea = model.apply(params, sk_a, va)
        eb = model.apply(params, sk_b, vb)
        div = losses.softdtw_divergence_batched(ea, eb, align_cfg.gamma).mean()
        tcc = losses.alignment_contrastive_batch(ea, eb, prog_a, prog_b).mean()
        return div + 10.0 * tcc, {"sdtw_div": div, "tcc": tcc}

    step_fn = _make_step(loss_fn, tx)
    params = model.init(
        jax.random.key(train_cfg.seed),
        jnp.zeros((1, frames_per_clip, align_cfg.num_joints, align_cfg.in_channels)),
        jnp.ones((1, frames_per_clip), bool),
    )
    opt_state = tx.init(params)

    def batch_fn(step):
        rng = np.random.default_rng(train_cfg.seed + step)
        # Pairs: same swing content, different tempo/style/noise.
        sa, sb = [], []
        for _ in range(train_cfg.batch_size):
            warp_a, warp_b = rng.uniform(-0.8, 0.8, 2)
            r = np.random.default_rng(rng.integers(1 << 31))
            sa.append(data_mod.swing_keypoints(frames_per_clip, r, tempo_warp=warp_a))
            r = np.random.default_rng(rng.integers(1 << 31))
            sb.append(data_mod.swing_keypoints(frames_per_clip, r, tempo_warp=warp_b))
        return build_align_batch(sa, sb)

    return _run_training(step_fn, params, opt_state, batch_fn, train_cfg,
                         log_every, aux_keys=("sdtw_div", "tcc"),
                         resume_from=resume_from, checkpoint_tag=checkpoint_tag)


def train_error(
    error_cfg: cfg_mod.ErrorConfig,
    train_cfg: cfg_mod.TrainConfig,
    frames_per_clip: int = 64,
    log_every: int = 20,
    resume_from: str | None = None,
    checkpoint_tag: str | None = None,
):
    model = error_mod.create_error_model(error_cfg)
    tx = make_optimizer(train_cfg)

    def loss_fn(params, batch):
        sk, phase_logits, flags, valid, ref_warp = batch
        logits = model.apply(params, sk, phase_logits, valid, ref_warp)
        loss = losses.error_bce(logits, flags)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        acc = (pred == flags).mean()
        return loss, {"acc": acc}

    step_fn = _make_step(loss_fn, tx)
    t0 = frames_per_clip
    params = model.init(
        jax.random.key(train_cfg.seed),
        jnp.zeros((1, t0, error_cfg.num_joints, error_cfg.in_channels)),
        jnp.zeros((1, t0, error_cfg.num_phases)),
        jnp.ones((1, t0), bool),
    )
    opt_state = tx.init(params)

    def batch_fn(step):
        # sev_range widened below the generator default: the pose front
        # attenuates fault deflections, so runtime patterns look milder.
        samples = data_mod.make_swing_batch(
            train_cfg.batch_size, frames_per_clip,
            seed=train_cfg.seed + step, fault_prob=0.5,
            sev_range=(0.3, 1.0),
        )
        # Alternate with/without a reference so one parameter set serves
        # both runtime modes (analyze with and without a pro swing).
        if step % 2 == 0:
            refs = data_mod.make_swing_batch(
                train_cfg.batch_size, frames_per_clip,
                seed=train_cfg.seed + 100_000 + step, fault_prob=0.0,
            )
            return build_error_batch(samples, refs)
        return build_error_batch(samples)

    return _run_training(step_fn, params, opt_state, batch_fn, train_cfg,
                         log_every, aux_keys=("acc",), resume_from=resume_from,
                         checkpoint_tag=checkpoint_tag)
