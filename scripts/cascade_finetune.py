"""Cascade fine-tuning: adapt the skeleton models to the pipeline's own
predictions.

The GCN / error heads are first trained on ground-truth skeletons; at
runtime they consume keypoints predicted by the pose stage from *estimated*
person boxes, which is a shifted distribution (scripts/demo_e2e.py
quantifies the gap).  This script closes it:

  1. Render held-out clips, run the REAL pipeline front (estimated boxes ->
     preprocess -> pose -> decode) to collect predicted keypoints.
  2. Fine-tune the GCN on (predicted skeletons, true phase labels).
  3. Re-train the error head on (predicted skeletons, the fine-tuned GCN's
     posteriors, true fault flags) — exactly the runtime inputs.
  4. Save updated checkpoints into the artifacts tree.

    python scripts/cascade_finetune.py --clips 48 --steps 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--clips", type=int, default=48)
    ap.add_argument("--aug", type=int, default=256,
                    help="extra noise-matched synthetic (unrendered) clips")
    ap.add_argument("--calib-clips", type=int, default=16,
                    help="held-out rendered clips for threshold calibration")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--refine-steps", type=int, default=0,
                    help="train the keypoint-sequence refiner "
                         "(models/refine.py) on (predicted, GT) pairs for "
                         "this many steps (0 = off); downstream GCN/error "
                         "cascades then consume refined keypoints")
    ap.add_argument("--refine-fault-weight", type=float, default=3.0,
                    help="refiner loss upweight for fault-displaced "
                         "joints/frames (SwingSample.fault_defl)")
    ap.add_argument("--pool-rendered-frac", type=float, default=0.0,
                    help="fraction of the pool half-batch drawn from the "
                         "RENDERED clips (real heatmap spread) instead of "
                         "uniformly over rendered+synthetic")
    ap.add_argument("--spread", action="store_true",
                    help="train the error head WITH heatmap-spread "
                         "features (error.spread_features): collects real "
                         "spread through the pose front, simulates "
                         "g(1-g)-consistent spread for synthetic clips, "
                         "and re-initializes the head (feature dim "
                         "changes).  Subsequent runs auto-detect from the "
                         "saved checkpoint")
    ap.add_argument("--modes", action="store_true",
                    help="train the error head WITH secondary-mode "
                         "features (error.mode_features, sigma-1.25 "
                         "successor to --spread): collects the real "
                         "tracked-decode runner-up modes through the pose "
                         "front, simulates (1-g)-consistent hidden modes "
                         "for synthetic clips, and re-initializes the "
                         "head (feature dim changes).  Requires/forces "
                         "pose.decode_tracking >= 2")
    ap.add_argument("--collect-cache", default=None,
                    help="pickle path for the rendered-clip collection "
                         "(pred keypoints/aux/labels/flags): saved after "
                         "a fresh collection, reused when the file "
                         "exists — re-running the cascade with different "
                         "training knobs skips the ~20 min render + "
                         "pose-front pass (same seeds => identical data)")
    ap.add_argument("--fault-weight", action="append", default=[],
                    metavar="NAME=W",
                    help="per-fault BCE loss weight for the error cascade "
                         "(repeatable), e.g. --fault-weight "
                         "early_extension=3: subtle faults otherwise "
                         "vanish into the aggregate loss (train acc 0.97 "
                         "with EE never learned — round-5 diagnosis)")
    ap.add_argument("--error-steps", type=int, default=None,
                    help="error-head cascade steps (default 2*--steps)")
    ap.add_argument("--error-lr", type=float, default=None,
                    help="error-head learning rate (default --lr); long "
                         "fresh-head runs want a lower tail")
    ap.add_argument("--gain-profile", default=None,
                    help="probe_arm_gain.json with the promoted pose "
                         "front's measured per-fault/per-joint deflection "
                         "gains; conditions the synthetic attenuation "
                         "sampling on it (default: "
                         "<artifacts>/probe_arm_gain.json when present)")
    args = ap.parse_args()

    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import error as error_mod
    from golfaction_tpu.models import gcn as gcn_mod
    from golfaction_tpu.pipeline import orchestrator
    from golfaction_tpu.train import checkpoint, data, loops, losses, metrics

    def log(m):
        print(m, file=sys.stderr, flush=True)

    cfg = cfg_mod.get_config("full_pipeline", video_hw=tuple(args.hw),
                             length_buckets=(args.frames,))
    cfg = checkpoint.config_for_artifacts(cfg, args.artifacts)
    if args.spread and not cfg.error.spread_features:
        cfg = cfg_mod.apply_overrides(cfg, ["error.spread_features=True"])
    if args.modes:
        ov = []
        if not cfg.error.mode_features:
            ov += ["error.mode_features=True", "error.spread_features=False"]
        if cfg.pose.decode_tracking < 2:
            ov += ["pose.decode_tracking=4", "pose.track_suppress_radius=2.0"]
        if ov:
            cfg = cfg_mod.apply_overrides(cfg, ov)
    pipe = orchestrator.Pipeline(cfg, seed=0)
    like = dict(pipe.params)
    if args.spread or args.modes:
        # The pre-spread error checkpoint cannot restore into the widened
        # head; load everything else and keep the fresh error init (it is
        # re-initialized and fully trained below anyway).
        err_like = like.pop("error")
        pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                      like=like)
        pipe.params["error"] = err_like
    else:
        pipe.params = checkpoint.load_pipeline_params(args.artifacts,
                                                      like=like)

    # ---- 1. Collect predicted keypoints through the real pipeline front ----
    T = args.frames
    use_spread = cfg.error.spread_features
    use_modes = cfg.error.mode_features
    use_aux = use_spread or use_modes
    import pickle

    cache_hit = args.collect_cache and os.path.exists(args.collect_cache)
    from golfaction_tpu.pipeline import video_io
    from golfaction_tpu.ops import affine

    if cache_hit:
        # Rendering consumes rng BEFORE keypoint placement, so the sample
        # ground truth cannot be regenerated with render=False — the cache
        # carries it (frames are not needed after collection).
        with open(args.collect_cache, "rb") as f:
            cc = pickle.load(f)
        pred_kpts, pred_aux = cc["pred_kpts"], cc["pred_aux"]
        labels, flags = cc["labels"], cc["flags"]
        samples = [data.SwingSample(keypoints=k, phase_labels=l,
                                    error_flags=fl, progress=pr,
                                    fault_defl=fd)
                   for k, l, fl, pr, fd in zip(
                       cc["gt_keypoints"], labels, flags,
                       cc["gt_progress"], cc["gt_fault_defl"])]
        log(f"collection loaded from {args.collect_cache} "
            f"({len(pred_kpts)} clips)")
        assert len(pred_kpts) == args.clips, "cache/clip-count mismatch"
    else:
        samples = data.make_swing_batch(
            args.clips, T, seed=550_000, image_hw=tuple(args.hw),
            render=True, fault_prob=0.5,
            scene_families=data.TRAIN_SCENE_FAMILIES)
        log(f"rendering {args.clips} clips + running pose front ...")
        pred_kpts, pred_aux, labels, flags = [], [], [], []
        for s in samples:
            boxes = video_io.estimate_person_boxes(s.frames)
            if use_aux:
                kp, spr = pipe._pose_aux(pipe.params, jnp.asarray(s.frames),
                                         jnp.asarray(boxes))
                pred_aux.append(np.asarray(spr))
            else:
                kp = pipe._pose_only(pipe.params, jnp.asarray(s.frames),
                                     jnp.asarray(boxes))
            pred_kpts.append(np.asarray(kp))
            labels.append(s.phase_labels)
            flags.append(s.error_flags)
        pred_kpts = np.stack(pred_kpts)                # [N, T, V, 3]
        labels = np.stack(labels)
        flags = np.stack(flags)
        if args.collect_cache:
            with open(args.collect_cache, "wb") as f:
                pickle.dump({
                    "pred_kpts": pred_kpts,
                    "pred_aux": pred_aux if use_aux else [],
                    "labels": labels, "flags": flags,
                    "gt_keypoints": [s.keypoints for s in samples],
                    "gt_progress": [s.progress for s in samples],
                    "gt_fault_defl": [s.fault_defl for s in samples],
                }, f)
            log(f"collection cached to {args.collect_cache}")

    blur_iso = None
    clean_rel = clean_sep = None
    mode_miss = 0.15
    if use_aux:
        pred_aux = np.stack(pred_aux)                  # [N, T, V, 4]
    if use_modes:
        # Measured per-joint noise floor of the REAL runner-up modes
        # (mass ratio + separation on typical joints) — the synthetic
        # clips must match it or "quiet second mode" becomes a
        # synthetic-domain giveaway (same lesson as blur_iso for spread).
        present = pred_aux[..., 3] > 0                 # [N, T, V]
        mode_miss = float(np.clip(1.0 - present.mean(), 0.0, 0.9))
        V = pred_aux.shape[2]
        clean_rel = np.empty(V, np.float32)
        clean_sep = np.empty(V, np.float32)
        for j in range(V):
            m = present[..., j]
            clean_rel[j] = float(np.median(pred_aux[..., j, 2][m])) \
                if m.any() else 0.1
            clean_sep[j] = float(np.median(pred_aux[..., j, 3][m])) \
                if m.any() else 4.0
        log(f"[modes] measured runner-up floor: miss {mode_miss:.2f}, "
            f"rel med elbows {clean_rel[7]:.2f}/{clean_rel[8]:.2f} "
            f"wrists {clean_rel[9]:.2f}/{clean_rel[10]:.2f}; sep med "
            f"elbows {clean_sep[7]:.0f}/{clean_sep[8]:.0f} px")
    if use_spread:
        pred_spread = pred_aux                         # [N, T, V, 4]
        # Measured per-joint isotropic excess variance of the REAL pose
        # front (motion blur widens blobs even on clean joints): the
        # synthetic clips' spread must match it or blob width becomes a
        # synthetic-domain giveaway (same lesson as the AR(1) noise match).
        iso_exc = np.maximum(
            0.5 * (pred_spread[..., 0] + pred_spread[..., 2])
            - pred_spread[..., 3], 0.0)
        blur_iso = np.median(iso_exc, axis=(0, 1)).astype(np.float32)
        log(f"[spread] measured blur excess (median px²): "
            f"hips {blur_iso[11]:.0f} elbows {blur_iso[7]:.0f}/"
            f"{blur_iso[8]:.0f} wrists {blur_iso[9]:.0f}/{blur_iso[10]:.0f}")

    # Noise-matched synthetic augmentation: measure the pose stage's actual
    # per-joint residual spread AND temporal autocorrelation on the rendered
    # set, then generate many more clips as GT keypoints + AR(1) noise.
    # Matching the correlation matters as much as the scale: pose residuals
    # are temporally smooth, and the error head's angular-velocity features
    # blow iid noise up into the dominant signal (a head cascaded on iid
    # noise collapsed on real predicted keypoints — round-2 lesson).
    gt = np.stack([s.keypoints for s in samples])
    resid = pred_kpts[..., :2] - gt[..., :2]
    sigma = float(np.median(np.abs(resid))) * 1.4826   # robust std estimate
    # Per-joint scale profile: wrists/elbows are far noisier than hips —
    # an iid-across-joints noise model is itself a domain giveaway.
    sigma_v = np.median(np.abs(resid), axis=(0, 1, 3)) * 1.4826  # [V]
    sigma_v = np.maximum(sigma_v, 0.25 * sigma)[None, None, :, None]
    r0 = resid - resid.mean(axis=1, keepdims=True)
    rho = float(np.clip(
        (r0[:, 1:] * r0[:, :-1]).sum() / max((r0 ** 2).sum(), 1e-9), 0.0, 0.99
    ))
    log(f"pose residual sigma ≈ {sigma:.2f} px, lag-1 rho ≈ {rho:.2f}; "
        f"generating {args.aug} noise-matched synthetic clips")
    rng_aug = np.random.default_rng(123)
    aug = data.make_swing_batch(args.aug, T, seed=560_000,
                                image_hw=tuple(args.hw), fault_prob=0.5,
                                sev_range=(0.3, 1.0))
    aug_k = np.stack([s.keypoints for s in aug])   # already image-space
    noise = np.empty((len(aug), T, *aug_k.shape[2:3], 2), np.float32)
    noise[:, 0] = rng_aug.normal(0, 1.0, noise[:, 0].shape)
    innov = np.sqrt(1 - rho ** 2)
    for tt in range(1, T):
        noise[:, tt] = rho * noise[:, tt - 1] + rng_aug.normal(
            0, innov, noise[:, 0].shape)
    aug_k[..., :2] += noise * sigma_v

    def _next_step(tag):
        cur = checkpoint.latest_step_dir(f"{args.artifacts}/params/{tag}")
        base = int(cur.rsplit("_", 1)[1]) if cur else 0
        return base + 1

    # ---- 1b. Optional: train the keypoint-sequence refiner ----
    # Inputs mirror runtime (real pipeline predictions) plus an infinite
    # stream of synthetic attenuated pairs: input = clean + (faulty -
    # clean) * g + AR(1) noise, target = faulty — directly teaching the
    # inverse of the pose front's measured per-joint attenuation.
    refine_apply = None
    if args.refine_steps == 0 and "refine" in pipe.params:
        # A trained refiner is already in the artifacts tree and WILL run
        # at inference (config_for_artifacts auto-enables it): the cascades
        # below must train on refined keypoints or the heads see a
        # distribution the runtime never produces.
        from golfaction_tpu.models import refine as refine_mod

        log("[refine] applying restored refiner to cascade inputs")
        rmodel0 = refine_mod.create_refine_model(cfg.refine)
        rp0 = pipe.params["refine"]
        refine_apply = jax.jit(lambda k, v: rmodel0.apply(rp0, k, v))
        pred_kpts = np.asarray(refine_apply(
            jnp.asarray(pred_kpts), jnp.ones(pred_kpts.shape[:2], bool)))
        aug_k = np.asarray(refine_apply(
            jnp.asarray(aug_k), jnp.ones(aug_k.shape[:2], bool)))
    if args.refine_steps > 0:
        from golfaction_tpu.models import refine as refine_mod

        rmodel = refine_mod.create_refine_model(cfg.refine)
        rng_r = np.random.default_rng(77)
        rparams = rmodel.init(jax.random.key(7),
                              jnp.zeros((1, T, 17, 3)), jnp.ones((1, T), bool))
        rtx = optax.adamw(1e-3, weight_decay=1e-4)
        ropt = rtx.init(rparams)

        defl_rend = np.stack([
            s.fault_defl if s.fault_defl is not None
            else np.zeros((T, 17), np.float32) for s in samples])
        scale_px = 0.65 * args.hw[0] / 2.0      # torso-ish px scale

        def refine_loss(params, batch):
            inp, tgt, w, v = batch
            out = rmodel.apply(params, inp, v)
            err = ((out[..., :2] - tgt[..., :2]) / scale_px) ** 2
            err = (err.sum(-1) * w * v[..., None]).sum() / jnp.maximum(
                (w * v[..., None]).sum(), 1.0)
            return err, {}

        rstep = loops._make_step(refine_loss, rtx)
        halfr = max(min(args.batch_size // 2, len(samples)), 1)

        def _weights(defl):
            return 1.0 + args.refine_fault_weight * np.minimum(
                defl / 15.0, 2.0) / 2.0

        def refine_batch(i):
            # Half: real pipeline pairs from the rendered pool.
            idx = rng_r.choice(len(samples), size=halfr, replace=False)
            inp_r = np.asarray(pred_kpts)[idx]
            tgt_r = gt[idx]
            w_r = _weights(defl_rend[idx])
            # Half: fresh synthetic attenuated pairs.
            inp_s, tgt_s, w_s = [], [], []
            for j in range(halfr):
                rd = np.random.default_rng(700_000 + i * 97 + j)
                faults = {}
                if rd.uniform() < 0.7:
                    kk = rd.integers(1, 3)
                    for name in rd.choice(cfg_mod.SWING_ERRORS, size=kk,
                                          replace=False):
                        faults[str(name)] = float(rd.uniform(0.3, 1.0))
                tempo = float(rd.uniform(-0.8, 0.8))
                seed_b = 710_000 + i * 97 + j
                sf = data.swing_keypoints(T, np.random.default_rng(seed_b),
                                          tempo_warp=tempo, faults=faults)
                sc = data.swing_keypoints(T, np.random.default_rng(seed_b),
                                          tempo_warp=tempo)
                sf = data.place_in_image(sf, tuple(args.hw),
                                         person_height_px=0.65 * args.hw[0],
                                         rng=np.random.default_rng(seed_b + 1))
                sc = data.place_in_image(sc, tuple(args.hw),
                                         person_height_px=0.65 * args.hw[0],
                                         rng=np.random.default_rng(seed_b + 1))
                g = rd.uniform(0.35, 1.0, (1, 17, 1))
                inp1 = sc.keypoints + (sf.keypoints - sc.keypoints) * g
                nz1 = np.empty((T, 17, 2), np.float32)
                nz1[0] = rd.normal(0, 1.0, (17, 2))
                for tt in range(1, T):
                    nz1[tt] = rho * nz1[tt - 1] + rd.normal(0, innov, (17, 2))
                inp1 = inp1.copy()
                inp1[..., :2] += nz1 * sigma_v[0]
                # Attenuation-correlated confidence: at runtime the decoder
                # scores an attenuated (blurred/occluded) joint LOW — that
                # score is the refiner's cue for where to amplify.  The
                # synthetic pairs must carry it or half the training data
                # teaches "confidence is meaningless".
                defl_on = (np.abs(sf.keypoints[..., :2]
                                  - sc.keypoints[..., :2]).sum(-1,
                                                               keepdims=True)
                           > 1e-6)
                score = (1.0 - 0.6 * (1.0 - g) * defl_on
                         + rd.normal(0, 0.05, (T, 17, 1)))
                inp1[..., 2:] = np.clip(score, 0.05, 1.0)
                inp_s.append(inp1)
                tgt_s.append(sf.keypoints)
                w_s.append(_weights(sf.fault_defl))
            inp = jnp.asarray(np.concatenate([inp_r, np.stack(inp_s)]))
            tgt = jnp.asarray(np.concatenate([tgt_r, np.stack(tgt_s)]))
            w = jnp.asarray(np.concatenate([w_r, np.stack(w_s)]))
            v = jnp.ones(inp.shape[:2], bool)
            return inp, tgt, w, v

        log(f"[refine] training {args.refine_steps} steps ...")
        for i in range(args.refine_steps):
            rparams, ropt, aux = rstep(rparams, ropt, refine_batch(i))
            if i % max(args.refine_steps // 5, 1) == 0 \
                    or i == args.refine_steps - 1:
                log(f"[refine-cascade] step {i} "
                    f"loss {float(aux['loss']):.5f}")
        ref_ck = checkpoint.save_params(f"{args.artifacts}/params/refine",
                                        rparams, step=_next_step("refine"))
        log(f"[refine] saved {ref_ck}")
        refine_apply = jax.jit(lambda k, v: rmodel.apply(rparams, k, v))
        # Downstream cascades consume refined keypoints — runtime parity.
        pred_kpts = np.asarray(refine_apply(
            jnp.asarray(pred_kpts), jnp.ones(pred_kpts.shape[:2], bool)))
        aug_k = np.asarray(refine_apply(
            jnp.asarray(aug_k), jnp.ones(aug_k.shape[:2], bool)))
        pipe.params = dict(pipe.params, refine=rparams)

    pool_aux = None
    if use_spread:
        # Aug-pool clips carry FULL (unattenuated) deflections, so their
        # simulated blobs are isotropic: floor + measured blur excess only.
        aug_aux = data.synth_spread(aug_k, cfg.pose, tuple(args.hw),
                                    rng_aug, blur_iso=blur_iso)
        pool_aux = jnp.asarray(np.concatenate([pred_aux, aug_aux]))
    elif use_modes:
        # Aug-pool keypoints carry FULL deflections (nothing suppressed),
        # so their runner-up modes are the measured noise floor only.
        aug_aux = data.synth_modes(aug_k, rng_aug, clean_rel=clean_rel,
                                   clean_sep=clean_sep, miss_prob=mode_miss)
        pool_aux = jnp.asarray(np.concatenate([pred_aux, aug_aux]))
    pred_kpts = np.concatenate([pred_kpts, aug_k])
    labels = np.concatenate([labels, np.stack([s.phase_labels for s in aug])])
    flags = np.concatenate([flags, np.stack([s.error_flags for s in aug])])

    pred_kpts = jnp.asarray(pred_kpts)
    labels = jnp.asarray(labels)
    flags = jnp.asarray(flags)
    valid = jnp.ones(labels.shape, bool)
    sk = gcn_mod.normalize_skeleton(pred_kpts, valid)
    N = sk.shape[0]
    log(f"total training clips (rendered+synthetic): {N}")

    tx = optax.adamw(args.lr, weight_decay=1e-4)
    rng = np.random.default_rng(0)

    # ---- 2. Fine-tune GCN on predicted skeletons ----
    gcn_model = gcn_mod.create_gcn_model(cfg.gcn)

    def gcn_loss(params, batch):
        s, l, v = batch
        logits = gcn_model.apply(params, s, v)
        loss = losses.phase_cross_entropy(logits, l, v, label_smoothing=0.05)
        acc = (jnp.argmax(logits, -1) == l).mean()
        return loss, {"acc": acc}

    step = loops._make_step(gcn_loss, tx)
    gparams = pipe.params["gcn"]
    gopt = tx.init(gparams)
    for i in range(args.steps):
        idx = jnp.asarray(rng.choice(N, size=min(args.batch_size, N), replace=False))
        gparams, gopt, aux = step(gparams, gopt, (sk[idx], labels[idx], valid[idx]))
        if i % max(args.steps // 5, 1) == 0 or i == args.steps - 1:
            log(f"[gcn-cascade] step {i} loss {float(aux['loss']):.4f} "
                f"acc {float(aux['acc']):.4f}")
    gcn_ck = checkpoint.save_params(f"{args.artifacts}/params/gcn", gparams,
                                    step=_next_step("gcn"))

    # ---- 3. Re-train error head on runtime inputs ----
    gcn_logits = jax.jit(lambda p, s, v: gcn_model.apply(p, s, v))(
        gparams, sk, valid)
    err_model = error_mod.create_error_model(cfg.error)

    # Reference-aligned deviation features (the runtime compare mode): clean
    # reference swings warped onto each clip's timeline by true progress,
    # with pose-matched noise — alternate batches with/without so one
    # parameter set serves both analyze() modes (mirrors loops.train_error).
    refs = data.make_swing_batch(8, T, seed=570_000, image_hw=tuple(args.hw),
                                 fault_prob=0.0)
    all_samples = list(samples) + list(aug)
    ref_np = np.stack([
        data.progress_align_reference(s, refs[i % len(refs)])
        for i, s in enumerate(all_samples)
    ])
    ref_np[..., :2] += rng_aug.normal(0, sigma, ref_np[..., :2].shape)
    ref_warp = jnp.asarray(ref_np)  # raw: the error head clip-normalizes

    fw = None
    if args.fault_weight:
        fw = np.ones(cfg_mod.NUM_ERRORS, np.float32)
        for spec in args.fault_weight:
            name, wv = spec.split("=")
            fw[cfg_mod.SWING_ERRORS.index(name)] = float(wv)
        log(f"[error-cascade] per-fault loss weights: {fw.tolist()}")

    def err_loss(params, batch):
        s, pl_, f, v, rw, sp = batch
        logits = err_model.apply(params, s, pl_, v, rw, sp)
        loss = losses.error_bce(logits, f, fault_weights=fw)
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        acc = (pred == f).mean()
        return loss, {"acc": acc}

    etx = optax.adamw(args.error_lr or args.lr, weight_decay=1e-4)
    estep = loops._make_step(err_loss, etx)
    eparams = pipe.params["error"]
    if use_aux:
        # The aux block changes the head's feature dim; a checkpoint
        # trained without it cannot be restored into the new shape — start
        # the head fresh (it is small; the cascade run trains it fully).
        fresh = err_model.init(
            jax.random.key(11), pred_kpts[:1], gcn_logits[:1], valid[:1])
        shapes_ok = jax.tree.all(jax.tree.map(
            lambda a, b: a.shape == b.shape, eparams, fresh)) \
            if jax.tree.structure(eparams) == jax.tree.structure(fresh) \
            else False
        if not shapes_ok:
            log("[error-cascade] feature dim changed (aux features): "
                "re-initializing the error head")
            eparams = fresh
    eopt = etx.init(eparams)

    # Infinite-stream batches: HALF each batch is FRESH synthetic clips
    # (new seed every step, AR(1) pose-noise) so the head cannot memorize a
    # fixed set (a fixed 432-clip cascade hit train acc 1.0 with held-out
    # F1 ~0.3 — pure memorization); the other half samples the rendered
    # real-pipeline pool to keep the true predicted-keypoint distribution
    # in the mix.
    half = max(args.batch_size // 2, 1)
    gcn_fwd = jax.jit(lambda p, s, v: gcn_model.apply(p, s, v))

    # Measured attenuation profile: condition the simulated per-joint gain
    # on the promoted pose front's probe (scripts/probe_arm_gain.py).  The
    # broad U(0.35, 1) prior misses measured reality — e.g. chicken_wing's
    # elbow passes at gain ~0.18, BELOW the prior's floor, so a head
    # trained on the prior alone never sees the attenuation level it must
    # detect at runtime.
    prof_path = args.gain_profile or f"{args.artifacts}/probe_arm_gain.json"
    gain_tab = data.load_gain_profile(prof_path)
    if gain_tab is not None:
        log(f"attenuation sampling conditioned on measured profile "
            f"{prof_path} ({int(np.isfinite(gain_tab).sum())} fault-joint "
            f"gains)")
    beta_tab = None
    if use_spread:
        beta_path = f"{args.artifacts}/probe_heatmap_spread.json"
        beta_tab = data.load_spread_profile(beta_path)
        if beta_tab is not None:
            log(f"synthetic spread scaled by measured per-fault transfer "
                f"{beta_path} ({int(np.isfinite(beta_tab).sum())} "
                f"fault-joint betas)")
    pres_tab = canon_tab = None
    if use_modes:
        pres_path = f"{args.artifacts}/probe_heatmap_modes.json"
        prof = data.load_mode_profile(pres_path)
        if prof is not None:
            pres_tab, canon_tab = prof
        if pres_tab is not None:
            log(f"synthetic hidden modes gated by measured presence "
                f"{pres_path} ({int(np.isfinite(pres_tab).sum())} "
                f"fault-joint fractions); unmeasured -> noise floor")
        else:
            log("WARNING: no probe_heatmap_modes.json presence profile — "
                "synthetic hidden modes on ALL fault joints (the "
                "unconditioned variant that collapsed drift faults)")

    def _fresh_pairs(i):
        """half (faulty, clean-counterpart) clips sharing style/tempo/noise
        (swing_keypoints draws no randomness inside its fault branches, so
        identical rng states give identical base motion)."""
        fresh, fks, cks = [], [], []
        for j in range(half):
            rd = np.random.default_rng(600_000 + i * 131 + j)
            faults = {}
            if rd.uniform() < 0.5:
                kk = rd.integers(1, 3)
                for name in rd.choice(cfg_mod.SWING_ERRORS, size=kk,
                                      replace=False):
                    faults[str(name)] = float(rd.uniform(0.3, 1.0))
            tempo = float(rd.uniform(-0.8, 0.8))
            base_seed = 610_000 + i * 131 + j
            sf = data.swing_keypoints(T, np.random.default_rng(base_seed),
                                      tempo_warp=tempo, faults=faults)
            sc = data.swing_keypoints(T, np.random.default_rng(base_seed),
                                      tempo_warp=tempo)
            sf = data.place_in_image(sf, tuple(args.hw),
                                     person_height_px=0.65 * args.hw[0],
                                     rng=np.random.default_rng(base_seed + 1))
            sc = data.place_in_image(sc, tuple(args.hw),
                                     person_height_px=0.65 * args.hw[0],
                                     rng=np.random.default_rng(base_seed + 1))
            fresh.append(sf)
            fks.append(sf.keypoints)
            cks.append(sc.keypoints)
        return fresh, np.stack(fks), np.stack(cks)

    def err_batch(i):
        # Per-joint deflection attenuation: the pose front passes fault
        # deflections with joint-dependent gain (measured ~0.43 on hips,
        # ~0.88 on the head); simulate by blending each faulty clip toward
        # its clean counterpart with a random per-joint gain.
        fresh, fk, ck = _fresh_pairs(i)
        g = np.stack([data.conditioned_gain(rng_aug, gain_tab, s.error_flags)
                      for s in fresh])
        g = g[:, None, :, None]
        dfl = (fk - ck)[..., :2]           # FULL-strength deflection
        fk = ck + (fk - ck) * g
        present = side = None
        if use_modes:
            # Bimodal FLICKER model for joints with a measured hidden
            # mode: the decode's per-frame argmax sits AT the canonical
            # or the true mode (probe_heatmap_modes), so on those joints
            # the selected keypoint flickers clean<->clean+d with
            # P(true) = 1 - canon_frac (whose mean reproduces the
            # regressed probe gain), and the runner-up mode sits at the
            # FULL ±d separation.  The smooth g-blend stays for
            # unimodal (drift) joints.
            pp_m = np.stack([
                data.conditioned_presence(pres_tab, s.error_flags)
                for s in fresh])[:, None, :]               # [N,1,V]
            cc_m = np.stack([
                data.conditioned_presence(canon_tab, s.error_flags,
                                          default=1.0)
                for s in fresh])[:, None, :]
            present = rng_aug.uniform(size=fk.shape[:3]) < pp_m
            side = rng_aug.uniform(size=fk.shape[:3]) < cc_m
            flick_xy = ck[..., :2] + np.where(
                (present & ~side)[..., None], dfl, 0.0)
            fk[..., :2] = np.where(present[..., None], flick_xy,
                                   fk[..., :2])
        nz = np.empty((half, T, fk.shape[2], 2), np.float32)
        nz[:, 0] = rng_aug.normal(0, 1.0, nz[:, 0].shape)
        for tt in range(1, T):
            nz[:, tt] = rho * nz[:, tt - 1] + rng_aug.normal(
                0, innov, nz[:, 0].shape)
        fk[..., :2] += nz * sigma_v
        sp_all = None
        if use_spread:
            # Spread consistent with the attenuation just applied: the
            # g(1-g)·d² suppressed-component term along the deflection,
            # scaled by the measured per-fault transfer beta.
            bb = np.stack([data.conditioned_beta(beta_tab, s.error_flags)
                           for s in fresh])[:, None, :, None]
            sp_f = data.synth_spread(fk, cfg.pose, tuple(args.hw), rng_aug,
                                     defl_vec=dfl, gain=g,
                                     blur_iso=blur_iso, beta=bb)
        elif use_modes:
            # Aux consistent with the flicker just applied: runner-up at
            # the full ±d on (present) bimodal joint-frames, measured
            # noise floor elsewhere.
            sp_f = data.synth_modes(fk, rng_aug, defl_vec=dfl,
                                    clean_rel=clean_rel,
                                    clean_sep=clean_sep,
                                    miss_prob=mode_miss,
                                    present_mask=present,
                                    side_canon=side)
        fk = jnp.asarray(fk)
        v_f = jnp.ones((half, T), bool)
        if refine_apply is not None:   # runtime parity: head sees refined
            fk = refine_apply(fk, v_f)
        sk_f = gcn_mod.normalize_skeleton(fk, v_f)  # GCN wants normalized
        fl_f = jnp.asarray(np.stack([s.error_flags for s in fresh]))
        if args.pool_rendered_frac > 0:
            # Upweight the rendered clips (the only pool examples whose
            # spread statistics are REAL heatmap measurements): the pool
            # is 48 rendered / 256 synthetic, so uniform sampling shows
            # the head modeled spread 92% of the time.
            nr = min(int(round(half * args.pool_rendered_frac)),
                     len(samples))
            i_r = rng.choice(len(samples), size=nr, replace=False)
            i_s = rng.choice(np.arange(len(samples), N),
                             size=half - nr, replace=False)
            idx = jnp.asarray(np.concatenate([i_r, i_s]))
        else:
            idx = jnp.asarray(rng.choice(N, size=half, replace=False))
        if use_aux:
            sp_all = jnp.concatenate([jnp.asarray(sp_f), pool_aux[idx]])
        k_all = jnp.concatenate([fk, pred_kpts[idx]])  # RAW for error head
        v_all = jnp.concatenate([v_f, valid[idx]])
        pl_all = jnp.concatenate([gcn_fwd(gparams, sk_f, v_f),
                                  gcn_logits[idx]])
        fl_all = jnp.concatenate([fl_f, flags[idx]])
        if i % 2 == 0:
            rw_f = np.stack([
                data.progress_align_reference(s, refs[j % len(refs)])
                for j, s in enumerate(fresh)])
            rw_f[..., :2] += rng_aug.normal(0, sigma, rw_f[..., :2].shape)
            rw = jnp.concatenate([jnp.asarray(rw_f), ref_warp[idx]])
        else:
            rw = None
        return k_all, pl_all, fl_all, v_all, rw, sp_all

    n_err = args.error_steps or args.steps * 2
    for i in range(n_err):
        eparams, eopt, aux = estep(eparams, eopt, err_batch(i))
        if i % max(n_err // 6, 1) == 0 or i == n_err - 1:
            log(f"[error-cascade] step {i} loss {float(aux['loss']):.4f} "
                f"acc {float(aux['acc']):.4f}")
    err_ck = checkpoint.save_params(f"{args.artifacts}/params/error", eparams,
                                    step=_next_step("error"))

    # ---- 4. Per-fault decision thresholds, calibrated on held-out clips
    # through the REAL pipeline (both analyze modes, with/without a
    # reference swing), maximizing per-fault F1 on the validation probs.
    log(f"calibrating per-fault thresholds (stratified, "
        f"{args.calib_clips} per fault) ...")
    pipe.params = dict(pipe.params, gcn=gparams, error=eparams)
    cal = data.make_fault_balanced_batch(
        args.calib_clips, T, seed=580_000, image_hw=tuple(args.hw),
        render=True, clean=2 * args.calib_clips,
        scene_families=data.TRAIN_SCENE_FAMILIES)
    ref_cal = data.make_swing_batch(1, T, seed=581_000,
                                    image_hw=tuple(args.hw), render=True,
                                    fault_prob=0.0,
                                    scene_families=data.TRAIN_SCENE_FAMILIES)[0]
    ref_skel = pipe.extract_skeleton(pipe.analyze(ref_cal.frames))
    probs, truth = [], []
    for s in cal:
        a = pipe.analyze(s.frames)
        b = pipe.analyze(s.frames, reference=ref_skel)
        probs += [np.asarray(a.error_probs), np.asarray(b.error_probs)]
        truth += [s.error_flags, s.error_flags]
    probs = np.stack(probs)
    truth = np.stack(truth)
    thresholds = metrics.calibrate_error_thresholds(probs, truth, log=log)
    thr_path = os.path.join(args.artifacts, "error_thresholds.json")
    with open(thr_path, "w") as f:
        json.dump(thresholds, f, indent=2)

    print(json.dumps({"gcn_checkpoint": gcn_ck, "error_checkpoint": err_ck,
                      "clips": int(N), "thresholds": thr_path}))


if __name__ == "__main__":
    main()
