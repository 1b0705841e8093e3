"""Evaluation metrics: PCK@alpha, swing-phase F1/accuracy, alignment error.

These are the parity metrics named by BASELINE.json ("PCK@0.05 and
swing-phase F1 parity") and shown as evaluation screenshots in the reference
(README.md:40-42,48).  All functions are pure jnp and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def pck(pred_kpts, gt_kpts, bbox_size, alpha: float = 0.05, mask=None):
    """Percentage of Correct Keypoints at alpha * bbox_size.

    pred/gt [..., V, >=2] in the same pixel space; bbox_size [...] the
    normalization diagonal (e.g. max(w, h) of the person box).
    """
    d = jnp.linalg.norm(
        pred_kpts[..., :2].astype(jnp.float32) - gt_kpts[..., :2].astype(jnp.float32),
        axis=-1,
    )                                                  # [..., V]
    thr = (alpha * bbox_size)[..., None]
    correct = (d <= thr).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return (correct * m).sum() / jnp.maximum(m.sum(), 1.0)
    return correct.mean()


def phase_accuracy(pred_labels, gt_labels, valid=None):
    ok = (pred_labels == gt_labels).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        return (ok * v).sum() / jnp.maximum(v.sum(), 1.0)
    return ok.mean()


def phase_f1(pred_labels, gt_labels, num_classes: int, valid=None):
    """Macro-F1 over phase classes (classes absent from both pred and gt are
    excluded from the macro average)."""
    if valid is None:
        valid = jnp.ones_like(gt_labels, dtype=bool)
    v = valid
    f1s = []
    present = []
    for c in range(num_classes):
        p = (pred_labels == c) & v
        g = (gt_labels == c) & v
        tp = jnp.sum(p & g).astype(jnp.float32)
        fp = jnp.sum(p & ~g).astype(jnp.float32)
        fn = jnp.sum(~p & g).astype(jnp.float32)
        f1 = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1e-9)
        f1s.append(f1)
        present.append((tp + fn + fp) > 0)
    f1s = jnp.stack(f1s)
    present = jnp.stack(present).astype(jnp.float32)
    return (f1s * present).sum() / jnp.maximum(present.sum(), 1.0)


def phase_confusion(pred_labels, gt_labels, num_classes: int, valid=None):
    """Confusion matrix [P, P] (rows = ground truth)."""
    if valid is None:
        valid = jnp.ones_like(gt_labels, dtype=bool)
    idx = gt_labels * num_classes + pred_labels
    flat = jnp.where(valid, idx, num_classes * num_classes)
    counts = jnp.bincount(
        flat.reshape(-1), length=num_classes * num_classes + 1
    )[:-1]
    return counts.reshape(num_classes, num_classes)


def alignment_progress_error(path, path_length, progress_a, progress_b):
    """Mean |progress_a[i] - progress_b[j]| along a DTW path — how well the
    alignment recovers the true time correspondence of two swings."""
    L = path.shape[0]
    idx = jnp.arange(L)
    m = (idx < path_length).astype(jnp.float32)
    i = jnp.clip(path[:, 0], 0, progress_a.shape[0] - 1)
    j = jnp.clip(path[:, 1], 0, progress_b.shape[0] - 1)
    err = jnp.abs(progress_a[i] - progress_b[j]) * m
    return err.sum() / jnp.maximum(m.sum(), 1.0)


def error_detection_metrics(probs, flags, threshold: float = 0.5):
    """Multi-label precision/recall/F1 (micro) for fault flags [B, E]."""
    pred = probs > threshold
    gt = flags > 0.5
    tp = jnp.sum(pred & gt).astype(jnp.float32)
    fp = jnp.sum(pred & ~gt).astype(jnp.float32)
    fn = jnp.sum(~pred & gt).astype(jnp.float32)
    precision = tp / jnp.maximum(tp + fp, 1e-9)
    recall = tp / jnp.maximum(tp + fn, 1e-9)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)
    return {"precision": precision, "recall": recall, "f1": f1}


def error_detection_per_fault(probs, flags, threshold=0.5):
    """Per-fault precision/recall/F1 breakdown (VERDICT r3 #2 asks the
    e2e artifact to carry it).  threshold: scalar or [E] per-fault array.
    Returns {fault_name: {precision, recall, f1, support}}."""
    import numpy as np

    from golfaction_tpu import config as cfg_mod

    probs = np.asarray(probs)
    flags = np.asarray(flags) > 0.5
    thr = np.broadcast_to(np.asarray(threshold, np.float32),
                          (probs.shape[-1],))
    out = {}
    for e, name in enumerate(cfg_mod.SWING_ERRORS):
        pred = probs[:, e] > thr[e]
        gt = flags[:, e]
        tp = float((pred & gt).sum())
        fp = float((pred & ~gt).sum())
        fn = float((~pred & gt).sum())
        p = tp / max(tp + fp, 1e-9)
        r = tp / max(tp + fn, 1e-9)
        out[name] = {
            "precision": round(p, 4), "recall": round(r, 4),
            "f1": round(2 * p * r / max(p + r, 1e-9), 4),
            "support": int(gt.sum()),
        }
    return out


def calibrate_error_thresholds(probs, truth, log=None):
    """Per-fault decision thresholds maximizing F1 on pooled probabilities.

    probs/truth: [N, E] numpy-like arrays (probabilities / 0-1 flags).
    Returns {fault_name: threshold}.  The grid is floored at 0.2 — tiny
    thresholds flag everything and win calibration F1 through recall while
    collapsing held-out precision — and ties break toward the HIGHER
    threshold (precision bias).  Shared by scripts/calibrate_thresholds.py
    and scripts/cascade_finetune.py.
    """
    import numpy as np

    from golfaction_tpu import config as cfg_mod

    probs = np.asarray(probs)
    truth = np.asarray(truth)
    grid = np.linspace(0.20, 0.90, 15)
    thresholds = {}
    for e, fault in enumerate(cfg_mod.SWING_ERRORS):
        best_thr, best_f1 = 0.5, -1.0
        for thr in grid:
            p = probs[:, e] > thr
            tp = float((p & (truth[:, e] > 0)).sum())
            fp = float((p & (truth[:, e] == 0)).sum())
            fn = float((~p & (truth[:, e] > 0)).sum())
            f1 = 2 * tp / max(2 * tp + fp + fn, 1e-9)
            if f1 > best_f1 + 1e-9 or (
                abs(f1 - best_f1) <= 1e-9 and thr > best_thr
            ):
                best_thr, best_f1 = float(thr), f1
        thresholds[fault] = best_thr
        if log is not None:
            log(f"   {fault:16s} thr={best_thr:.2f} calib-F1={best_f1:.2f}")
    return thresholds
