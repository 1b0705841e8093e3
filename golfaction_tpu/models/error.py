"""Swing-error detection classifier.

The reference's "ERROR DETECTION MODEL" (reference README.md:19): flags swing
faults from the phase-segmented skeleton sequence (SURVEY.md §2
"Error-detection classifier"; BASELINE north_star: "error flags ... batched
scan kernels on-device").  Per SURVEY.md §1 L3, the classifier sits above
BOTH the segmentation phases and the temporal alignment: when a reference
swing is available, per-frame deviations from the DTW-aligned reference are
first-class input features.

Design: the phase posteriors from the segmentation head act as a *soft
temporal pooling matrix* — per-frame features are aggregated per swing phase
with one matmul ([P, T] @ [T, F]), giving a fixed-size phase-conditioned
summary regardless of clip length.  An MLP over the flattened summary emits
one logit per fault (multi-label).  This keeps the whole classifier a couple
of MXU matmuls with no dynamic shapes, and is padding-mask exact.

Per-frame features:
  * joint positions + first temporal difference (velocity);
  * joint-angle features (cos/sin at elbows/knees/shoulders/hips, spine tilt,
    head drift) + their angular velocities — faults like casting or reverse
    spine are angle-space patterns that raw coordinates hide;
  * optional alignment deviations: signed offsets and per-joint distance
    between the clip and a reference swing warped onto the clip's timeline
    via the DTW path, plus a has-reference flag (zeros when absent, so one
    parameter set serves both modes).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from golfaction_tpu.config import ErrorConfig

# Angle triplets (a, vertex, b) over COCO-17 joints: elbows, knees,
# shoulder and hip hinges on both sides.
_ANGLE_TRIPLETS = (
    (5, 7, 9), (6, 8, 10),      # elbows
    (11, 13, 15), (12, 14, 16),  # knees
    (7, 5, 11), (8, 6, 12),     # shoulders (arm vs torso)
    (5, 11, 13), (6, 12, 14),   # hip hinges
)
NUM_ANGLE_FEATURES = 2 * len(_ANGLE_TRIPLETS) + 3  # cos/sin + spine + head


def _smooth_time(x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Binomial [1,2,1]/4 filter along axis 1 (edge-replicated).

    With `valid` [B, T], the filter is mask-normalized so padded frames
    never leak into valid ones (bucket-padding isolation); invalid frames
    pass through untouched (they are masked downstream anyway).
    """

    def conv(z):
        pad = jnp.concatenate([z[:, :1], z, z[:, -1:]], axis=1)
        return 0.25 * pad[:, :-2] + 0.5 * pad[:, 1:-1] + 0.25 * pad[:, 2:]

    if valid is None:
        return conv(x)
    m = valid.astype(jnp.float32).reshape(*valid.shape,
                                          *([1] * (x.ndim - 2)))
    num = conv(x * m)
    den = conv(m)
    return jnp.where(m > 0, num / jnp.maximum(den, 1e-6), x)


def angle_features(sk: jnp.ndarray) -> jnp.ndarray:
    """Skeletons [B, T, V, C>=2] -> angle features [B, T, NUM_ANGLE_FEATURES].

    cos/sin of each triplet angle (scale-invariant), spine tilt (cos/sin of
    mid-hip -> mid-shoulder vs vertical), and lateral head drift relative to
    mid-hip in torso-length units.
    """
    xy = sk[..., :2].astype(jnp.float32)
    eps = 1e-6

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    feats = []
    for a, c, b in _ANGLE_TRIPLETS:
        u = unit(xy[..., a, :] - xy[..., c, :])
        w = unit(xy[..., b, :] - xy[..., c, :])
        cos = (u * w).sum(-1)
        sin = u[..., 0] * w[..., 1] - u[..., 1] * w[..., 0]
        feats += [cos, sin]

    mid_hip = (xy[..., 11, :] + xy[..., 12, :]) / 2
    mid_sho = (xy[..., 5, :] + xy[..., 6, :]) / 2
    spine = unit(mid_sho - mid_hip)
    feats += [spine[..., 0], spine[..., 1]]

    torso = jnp.maximum(jnp.linalg.norm(mid_sho - mid_hip, axis=-1), eps)
    feats.append((xy[..., 0, 0] - mid_hip[..., 0]) / torso)
    return jnp.stack(feats, axis=-1)


class ErrorClassifier(nn.Module):
    """(keypoints [B,T,V,C] RAW image-space, phase_logits [B,T,P],
    valid [B,T], ref_aligned [B,T,V,C] RAW | None) -> logits [B,E].

    Takes RAW keypoints and normalizes internally with CLIP-mean hip
    centering (gcn.normalize_skeleton_clip): per-frame centering — the
    GCN's convention — erases the global-drift trajectories that define
    translation faults (swaying, hanging back, head movement).

    `ref_aligned` is the reference swing's raw skeleton warped onto the
    clip's frames via the DTW alignment path (normalized here with its own
    clip stats); None means "no reference" and the deviation feature block
    is zeros with a zero has-ref flag.
    """

    cfg: ErrorConfig = ErrorConfig()

    @nn.compact
    def __call__(self, skeletons, phase_logits, valid=None, ref_aligned=None,
                 aux=None):
        from golfaction_tpu.models import gcn as gcn_mod

        cfg = self.cfg
        if cfg.spread_features and cfg.mode_features:
            raise ValueError("spread_features and mode_features are "
                             "mutually exclusive aux-channel semantics")
        dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B, T, V, C = skeletons.shape

        skeletons, clip_scale = gcn_mod.normalize_skeleton_clip(
            skeletons.astype(jnp.float32), valid, return_scale=True)
        # Temporal 1-2-1 smoothing before feature extraction: runtime
        # skeletons carry frame-to-frame pose jitter that the angle /
        # angular-velocity features would otherwise amplify into the
        # dominant signal (measured round 2: an error head trained on
        # unsmoothed features collapsed on predicted keypoints).
        skeletons = _smooth_time(skeletons, valid)
        if ref_aligned is not None:
            ref_aligned = gcn_mod.normalize_skeleton_clip(
                ref_aligned.astype(jnp.float32), valid)
            ref_aligned = _smooth_time(ref_aligned, valid)

        # Coordinates only — the score channel is a domain giveaway
        # (synthetic training clips carry score 1.0, real decoded keypoints
        # 0.3-0.9), which lets the head learn domain-conditional shortcuts
        # instead of fault geometry.
        x = skeletons[..., :2].reshape(B, T, V * 2)
        vel = jnp.diff(x, axis=1, prepend=x[:, :1])
        ang = angle_features(skeletons)
        angvel = jnp.diff(ang, axis=1, prepend=ang[:, :1])

        # Alignment-deviation block (SURVEY.md §2 "Depends on: seg + align").
        diff = None
        if ref_aligned is None:
            dev = jnp.zeros((B, T, V * 2 + V), jnp.float32)
            has_ref = jnp.zeros((B, T, 1), jnp.float32)
        else:
            diff = (skeletons[..., :2] - ref_aligned[..., :2]).astype(
                jnp.float32
            )
            dist = jnp.linalg.norm(diff, axis=-1)             # [B, T, V]
            dev = jnp.concatenate([diff.reshape(B, T, V * 2), dist], -1)
            has_ref = jnp.ones((B, T, 1), jnp.float32)

        blocks = [x, vel, ang, angvel, dev, has_ref]

        if cfg.mode_features:
            # Secondary-mode block: `aux` [B,T,V,4] carries (dx, dy,
            # rel_mass, sep) of the strongest NON-selected heatmap mode in
            # IMAGE px (orchestrator._pose_pass, pose.decode_tracking).
            # On faulted frames this is the suppressed bimodal component —
            # at training sigma 1.25 the true deflected joint stays a
            # separable local max (probe_heatmap_modes: present in 95.9%
            # of faulted frames), so its offset IS the deflection the
            # single-point decode attenuated.  Three per-joint features:
            #   * exp_hidden: mass-weighted separation w·sep, the expected
            #     hidden deflection magnitude (w = rel/(1+rel), the
            #     secondary mode's mass fraction);
            #   * rel: the raw mass ratio (bimodality evidence);
            #   * proj: signed projection of the offset onto the
            #     reference-deviation direction (0 without a reference) —
            #     "the hidden mode sits toward where this clip already
            #     deviates" is direct fault evidence.
            if aux is None:
                blocks.append(jnp.zeros((B, T, 3 * V), jnp.float32))
            else:
                m = _smooth_time(aux.astype(jnp.float32), valid)
                scale = jnp.maximum(clip_scale, 1e-3)[:, None, None]
                off = m[..., :2] / scale[..., None]
                rel = jnp.clip(m[..., 2], 0.0, 4.0)
                sep = m[..., 3] / scale
                w = rel / (1.0 + rel)
                exp_hidden = w * sep
                if diff is None:
                    proj = jnp.zeros((B, T, V), jnp.float32)
                else:
                    u = diff / jnp.maximum(
                        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-6)
                    proj = (u * off).sum(-1) * w
                blocks.append(
                    jnp.concatenate([exp_hidden, rel, proj], axis=-1))

        if cfg.spread_features:
            # Heatmap-spread block: the pose front's merged bimodal blobs
            # attenuate fault deflections at DECODE time (measured 0.34
            # gain on arms — probe_arm_gain.json) but the deflection
            # magnitude survives in the heatmap covariance: var along the
            # component-separation axis = sigma² + w(1-w)d²
            # (probe_heatmap_spread.json).  `spread` [B,T,V,4] carries
            # (cov_xx, cov_xy, cov_yy, floor) in IMAGE px², floor being
            # the training-target spread (sigma·box_scale)²; everything is
            # normalized by the SAME clip scale as the coordinates.
            if aux is None:
                blocks.append(jnp.zeros((B, T, 2 * V), jnp.float32))
            else:
                sp = _smooth_time(aux.astype(jnp.float32), valid)
                sp = sp / jnp.maximum(clip_scale, 1e-3)[
                    :, None, None, None] ** 2
                cxx, cxy = sp[..., 0], sp[..., 1]
                cyy, floor = sp[..., 2], sp[..., 3]
                iso = jnp.sqrt(jnp.maximum(0.5 * (cxx + cyy) - floor, 0.0))
                if diff is None:
                    dir_exc = jnp.zeros((B, T, V), jnp.float32)
                else:
                    # Excess spread along the reference-deviation
                    # direction: the error head's readout of "how far the
                    # suppressed mixture component sits beyond the decoded
                    # mean, toward where this clip already deviates".
                    u = diff / jnp.maximum(
                        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-6)
                    var_u = (u[..., 0] ** 2 * cxx
                             + 2.0 * u[..., 0] * u[..., 1] * cxy
                             + u[..., 1] ** 2 * cyy)
                    dir_exc = jnp.sqrt(jnp.maximum(var_u - floor, 0.0))
                blocks.append(jnp.concatenate([dir_exc, iso], axis=-1))

        feat = jnp.concatenate(blocks, axis=-1)
        feat = nn.Dense(cfg.hidden_dim, dtype=dt)(feat.astype(dt))
        feat = nn.LayerNorm(dtype=dt)(feat)
        feat = nn.relu(feat)

        # Soft per-phase pooling: weights = phase posterior, masked+normalized.
        w = nn.softmax(phase_logits.astype(jnp.float32), axis=-1)  # [B, T, P]
        if valid is not None:
            w = w * valid.astype(w.dtype)[..., None]
        denom = jnp.maximum(w.sum(axis=1), 1e-3)           # [B, P]
        pooled = jnp.einsum("btp,btf->bpf", w.astype(dt), feat)
        pooled = pooled / denom[..., None].astype(dt)      # [B, P, F]

        h = pooled.reshape(B, -1)
        h = nn.Dense(cfg.hidden_dim, dtype=dt)(h)
        h = nn.LayerNorm(dtype=dt)(h)
        h = nn.relu(h)
        logits = nn.Dense(cfg.num_errors, dtype=jnp.float32)(h)
        return logits


def create_error_model(cfg: ErrorConfig = ErrorConfig()):
    return ErrorClassifier(cfg)
