"""Shared helpers for the pose-front probes.

The arm-fault probes (probe_arm_gain / probe_heatmap_modes /
probe_heatmap_spread) all need the same two pieces: a (fault, clean-twin)
clip pair renderer that differs ONLY by the fault deflection, and a
replica of `Pipeline._pose_fn`'s front that stops at the raw heatmaps so
decode alternatives can be measured against ground truth.  Keeping them
here stops the copies drifting (ADVICE r2 pattern).

Imports of golfaction_tpu happen lazily inside the functions so callers
can set the jax platform first.
"""

from __future__ import annotations

import numpy as np


def render_pair(fault, severity, seed, frames, hw):
    """(faulty, clean) SwingSamples sharing body/tempo/scene/camera.

    In-domain scene families only: the probes isolate fast-arm pose
    fidelity; cross-domain transfer is measured separately
    (demo_e2e --domain-clips).
    """
    from golfaction_tpu.train import data

    out = []
    for faults in ({fault: severity}, {}):
        s = data.swing_keypoints(
            frames, np.random.default_rng(seed),
            tempo_warp=float(
                np.random.default_rng(seed + 1).uniform(-0.8, 0.8)
            ),
            faults=faults,
        )
        s = data.place_in_image(
            s, hw, person_height_px=0.65 * hw[0],
            rng=np.random.default_rng(seed + 2),
        )
        fam_rng = np.random.default_rng(seed + 4)
        s = data.render_frames_photo(
            s, hw, rng=np.random.default_rng(seed + 3),
            scene_family=int(fam_rng.choice(data.TRAIN_SCENE_FAMILIES)),
        )
        out.append(s)
    return out


def make_pose_heatmaps_fn(pipe):
    """jit((params, frames, boxes) -> (heatmaps, center-scale boxes)).

    Replicates Pipeline._pose_fn's front (coarse full-frame pass ->
    keypoint-seeded refined boxes -> crop -> pose net), returning the raw
    heatmaps plus the boxes actually used so ground truth can be mapped
    into heatmap space.
    """
    import jax
    import jax.numpy as jnp

    from golfaction_tpu.ops import affine, preprocess

    c = pipe.cfg

    def pose_heatmaps(params, frames, boxes):
        T, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        s = c.box_refine_stride
        if s > 0 and T > s:
            full = jnp.broadcast_to(
                jnp.asarray([W / 2.0, H / 2.0, float(W), float(H)],
                            jnp.float32),
                (frames[::s].shape[0], 4))
            coarse = pipe._pose_pass(params, frames[::s], full)
            rb = affine.boxes_from_keypoints(coarse, (H, W),
                                             min_size=0.1 * H)
            rb = affine.interp_boxes(rb, s, T)
            boxes = affine.smooth_boxes(rb, window=9)
        boxes = affine.box_to_center_scale(
            boxes, aspect_ratio=c.pose.input_hw[1] / c.pose.input_hw[0])
        half = c.pose.in_frames // 2
        idx = jnp.arange(T, dtype=jnp.int32)
        if half == 0:
            crops = preprocess.crop_resize_normalize(frames, boxes,
                                                     c.pose.input_hw)
        else:
            crops = jnp.concatenate([
                preprocess.crop_resize_normalize(
                    jnp.take(frames, jnp.clip(idx + off, 0, T - 1), axis=0),
                    boxes, c.pose.input_hw)
                for off in range(-half, half + 1)
            ], axis=-1)
        hm = pipe.pose_model.apply(params["pose"], crops)
        return hm, boxes

    return jax.jit(pose_heatmaps)
