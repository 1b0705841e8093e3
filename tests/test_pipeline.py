"""End-to-end pipeline orchestrator tests (tiny configs, CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.ops import softdtw
from golfaction_tpu.pipeline import orchestrator, video_io

TINY = cfg_mod.PipelineConfig(
    pose=cfg_mod.PoseConfig(
        input_hw=(64, 48), heatmap_hw=(16, 12),
        stage_blocks=(1, 1, 1), stage_channels=(8, 16, 32),
        deconv_channels=(16, 16), dtype="float32",
    ),
    gcn=cfg_mod.GCNConfig(block_channels=(8, 16), temporal_branches=((3, 1), (3, 2)),
                          dropout=0.0, dtype="float32"),
    align=cfg_mod.AlignConfig(embed_dim=16, hidden_channels=(8, 16), dtype="float32"),
    error=cfg_mod.ErrorConfig(hidden_dim=32, dtype="float32"),
    frame_batch=4,
    length_buckets=(8, 16),
    video_hw=(96, 128),
)


def _swing_frames(t=10, h=96, w=128, seed=0):
    """Synthetic static-camera clip with a moving bright blob (the golfer)."""
    rng = np.random.default_rng(seed)
    frames = np.full((t, h, w, 3), 30, np.uint8)
    frames += rng.integers(0, 10, frames.shape).astype(np.uint8)
    for i in range(t):
        cx = 40 + 4 * i
        frames[i, 20:70, cx - 10 : cx + 10] = 220
    return frames


@pytest.fixture(scope="module")
def pipe():
    return orchestrator.Pipeline(TINY, seed=0)


def test_analyze_shapes_and_mask(pipe):
    frames = _swing_frames(t=10)
    res = pipe.analyze(frames)
    Tb = 16  # bucket
    assert res.keypoints.shape == (Tb, 17, 3)
    assert res.phase_labels.shape == (Tb,)
    assert res.phase_logits.shape == (Tb, cfg_mod.NUM_PHASES)
    assert res.error_probs.shape == (cfg_mod.NUM_ERRORS,)
    v = np.asarray(res.valid)
    assert v[:10].all() and not v[10:].any()
    labels = np.asarray(res.phase_labels)
    assert (labels[10:] == -1).all()
    assert (labels[:10] >= 0).all()
    assert np.isfinite(np.asarray(res.keypoints)).all()
    assert ((np.asarray(res.error_probs) >= 0) & (np.asarray(res.error_probs) <= 1)).all()


@pytest.mark.slow
def test_analyze_with_reference_alignment(pipe):
    a = pipe.analyze(_swing_frames(t=10, seed=0))
    skel = pipe.extract_skeleton(a)
    b = pipe.analyze(_swing_frames(t=7, seed=1), reference=skel)
    assert b.alignment is not None
    la = 7   # valid length of b
    lb = 10  # valid length of reference a
    length = int(b.alignment.path_length)
    p = np.asarray(b.alignment.path)[:length]
    assert tuple(p[0]) == (0, 0)
    assert tuple(p[-1]) == (la - 1, lb - 1)
    steps = np.diff(p, axis=0)
    assert ((steps >= 0) & (steps <= 1)).all() and (steps.sum(axis=1) >= 1).all()
    assert np.isfinite(float(b.alignment.cost))


@pytest.mark.slow
def test_analyze_batch_matches_single(pipe):
    clips = [_swing_frames(t=6, seed=2), _swing_frames(t=9, seed=3)]
    batch = pipe.analyze_batch(clips)
    single = [pipe.analyze(c) for c in clips]
    for rb, rs in zip(batch, single):
        np.testing.assert_allclose(
            np.asarray(rb.keypoints), np.asarray(rs.keypoints), atol=1e-4
        )  # batch-8 chunk vs single-clip program: accumulation order
        np.testing.assert_array_equal(
            np.asarray(rb.phase_labels), np.asarray(rs.phase_labels)
        )


@pytest.mark.slow
def test_analyze_batch_with_reference_matches_single(pipe):
    # Batched alignment (one device program per bucket group) must agree
    # with the per-pair path used by analyze().
    ref = pipe.extract_skeleton(pipe.analyze(_swing_frames(t=10, seed=0)))
    clips = [_swing_frames(t=6, seed=2), _swing_frames(t=9, seed=3),
             _swing_frames(t=12, seed=4)]  # two buckets: 8 and 16
    batch = pipe.analyze_batch(clips, reference=ref)
    for clip, rb in zip(clips, batch):
        rs = pipe.analyze(clip, reference=ref)
        assert rb.alignment is not None
        np.testing.assert_allclose(
            float(rb.alignment.cost), float(rs.alignment.cost), rtol=1e-4
        )
        lb_ = int(rb.alignment.path_length)
        ls_ = int(rs.alignment.path_length)
        assert lb_ == ls_
        np.testing.assert_array_equal(
            np.asarray(rb.alignment.path)[:lb_],
            np.asarray(rs.alignment.path)[:ls_],
        )


def test_bucket_padding_no_retrace(pipe):
    # Two clips in the same bucket reuse one compiled program.
    pipe.analyze(_swing_frames(t=5, seed=4))
    before = pipe._core._cache_size()
    pipe.analyze(_swing_frames(t=8, seed=5))  # still bucket 8? t=8 -> bucket 8
    pipe.analyze(_swing_frames(t=6, seed=6))
    assert pipe._core._cache_size() == before


def test_estimate_person_boxes_finds_blob():
    frames = _swing_frames(t=10)
    boxes = video_io.estimate_person_boxes(frames)
    assert boxes.shape == (10, 4)
    # Blob centers move from x=40 to x=76, y≈45: boxes should track the region.
    assert 30 < boxes[:, 0].mean() < 90
    assert 20 < boxes[:, 1].mean() < 75


def test_pad_to_bucket():
    frames = np.zeros((5, 8, 8, 3), np.uint8)
    boxes = np.ones((5, 4), np.float32)
    f, b, v = video_io.pad_to_bucket(frames, boxes, (8, 16))
    assert f.shape[0] == 8 and b.shape[0] == 8
    assert v[:5].all() and not v[5:].any()
    with pytest.raises(ValueError):
        video_io.pad_to_bucket(np.zeros((20, 8, 8, 3), np.uint8),
                               np.ones((20, 4), np.float32), (8, 16))


def test_masked_softdtw_matches_trimmed_oracle():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(12, 4)).astype(np.float32)
    b = rng.normal(size=(15, 4)).astype(np.float32)
    D = softdtw.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    la, lb = 9, 11
    ref, _ = softdtw.softdtw_reference(np.asarray(D)[:la, :lb], 0.1)
    got = float(softdtw.softdtw_cost_masked(D, la, lb, 0.1))
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    ref_path = softdtw.dtw_path_reference(np.asarray(D)[:la, :lb])
    path, length = softdtw.dtw_path_masked(D, la, lb)
    np.testing.assert_array_equal(np.asarray(path)[: int(length)], ref_path)


@pytest.mark.slow
def test_box_refine_stride_runs_and_matches_shapes():
    # Keypoint-seeded box refinement: same contract as the plain path; the
    # refined program must run (coarse pass + interp + smooth + full pass)
    # and produce in-image keypoints.
    cfg = dataclasses.replace(TINY, box_refine_stride=2)
    p = orchestrator.Pipeline(cfg, seed=0)
    res = p.analyze(_swing_frames(t=10))
    assert res.keypoints.shape == (16, 17, 3)
    k = np.asarray(res.keypoints)[np.asarray(res.valid)]
    assert np.isfinite(k).all()


def test_camera_shift_estimation_recovers_translation():
    # Translate a textured scene by a known per-frame offset; the estimator
    # must recover it (that's the stabilization that keeps motion boxes
    # alive on a shaking camera).
    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (160, 200)) ).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (9, 9), 0)  # correlatable texture
    offs = np.array([[0, 0], [4, -2], [8, 2], [12, 6]])
    frames = np.stack([
        np.roll(base, (int(dy), int(dx)), axis=(0, 1)) for dx, dy in offs
    ])[..., None].repeat(3, -1).astype(np.uint8)
    est = video_io.estimate_camera_shifts(frames, downsample=1)
    np.testing.assert_allclose(est, offs, atol=1.0)


def test_stabilized_boxes_on_shaking_camera():
    # A moving blob under global camera shake: stabilized motion boxes must
    # track the blob far better than unstabilized differencing.
    rng = np.random.default_rng(1)
    t, h, w = 12, 120, 160
    # High-contrast textured background: unstabilized differencing floods.
    base = rng.integers(0, 200, (h // 8, w // 8, 3)).astype(np.uint8)
    import cv2
    base = cv2.resize(base, (w, h), interpolation=cv2.INTER_NEAREST)
    base = cv2.GaussianBlur(base, (3, 3), 0)
    shake = np.cumsum(rng.integers(-8, 9, (t, 2)), axis=0)
    frames = np.zeros((t, h, w, 3), np.uint8)
    centers = []
    for i in range(t):
        f = np.roll(base, (shake[i, 1], shake[i, 0]), axis=(0, 1)).copy()
        cx, cy = 40 + 5 * i + shake[i, 0], 60 + shake[i, 1]
        f[max(cy - 12, 0): cy + 12, max(cx - 8, 0): cx + 8] = 230
        frames[i] = f
        centers.append([cx, cy])
    centers = np.asarray(centers, np.float32)
    b_stab = video_io.estimate_person_boxes(frames, smooth=3, stabilize=True,
                                            use_native=False)
    b_raw = video_io.estimate_person_boxes(frames, smooth=3, stabilize=False,
                                           use_native=False)
    err_stab = np.linalg.norm(b_stab[:, :2] - centers, axis=1).mean()
    err_raw = np.linalg.norm(b_raw[:, :2] - centers, axis=1).mean()
    assert err_stab < err_raw * 0.7, (err_stab, err_raw)
    assert err_stab < 15.0, err_stab


def test_preprocess_dtype_bf16_keypoint_parity(pipe):
    """preprocess_dtype="bfloat16" (the TPU warp fast path) must keep
    keypoints within a small fraction of the person box vs the f32 path —
    uint8 pixels are exact in bf16; only interp weights round."""
    frames = _swing_frames(t=10)
    ref = pipe.analyze(frames)
    cfg_bf = dataclasses.replace(TINY, preprocess_dtype="bfloat16")
    pipe_bf = orchestrator.Pipeline(cfg_bf, seed=0)
    pipe_bf.params = pipe.params
    res = pipe_bf.analyze(frames)
    k0 = np.asarray(ref.keypoints)[:10, :, :2]
    k1 = np.asarray(res.keypoints)[:10, :, :2]
    # Untrained net: predictions are arbitrary but must be *stable* under
    # the warp dtype (same peaks up to sub-pixel wiggle).
    assert np.median(np.abs(k1 - k0)) < 2.0
    assert np.isfinite(k1).all()


def test_spread_features_pipeline_paths():
    """error.spread_features wires heatmap covariance through analyze /
    compare / batch without touching the decoded keypoints."""
    import dataclasses

    cfg_sp = dataclasses.replace(
        TINY, error=dataclasses.replace(TINY.error, spread_features=True))
    p = orchestrator.Pipeline(cfg_sp, seed=0)
    frames = _swing_frames(t=10)
    r = p.analyze(frames)
    assert np.isfinite(np.asarray(r.error_probs)).all()

    ref = p.extract_skeleton(r)
    r2 = p.analyze(frames, reference=ref)
    assert r2.alignment is not None
    assert np.isfinite(np.asarray(r2.error_probs)).all()

    rs = p.analyze_batch([frames, frames], reference=ref)
    np.testing.assert_allclose(np.asarray(rs[0].error_probs),
                               np.asarray(rs[1].error_probs), atol=1e-5)

    # Decode path is untouched by the spread plumbing.
    p0 = orchestrator.Pipeline(TINY, seed=0)
    p0.params = dict(p.params, error=p0.params["error"])
    r0 = p0.analyze(frames)
    np.testing.assert_allclose(np.asarray(r0.keypoints),
                               np.asarray(r.keypoints), atol=1e-6)


def test_error_head_spread_reacts_to_covariance():
    """The spread block must actually reach the logits: widening the
    covariance along the deviation direction changes the output."""
    import jax

    from golfaction_tpu.models import error as error_mod

    cfg = cfg_mod.ErrorConfig(spread_features=True, dtype="float32")
    m = error_mod.create_error_model(cfg)
    rng = np.random.default_rng(0)
    B, T, V = 1, 12, 17
    sk = jnp.asarray(rng.normal(500, 40, (B, T, V, 3)).astype(np.float32))
    ref = sk + 5.0
    pl = jnp.zeros((B, T, cfg_mod.NUM_PHASES))
    v = jnp.ones((B, T), bool)
    params = m.init(jax.random.key(0), sk, pl, v)
    floor = np.full((B, T, V, 1), 25.0, np.float32)
    narrow = np.concatenate([floor, 0 * floor, floor, floor], -1)
    wide = narrow.copy()
    wide[..., 0] += 900.0  # large excess variance along x
    out_n = m.apply(params, sk, pl, v, ref, jnp.asarray(narrow))
    out_w = m.apply(params, sk, pl, v, ref, jnp.asarray(wide))
    assert float(jnp.abs(out_n - out_w).max()) > 1e-3
