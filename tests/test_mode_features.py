"""Secondary-mode aux features (error.mode_features) — CPU tests.

The sigma-1.25 successor to the spread features: tracked decode keeps the
suppressed bimodal component as a separable heatmap mode
(probe_heatmap_modes: present in 95.9% of faulted frames), and the error
head consumes its offset/mass directly (models/error.py mode block;
orchestrator._pose_pass want_aux).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu import config as cfg_mod
from golfaction_tpu.models import error as error_mod
from golfaction_tpu.pipeline import orchestrator
from golfaction_tpu.train import checkpoint, data

from .test_pipeline import TINY, _swing_frames


def test_synth_modes_shapes_and_fault_offsets():
    rng = np.random.default_rng(0)
    N, T, V = 3, 12, 17
    kpts = rng.normal(300, 50, (N, T, V, 3)).astype(np.float32)
    # No faults: pure noise floor.
    clean = data.synth_modes(kpts, rng, clean_rel=np.full(V, 0.2, np.float32),
                             clean_sep=np.full(V, 5.0, np.float32),
                             miss_prob=0.0)
    assert clean.shape == (N, T, V, 4)
    assert np.isfinite(clean).all()
    # sep column == |offset| for present modes.
    np.testing.assert_allclose(
        np.linalg.norm(clean[..., :2], axis=-1), clean[..., 3], atol=1e-4)
    assert float(np.median(clean[..., 2])) < 0.5  # low noise mass ratio

    # Fault: joint 7 deflected 30 px, passed at gain 0.3 -> hidden mode at
    # ~(1-0.3)*30 = 21 px along the deflection.
    defl = np.zeros((N, T, V, 2), np.float32)
    defl[..., 7, 0] = 30.0
    g = np.full((N, 1, V, 1), 0.3, np.float32)
    f = data.synth_modes(kpts, rng, defl_vec=defl, gain=g,
                         clean_rel=np.full(V, 0.2, np.float32),
                         clean_sep=np.full(V, 5.0, np.float32),
                         miss_prob=0.0, fault_miss_prob=0.0)
    med_dx = float(np.median(f[..., 7, 0]))
    assert 12.0 < med_dx < 32.0          # ~21 px with lognormal jitter
    assert float(np.median(f[..., 7, 2])) > 0.25   # substantial mass
    # Non-fault joints keep the noise floor.
    assert float(np.median(np.abs(f[..., 11, 0]))) < 12.0


def test_error_head_mode_features_react():
    """The mode block must reach the logits: a large consistent hidden
    mode at the elbow changes the output vs the noise floor."""
    cfg = cfg_mod.ErrorConfig(mode_features=True, dtype="float32")
    m = error_mod.create_error_model(cfg)
    rng = np.random.default_rng(0)
    B, T, V = 1, 12, 17
    sk = jnp.asarray(rng.normal(500, 40, (B, T, V, 3)).astype(np.float32))
    pl = jnp.zeros((B, T, cfg_mod.NUM_PHASES))
    v = jnp.ones((B, T), bool)
    params = m.init(jax.random.key(0), sk, pl, v)
    quiet = np.zeros((B, T, V, 4), np.float32)
    quiet[..., 2] = 0.05
    quiet[..., 3] = 2.0
    loud = quiet.copy()
    loud[..., 7, 0] = 25.0
    loud[..., 7, 2] = 0.8
    loud[..., 7, 3] = 25.0
    out_q = m.apply(params, sk, pl, v, None, jnp.asarray(quiet))
    out_l = m.apply(params, sk, pl, v, None, jnp.asarray(loud))
    assert float(jnp.abs(out_q - out_l).max()) > 1e-3
    # None aux must match the all-zeros aux (the no-signal encoding).
    out_none = m.apply(params, sk, pl, v, None, None)
    out_zero = m.apply(params, sk, pl, v, None,
                       jnp.zeros((B, T, V, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_zero),
                               atol=1e-5)


def test_spread_and_modes_mutually_exclusive():
    cfg = cfg_mod.ErrorConfig(spread_features=True, mode_features=True,
                              dtype="float32")
    m = error_mod.create_error_model(cfg)
    sk = jnp.zeros((1, 4, 17, 3))
    pl = jnp.zeros((1, 4, cfg_mod.NUM_PHASES))
    with pytest.raises(ValueError, match="mutually exclusive"):
        m.init(jax.random.key(0), sk, pl, jnp.ones((1, 4), bool))


def test_pipeline_mode_features_end_to_end():
    cfg = dataclasses.replace(
        TINY,
        pose=dataclasses.replace(TINY.pose, decode_tracking=3,
                                 track_suppress_radius=2.0),
        error=dataclasses.replace(TINY.error, mode_features=True),
    )
    pipe = orchestrator.Pipeline(cfg, seed=0)
    res = pipe.analyze(_swing_frames(t=10))
    assert np.isfinite(np.asarray(res.keypoints)).all()
    assert np.isfinite(np.asarray(res.error_probs)).all()
    # The aux channel flows through the batched core too.
    out = pipe._core_batch(
        pipe.params,
        jnp.zeros((2, 8, *cfg.video_hw, 3), jnp.uint8),
        jnp.broadcast_to(
            jnp.asarray([64.0, 48.0, 60.0, 80.0]), (2, 8, 4)),
        jnp.ones((2, 8), bool),
    )
    assert out["kpt_aux"].shape == (2, 8, 17, 4)
    aux = np.asarray(out["kpt_aux"], np.float32)
    assert np.isfinite(aux).all()
    assert (aux[..., 2] >= 0).all() and (aux[..., 3] >= 0).all()


def test_mode_features_require_tracking():
    cfg = dataclasses.replace(
        TINY, error=dataclasses.replace(TINY.error, mode_features=True))
    pipe = orchestrator.Pipeline(cfg, seed=0)
    with pytest.raises(ValueError, match="decode_tracking"):
        pipe.analyze(_swing_frames(t=10))


def test_detect_error_aux_variants(tmp_path):
    for flags, expect in (
        (dict(), {"spread_features": False, "mode_features": False}),
        (dict(spread_features=True),
         {"spread_features": True, "mode_features": False}),
        (dict(mode_features=True),
         {"spread_features": False, "mode_features": True}),
    ):
        cfg = cfg_mod.ErrorConfig(dtype="float32", **flags)
        m = error_mod.create_error_model(cfg)
        sk = jnp.zeros((1, 4, 17, 3))
        pl = jnp.zeros((1, 4, cfg_mod.NUM_PHASES))
        params = m.init(jax.random.key(0), sk, pl, jnp.ones((1, 4), bool))
        root = tmp_path / f"art_{'_'.join(flags) or 'base'}"
        (root / "params").mkdir(parents=True)
        checkpoint.save_params_npz(
            str(root / "params" / "error.npz"), params)
        assert checkpoint.detect_error_aux(str(root)) == expect
        # config_for_artifacts applies the detected variant.
        got = checkpoint.config_for_artifacts(
            cfg_mod.get_config("full_pipeline"), str(root))
        assert got.error.spread_features == expect["spread_features"]
        assert got.error.mode_features == expect["mode_features"]


def test_presence_gating_and_profile(tmp_path):
    import json

    # Merged profile: chicken_wing elbow is bimodal, early_extension not
    # measured -> conservative noise floor.
    prof = {"faults": {"chicken_wing": {"per_joint_presence": {"7": 0.96},
                                        "per_joint_canon_frac": {"7": 0.62}},
                       "over_the_top": {"per_joint_presence": {"7": 0.5,
                                                               "9": 0.3}}}}
    p = tmp_path / "probe_heatmap_modes.json"
    p.write_text(json.dumps(prof))
    tab, canon = data.load_mode_profile(str(p))
    e_cw = cfg_mod.SWING_ERRORS.index("chicken_wing")
    e_ee = cfg_mod.SWING_ERRORS.index("early_extension")
    assert tab[e_cw, 7] == pytest.approx(0.96)
    assert canon[e_cw, 7] == pytest.approx(0.62)
    assert np.isnan(tab[e_ee, 11])

    flags = np.zeros(cfg_mod.NUM_ERRORS, np.float32)
    flags[e_cw] = 1.0
    pres = data.conditioned_presence(tab, flags)
    assert pres[7] == pytest.approx(0.96)
    assert pres[11] == 0.0              # unmeasured -> no synthetic mode

    # synth_modes with presence=0 keeps the NOISE FLOOR on fault joints
    # (the NMS always returns a runner-up), not the hidden mode.
    rng = np.random.default_rng(0)
    N, T, V = 4, 16, 17
    kpts = rng.normal(300, 50, (N, T, V, 3)).astype(np.float32)
    defl = np.zeros((N, T, V, 2), np.float32)
    defl[..., 11, 0] = 30.0            # hip deflection, presence 0
    defl[..., 7, 0] = 30.0             # elbow deflection, presence 1
    g = np.full((N, 1, V, 1), 0.3, np.float32)
    pres = np.zeros((N, 1, V), np.float32)
    pres[..., 7] = 1.0
    out = data.synth_modes(kpts, rng, defl_vec=defl, gain=g,
                           clean_rel=np.full(V, 0.1, np.float32),
                           clean_sep=np.full(V, 80.0, np.float32),
                           miss_prob=0.0, presence=pres)
    # Elbow: hidden mode at ~(1-g)*30 = 21 px with directed offset.
    assert 12.0 < float(np.median(out[..., 7, 0])) < 32.0
    # Hip: noise floor — large random sep (~80 px), near-zero median dx.
    assert float(np.median(out[..., 11, 3])) > 40.0
    assert abs(float(np.median(out[..., 11, 0]))) < 30.0

    # Truth-dominated side (canon_frac=0): the runner-up IS the ghost at
    # -g·d = -9 px (measured regime for over_the_top/casting/hanging_back
    # where peak_nearer_canon_frac is 0.16-0.29).
    out2 = data.synth_modes(kpts, rng, defl_vec=defl, gain=g,
                            clean_rel=np.full(V, 0.1, np.float32),
                            clean_sep=np.full(V, 80.0, np.float32),
                            miss_prob=0.0, presence=pres,
                            canon_frac=np.zeros((N, 1, V), np.float32))
    assert -16.0 < float(np.median(out2[..., 7, 0])) < -4.0


def test_synth_modes_flicker_full_separation():
    """Flicker model: with present/side masks the runner-up sits at the
    FULL ±d separation (measured regime), not the (1-g)·d blend."""
    rng = np.random.default_rng(3)
    N, T, V = 4, 16, 17
    kpts = rng.normal(300, 50, (N, T, V, 3)).astype(np.float32)
    defl = np.zeros((N, T, V, 2), np.float32)
    defl[..., 7, 0] = 30.0
    present = np.zeros((N, T, V), bool); present[..., 7] = True
    side = np.zeros((N, T, V), bool)
    side[: N // 2, :, 7] = True         # canon-dominated half
    out = data.synth_modes(kpts, rng, defl_vec=defl,
                           clean_rel=np.full(V, 0.1, np.float32),
                           clean_sep=np.full(V, 80.0, np.float32),
                           miss_prob=0.0, present_mask=present,
                           side_canon=side)
    # Canon side: runner-up at +d (~30 px); truth side: ghost at -d.
    assert 20.0 < float(np.median(out[: N // 2, :, 7, 0])) < 42.0
    assert -42.0 < float(np.median(out[N // 2:, :, 7, 0])) < -20.0
