"""Multi-hypothesis tracked decode: topk_modes + viterbi_track.

The scenario these exist for (measured in scripts/probe_heatmap_modes.py):
fault-frame heatmaps are BIMODAL — a canonical-prior ghost mode and the
true deflected mode — and the single-peak decode flips between them.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from golfaction_tpu.ops import heatmap


def gauss(hw, cx, cy, sigma=2.0, amp=1.0):
    H, W = hw
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    return amp * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2))


class TestTopkModes:
    def test_unimodal_matches_single_peak_decode(self):
        hm = np.stack([gauss((64, 48), 20.3, 30.7), gauss((64, 48), 10.1, 5.5)])
        modes = heatmap.topk_modes(jnp.asarray(hm), k=3)
        single = heatmap.decode_heatmaps(jnp.asarray(hm), method="udp")
        np.testing.assert_allclose(
            np.asarray(modes[:, 0]), np.asarray(single), atol=1e-5
        )

    def test_bimodal_finds_both(self):
        hm = gauss((64, 48), 12.0, 40.0, amp=1.0) + gauss(
            (64, 48), 30.0, 10.0, amp=0.6
        )
        modes = np.asarray(heatmap.topk_modes(jnp.asarray(hm)[None], k=3))[0]
        np.testing.assert_allclose(modes[0, :2], [12.0, 40.0], atol=0.1)
        np.testing.assert_allclose(modes[1, :2], [30.0, 10.0], atol=0.1)
        assert modes[0, 2] > modes[1, 2]

    def test_suppression_radius(self):
        # Two peaks 2 px apart with suppress_radius 3: the second must NOT
        # be the shoulder of the first.
        hm = gauss((32, 32), 10.0, 10.0) + gauss((32, 32), 25.0, 25.0, amp=0.5)
        modes = np.asarray(
            heatmap.topk_modes(jnp.asarray(hm)[None], k=2, suppress_radius=3.0)
        )[0]
        d01 = np.hypot(modes[0, 0] - modes[1, 0], modes[0, 1] - modes[1, 1])
        assert d01 > 3.0

    def test_batch_dims(self):
        hm = np.random.default_rng(0).random((4, 17, 64, 48)).astype(np.float32)
        modes = heatmap.topk_modes(jnp.asarray(hm), k=4)
        assert modes.shape == (4, 17, 4, 3)


class TestViterbiTrack:
    def _bimodal_clip(self, T=24, flip_frames=(5, 9, 14)):
        """True mode moves smoothly; a static ghost outscores it on a few
        frames so per-frame argmax flips while the DP should not."""
        hw = (64, 48)
        true_xy = np.stack(
            [12 + 0.8 * np.arange(T), 30 + 0.3 * np.arange(T)], -1
        )
        ghost_xy = np.array([12.0, 30.0])
        hms, amp_true = [], []
        for t in range(T):
            a = 0.5 if t in flip_frames else 1.0
            amp_true.append(a)
            hms.append(
                gauss(hw, true_xy[t, 0], true_xy[t, 1], amp=a)
                + gauss(hw, ghost_xy[0], ghost_xy[1], amp=0.7)
            )
        return np.stack(hms)[:, None], true_xy  # [T, 1, H, W]

    def test_follows_true_track_through_flips(self):
        hm, true_xy = self._bimodal_clip()
        modes = heatmap.topk_modes(jnp.asarray(hm), k=3)
        kpts = np.asarray(heatmap.viterbi_track(modes, lam=0.1))
        # Per-frame argmax flips to the ghost on the weak frames...
        single = np.asarray(heatmap.decode_heatmaps(jnp.asarray(hm)))
        err_single = np.linalg.norm(single[:, 0, :2] - true_xy, axis=-1)
        assert err_single.max() > 3.0
        # ...the Viterbi track does not (skip early frames where the two
        # gaussians still overlap and bias the mode position itself).
        err = np.linalg.norm(kpts[:, 0, :2] - true_xy, axis=-1)
        assert err[6:].max() < 1.0, err

    def test_unimodal_matches_single_decode(self):
        T = 8
        hm = np.stack(
            [gauss((64, 48), 10 + t, 20 + 0.5 * t) for t in range(T)]
        )[:, None]
        modes = heatmap.topk_modes(jnp.asarray(hm), k=4)
        kpts = np.asarray(heatmap.viterbi_track(modes, lam=0.1))
        single = np.asarray(heatmap.decode_heatmaps(jnp.asarray(hm)))
        np.testing.assert_allclose(kpts, single, atol=1e-5)

    def test_lambda_zero_is_per_frame_argmax(self):
        hm, _ = self._bimodal_clip()
        modes = heatmap.topk_modes(jnp.asarray(hm), k=3)
        kpts = np.asarray(heatmap.viterbi_track(modes, lam=0.0))
        single = np.asarray(heatmap.decode_heatmaps(jnp.asarray(hm)))
        np.testing.assert_allclose(kpts[..., :2], single[..., :2], atol=1e-5)


class TestPipelineIntegration:
    def test_tracked_decode_in_pipeline(self):
        from golfaction_tpu import config as cfg_mod
        from golfaction_tpu.pipeline import orchestrator
        from golfaction_tpu.train import data

        cfg = cfg_mod.get_config(
            "full_pipeline", video_hw=(128, 96), length_buckets=(16,)
        )
        cfg = cfg_mod.apply_overrides(cfg, ["pose.decode_tracking=4"])
        pipe = orchestrator.Pipeline(cfg, seed=0)
        s = data.make_swing_batch(1, 16, seed=7, image_hw=(128, 96),
                                  render=True)[0]
        r = pipe.analyze(s.frames)
        kp = np.asarray(r.keypoints)
        assert kp.shape[-1] == 3
        assert np.isfinite(kp).all()
