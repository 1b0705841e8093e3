"""Visualization layer smoke tests (host-side rendering)."""

import numpy as np
import pytest

from golfaction_tpu.pipeline import visualize
from golfaction_tpu.train import data

cv2 = pytest.importorskip("cv2")


def _sample(t=6, hw=(120, 160)):
    rng = np.random.default_rng(0)
    s = data.swing_keypoints(t, rng)
    s = data.place_in_image(s, hw, person_height_px=80, rng=rng)
    frames = np.full((t, *hw, 3), 40, np.uint8)
    return frames, s


def test_draw_skeleton_changes_pixels():
    frames, s = _sample()
    out = visualize.draw_skeleton(frames[0], s.keypoints[0])
    assert out.shape == frames[0].shape
    assert (out != frames[0]).any()
    # Low-score joints are skipped entirely.
    k = s.keypoints[0].copy()
    k[:, 2] = 0.0
    out2 = visualize.draw_skeleton(frames[0], k)
    np.testing.assert_array_equal(out2, frames[0])


def test_render_comparison_shapes():
    frames, s = _sample(t=6)
    path = np.stack([np.arange(6), np.arange(6)], axis=-1).astype(np.int32)
    panels = visualize.render_comparison(
        frames, s.keypoints, frames, s.keypoints, path, path_length=6,
        max_pairs=4,
    )
    assert panels.shape == (4, 120, 320, 3)


def test_write_video(tmp_path):
    frames, s = _sample(t=4)
    out = visualize.render_comparison(
        frames, s.keypoints, frames, s.keypoints,
        np.stack([np.arange(4), np.arange(4)], -1).astype(np.int32), 4,
    )
    p = str(tmp_path / "cmp.mp4")
    visualize.write_video(p, out)
    rd = cv2.VideoCapture(p)
    assert int(rd.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    rd.release()
