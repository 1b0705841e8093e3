"""Native C++ host runtime vs NumPy oracle parity."""

import numpy as np
import pytest

from golfaction_tpu import native
from golfaction_tpu.pipeline import video_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _clip(t=12, h=90, w=120, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(25, 45, (t, h, w, 3)).astype(np.uint8)
    for i in range(t):
        cx = 30 + 5 * i
        frames[i, 15:70, cx - 8 : cx + 8] = 210
    return frames


def test_motion_boxes_matches_numpy_oracle():
    frames = _clip()
    ref = video_io.estimate_person_boxes(frames, use_native=False)
    got = native.motion_boxes(frames)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1.0)  # sub-pixel percentile interp


def test_motion_boxes_fallback_frame():
    # A static clip (no motion) must produce the fallback box everywhere.
    frames = np.full((6, 80, 100, 3), 33, np.uint8)
    ref = video_io.estimate_person_boxes(frames, use_native=False)
    got = native.motion_boxes(frames)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    np.testing.assert_allclose(got[0], [50, 40, 50, 72], atol=1e-4)


def test_motion_boxes_various_lengths():
    for t in (2, 5, 9, 16):
        frames = _clip(t=t, seed=t)
        ref = video_io.estimate_person_boxes(frames, use_native=False)
        got = native.motion_boxes(frames)
        np.testing.assert_allclose(got, ref, atol=1.0), t


def test_bgr_to_rgb():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (3, 8, 9, 3)).astype(np.uint8)
    got = native.bgr_to_rgb(x)
    np.testing.assert_array_equal(got, x[..., ::-1])
