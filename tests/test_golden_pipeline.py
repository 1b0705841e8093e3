"""Golden end-to-end pipeline test (SURVEY.md §4 "Golden-output integration").

The fixture pins the exact output of the deterministic seed-0 pipeline on two
synthetic clips; any change to preprocess/pose/decode/GCN/error/align that
alters behavior trips this.  Regenerate intentionally with
`python tests/golden/make_golden.py` and review the diff.
"""

import os

import numpy as np
import pytest

from tests.golden.common import build_pipeline, fixture_clips

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pipeline_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixture missing; run tests/golden/make_golden.py")
    return np.load(GOLDEN)


@pytest.mark.slow
def test_pipeline_matches_golden(golden):
    pipe = build_pipeline()
    clip_a, clip_b = fixture_clips()
    res_a = pipe.analyze(clip_a)
    res_b = pipe.analyze(clip_b, reference=pipe.extract_skeleton(res_a))

    np.testing.assert_allclose(
        np.asarray(res_a.keypoints), golden["keypoints_a"], atol=1e-4,
        err_msg="pose/preprocess/decode drift",
    )
    np.testing.assert_allclose(
        np.asarray(res_a.phase_logits), golden["phase_logits_a"], atol=1e-3,
        err_msg="GCN drift",
    )
    np.testing.assert_allclose(
        np.asarray(res_a.error_probs), golden["error_probs_a"], atol=1e-4,
        err_msg="error head drift",
    )
    np.testing.assert_array_equal(
        np.asarray(res_b.phase_labels), golden["phase_labels_b"],
        err_msg="label-level mismatch (BASELINE bit-for-bit bar)",
    )
    np.testing.assert_allclose(
        float(res_b.alignment.cost), float(golden["align_cost"]), rtol=1e-4,
        err_msg="soft-DTW drift",
    )
    assert int(res_b.alignment.path_length) == int(golden["align_length"])
    np.testing.assert_array_equal(
        np.asarray(res_b.alignment.path), golden["align_path"],
        err_msg="alignment path mismatch",
    )
