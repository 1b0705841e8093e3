"""Regenerate the golden pipeline fixture (run on CPU from repo root):

    python tests/golden/make_golden.py

Pins the end-to-end output (keypoints, phase logits, error logits, alignment
path) of the seed-0 tiny pipeline on a deterministic synthetic clip.  Tests
compare against this bit-for-bit-at-tolerance — the SURVEY.md §4 golden gate
that catches any unintended behavioral drift in preprocess/pose/decode/GCN/
error/align.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from tests.golden.common import build_pipeline, fixture_clips  # noqa: E402


def main():
    pipe = build_pipeline()
    clip_a, clip_b = fixture_clips()
    res_a = pipe.analyze(clip_a)
    res_b = pipe.analyze(clip_b, reference=pipe.extract_skeleton(res_a))
    out = {
        "keypoints_a": np.asarray(res_a.keypoints),
        "phase_logits_a": np.asarray(res_a.phase_logits),
        "error_probs_a": np.asarray(res_a.error_probs),
        "keypoints_b": np.asarray(res_b.keypoints),
        "phase_labels_b": np.asarray(res_b.phase_labels),
        "align_cost": np.asarray(res_b.alignment.cost),
        "align_path": np.asarray(res_b.alignment.path),
        "align_length": np.asarray(res_b.alignment.path_length),
    }
    path = os.path.join(os.path.dirname(__file__), "pipeline_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
