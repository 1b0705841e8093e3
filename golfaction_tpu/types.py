"""Core pytree value types flowing between pipeline stages.

These are the tensors named by the system's public contract (BASELINE.json
north_star: "video in, per-frame keypoints, swing-phase labels, alignment
path, and error flags out").  All containers are `flax.struct` dataclasses so
they traverse `jit`/`pjit` boundaries as pytrees with static aux fields.

Shape conventions (static under jit; T is padded to a length bucket):
  frames:    [T, H, W, 3] uint8/float   NHWC, device-side
  keypoints: [T, V, 3]                  (x, y, score) in source-image pixels
  heatmaps:  [T, V, Hh, Wh]
  phases:    [T] int32                  per-frame swing-phase label
  path:      [Ta + Tb - 1, 2] int32     soft-DTW alignment path (padded w/ -1)
  errors:    [E] float32                per-fault probability
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Clip:
    """A decoded video clip plus its per-frame person boxes.

    `valid` masks real frames vs. bucket padding; every temporal op must
    respect it (SURVEY.md §7 hard part (c)).
    """

    frames: jnp.ndarray                 # [T, H, W, 3]
    boxes: jnp.ndarray                  # [T, 4] person box (cx, cy, w, h) px
    valid: jnp.ndarray                  # [T] bool
    fps: float = flax.struct.field(pytree_node=False, default=30.0)

    @property
    def num_frames(self) -> int:
        return self.frames.shape[0]


@flax.struct.dataclass
class Skeleton:
    """Per-frame 2D keypoints for one clip."""

    keypoints: jnp.ndarray              # [T, V, 3] (x, y, score), image px
    valid: jnp.ndarray                  # [T] bool

    @property
    def num_frames(self) -> int:
        return self.keypoints.shape[0]

    @property
    def num_joints(self) -> int:
        return self.keypoints.shape[1]


@flax.struct.dataclass
class AlignmentResult:
    """Soft-DTW comparison of two swings (reference README.md:21,50-52)."""

    cost: jnp.ndarray                   # [] soft-DTW alignment cost
    path: jnp.ndarray                   # [Lmax, 2] int32 (i, j); -1 padding
    path_length: jnp.ndarray            # [] int32 number of valid path steps
    soft_assignment: Optional[jnp.ndarray] = None   # [Ta, Tb] E[alignment]


@flax.struct.dataclass
class AnalysisResult:
    """Full-pipeline output: the system's public contract (BASELINE north_star)."""

    keypoints: jnp.ndarray              # [T, V, 3]
    phase_labels: jnp.ndarray           # [T] int32 into config.SWING_PHASES
    phase_logits: jnp.ndarray           # [T, P]
    error_flags: jnp.ndarray            # [E] bool
    error_probs: jnp.ndarray            # [E] float32
    valid: jnp.ndarray                  # [T] bool
    alignment: Optional[AlignmentResult] = None
