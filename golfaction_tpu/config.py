"""Typed configuration system.

The reference repo exposes no config files (documentation-only; see SURVEY.md
§5 "Config / flag system"), so this module defines the build's own typed
dataclass configs plus the five named presets matching
`/root/repo/BASELINE.json:configs[0..4]`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from golfaction_tpu import graph

# Golf swing-phase label set (GolfDB-style event phases + background), the
# per-frame class space of the action-segmentation head
# (reference README.md:17 "ACTION SEGMENTATION MODEL").
SWING_PHASES = (
    "background",
    "address",
    "takeaway",
    "backswing",
    "top",
    "downswing",
    "impact",
    "follow_through",
    "finish",
)
NUM_PHASES = len(SWING_PHASES)

# Swing-fault taxonomy for the error-detection head (reference README.md:19
# "ERROR DETECTION MODEL"); multi-label binary flags.
SWING_ERRORS = (
    "swaying",            # lateral hip slide in backswing
    "hanging_back",       # weight stays on trail side at impact
    "early_extension",    # hips move toward ball in downswing
    "over_the_top",       # downswing plane above backswing plane
    "casting",            # early wrist release
    "reverse_spine",      # upper body tilts toward target at top
    "chicken_wing",       # lead elbow breaks down after impact
    "head_movement",      # excessive head drift
)
NUM_ERRORS = len(SWING_ERRORS)


@dataclasses.dataclass(frozen=True)
class PoseConfig:
    """Top-down heatmap pose model (reference README.md:15)."""

    input_hw: tuple[int, int] = (256, 192)      # crop H, W fed to the backbone
    heatmap_hw: tuple[int, int] = (64, 48)      # output heatmap H, W (stride 4)
    num_joints: int = graph.NUM_JOINTS
    # Backbone: ResNet-style stages; (blocks, channels) per stage.
    stage_blocks: tuple[int, ...] = (2, 2, 2, 2)
    stage_channels: tuple[int, ...] = (64, 128, 256, 512)
    # SimpleBaseline-style deconv head.  Channel taper (256->128->128) halves
    # the head FLOPs vs a flat 256 stack — the final stride-4 deconv is the
    # single most expensive layer in the pipeline — with no measurable
    # accuracy cost on the swing benchmark.
    deconv_channels: tuple[int, ...] = (256, 128, 128)
    dtype: str = "bfloat16"                      # compute dtype on TPU
    # Temporal context: channel-concatenate this many adjacent frames
    # (odd; 1 = single-frame).  3 lets the stem see t-1/t/t+1 so fast
    # motion-blurred arms can be disambiguated from temporal context
    # (round-3 arm-fidelity intervention B; changes Conv_0's input width,
    # so checkpoints are only loadable under the in_frames they were
    # trained with).
    in_frames: int = 1
    udp: bool = True                             # sub-pixel (UDP-style) decode
    sigma: float = 2.0                           # target heatmap gaussian sigma
    # Decode path: both are TPU-validated; XLA measured marginally faster
    # (0.32 vs 0.37 ms / 256 heatmaps on v5e), so it is the default and the
    # Pallas kernel stays as the parity-tested alternative.
    decode_impl: str = "xla"
    # Multi-hypothesis tracked decode: 0 = single-peak decode; k > 1 =
    # extract the top-k NMS heatmap modes per frame and select per joint by
    # exact Viterbi DP over the clip (ops/heatmap.py topk_modes /
    # viterbi_track).  Motivated by the measured bimodality of fault-frame
    # heatmaps (scripts/probe_heatmap_modes.py): the true deflected-joint
    # mode survives the backbone in 97% of faulted frames but the single
    # peak flips to the canonical ghost half the time.  Takes precedence
    # over decode_impl (the Pallas single-peak kernel stays the k=0 path).
    decode_tracking: int = 0
    # Transition weight lam in: cost = -log(score) + lam*||xy_t - xy_{t-1}||²
    # (heatmap px²).
    track_lambda: float = 0.1
    # NMS suppression radius (heatmap px) for tracked-decode mode
    # extraction.  Must be BELOW the expected canonical-vs-true mode
    # separation (~2.6 px measured, artifacts/probe_heatmap_modes.json) or
    # extracting the first mode erases the second; at the default sigma-2
    # training target the modes merge anyway, so this only matters for
    # narrow-sigma candidates (poseG: sigma 1.25, radius 2).
    track_suppress_radius: float = 3.0


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    """Skeleton GCN action segmentation (reference README.md:17,26-34)."""

    num_joints: int = graph.NUM_JOINTS
    in_channels: int = 3                         # (x, y, score)
    num_phases: int = NUM_PHASES
    # (out_channels, temporal_stride) per block. Strides stay 1: the head is
    # per-frame, so temporal resolution is preserved end to end.
    block_channels: tuple[int, ...] = (64, 64, 128, 128, 256, 256)
    # Multi-branch temporal conv: (kernel, dilation) branches + maxpool branch.
    temporal_branches: tuple[tuple[int, int], ...] = ((3, 1), (3, 2), (3, 3), (3, 4))
    channel_att_reduction: int = 4
    graph_strategy: str = "spatial"
    dropout: float = 0.1
    dtype: str = "bfloat16"
    # GCN inference path: "pallas" (default) = fused block-tail kernels.
    # Measured on v5e at B=8/T=64: 1.43x the XLA stage AND compiles in ~6 s
    # vs XLA's ~114 s for the same program (the round-1 multi-minute Mosaic
    # compile was the in-kernel iota-built pool matrices, since moved to
    # static inputs).  "xla" remains for CPU/debug (the kernel itself
    # falls back to interpret off-TPU automatically).
    inference_impl: str = "pallas"


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    """Temporal-alignment embedding net + soft-DTW (reference README.md:21,44-52)."""

    num_joints: int = graph.NUM_JOINTS
    in_channels: int = 3
    embed_dim: int = 128
    hidden_channels: tuple[int, ...] = (64, 128)
    temporal_kernel: int = 5
    gamma: float = 0.1                           # soft-DTW smoothing
    normalize_embeddings: bool = True
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class ErrorConfig:
    """Swing-error classifier (reference README.md:19)."""

    num_errors: int = NUM_ERRORS
    num_phases: int = NUM_PHASES
    num_joints: int = graph.NUM_JOINTS
    in_channels: int = 3
    hidden_dim: int = 256
    dtype: str = "bfloat16"
    # Heatmap-spread features (ops/heatmap.moment_stats): per-joint excess
    # spread along the reference-deviation direction + isotropic excess.
    # Recovers fault deflections the decode attenuates (merged bimodal
    # blobs — probe_heatmap_spread.json).  Changes the head's feature dim:
    # checkpoints are not interchangeable across this flag.
    spread_features: bool = False
    # Secondary-mode features: per-joint offset/relative-mass of the
    # strongest non-selected heatmap mode (requires pose.decode_tracking
    # >= 2).  The sigma-1.25 successor to spread_features: at sigma 2 the
    # canonical+true components MERGE and only a covariance excess
    # survives (beta 0.0-0.52, probe_heatmap_spread.json); at sigma 1.25
    # they are SEPARABLE modes (true mode present in 95.9% of faulted
    # frames, probe_heatmap_modes) and the secondary mode's offset IS the
    # suppressed deflection.  Mutually exclusive with spread_features;
    # changes the head's feature dim (+3*V vs +2*V).
    mode_features: bool = False


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    """Keypoint-sequence refiner (models/refine.py): graph-temporal second
    stage that learns to undo the pose front's systematic fault-deflection
    attenuation.  Opt-in: enabled=False keeps params/pipeline unchanged."""

    enabled: bool = False
    block_channels: tuple[int, ...] = (48, 48)
    temporal_branches: tuple[tuple[int, int], ...] = ((3, 1), (3, 2), (3, 4))
    channel_att_reduction: int = 4
    # Residual clamp in torso-normalized units (~0.5 torso lengths): the
    # refiner may amplify attenuated deflections, never teleport joints.
    max_residual: float = 0.5
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map (SURVEY.md §2 parallelism table)."""

    data_axis: str = "data"
    model_axis: str = "model"                    # reserved; models are small
    data_parallel: int = -1                      # -1 = all devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end orchestrator (BASELINE config 5)."""

    pose: PoseConfig = PoseConfig()
    gcn: GCNConfig = GCNConfig()
    align: AlignConfig = AlignConfig()
    error: ErrorConfig = ErrorConfig()
    refine: RefineConfig = RefineConfig()
    mesh: MeshConfig = MeshConfig()
    frame_batch: int = 32                        # frames per pose micro-batch
    # Clip lengths are padded up to the nearest bucket so jit never retraces.
    length_buckets: tuple[int, ...] = (64, 128, 256, 512)
    video_hw: tuple[int, int] = (1080, 1920)
    # Warp path: XLA's fused separable-matmul measured faster than the
    # Pallas kernel at pipeline batch sizes (0.40 vs 0.56 ms / 8x1080p on
    # v5e — the kernel pays an NHWC->planar transpose), so XLA is default.
    preprocess_impl: str = "xla"
    # Warp compute dtype.  The separable warp is two MXU matmuls over the
    # full 1080p frame (~2.4 GFLOP/frame — on the order of the pose net
    # itself); the MXU is bf16-native, and uint8 pixel values 0-255 are all
    # exactly representable in bf16, so "bfloat16" halves the warp cost
    # with error bounded by the interp-weight rounding (~0.4% of a pixel
    # step, far below photometric augmentation noise).  f32 accumulation
    # either way (preferred_element_type).
    preprocess_dtype: str = "float32"
    # analyze_batch processes clips in fixed chunks of this many per
    # compiled program (padded by repetition): every distinct batch shape
    # is a separate jit compile, so the chunk bounds compiles at
    # (buckets x 1) while keeping MXU batches large.
    clip_batch: int = 8
    # Keypoint-seeded box refinement: run a coarse pose pass every
    # `box_refine_stride` frames with the host-estimated boxes, derive
    # smoothed per-frame boxes from the decoded keypoints on-device, and
    # re-run pose with the refined boxes.  Robust to moving cameras (where
    # motion-energy boxes fail) at ~1/stride extra pose cost.  0 = off.
    box_refine_stride: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 100
    total_steps: int = 1000
    seed: int = 0
    checkpoint_dir: str = "/tmp/golfaction_ckpt"
    checkpoint_every: int = 200
    tb_logdir: str | None = None   # optional TensorBoard scalar mirror


def _preset_pose_single() -> PipelineConfig:
    # config 1: single-image pose inference, CPU-runnable.
    return PipelineConfig(frame_batch=1)


def _preset_clip_pose() -> PipelineConfig:
    # config 2: batched clip preprocessing + pose at 30 fps.
    return PipelineConfig(frame_batch=32)


def _preset_segmentation() -> PipelineConfig:
    # config 3: skeleton GCN action segmentation.
    return PipelineConfig()


def _preset_alignment() -> PipelineConfig:
    # config 4: soft-DTW pro-vs-amateur alignment.
    return PipelineConfig()


def _preset_full_pipeline() -> PipelineConfig:
    # config 5: multi-clip pipelined end-to-end analysis.
    return PipelineConfig(frame_batch=64)


# Named presets matching BASELINE.json:configs[0..4].
PRESETS = {
    "pose_single": _preset_pose_single,
    "clip_pose": _preset_clip_pose,
    "segmentation": _preset_segmentation,
    "alignment": _preset_alignment,
    "full_pipeline": _preset_full_pipeline,
}


def get_config(name: str = "full_pipeline", **overrides) -> PipelineConfig:
    cfg = PRESETS[name]()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def apply_overrides(cfg, assignments: Sequence[str]):
    """Apply CLI `--set dotted.key=value` overrides to a (nested) dataclass.

    Values parse as Python literals when possible, else stay strings:
        apply_overrides(cfg, ["frame_batch=16", "pose.dtype=float32",
                              "length_buckets=(32,64)"])
    """
    import ast

    for item in assignments:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} must look like key=value")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        parts = key.strip().split(".")
        # Rebuild the nested frozen dataclasses from the leaf up.
        chain = [cfg]
        for p in parts[:-1]:
            chain.append(getattr(chain[-1], p))
        if not hasattr(chain[-1], parts[-1]):
            raise AttributeError(f"no config field {key!r}")
        node = dataclasses.replace(chain[-1], **{parts[-1]: value})
        for obj, name in zip(reversed(chain[:-1]), reversed(parts[:-1])):
            node = dataclasses.replace(obj, **{name: node})
        cfg = node
    return cfg
