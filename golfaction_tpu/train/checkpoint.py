"""Orbax checkpointing for all pipeline params (SURVEY.md §5 checkpoint/resume).

The reference implies trained weights (README.md:24-48 training curves) but
ships none; this module owns save/restore for the build's own params with
deterministic pytree schemas, enabling training resume after preemption and
parameter exchange between training and the inference Pipeline.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_params(path: str, params: Any, step: Optional[int] = None) -> str:
    """Save a params pytree (e.g. Pipeline.params dict) to `path`.

    Returns the concrete checkpoint directory written.
    """
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, like: Optional[Any] = None,
                   device=None) -> Any:
    """Restore a params pytree.  `like` (an abstract/concrete pytree of the
    same structure) enables dtype/shape-checked restoration.

    With `like=None` the target structure is reconstructed from the
    checkpoint's own metadata — no model init needed (init jit-compiles
    hundreds of ops; minutes on a single-core host).  `device` pins the
    restored arrays (default: the process default device), which also
    neutralizes stale device names in checkpoint sharding metadata (e.g. a
    TPU-written checkpoint restored on CPU).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if device is None:
        device = jax.local_devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(device)
    if like is not None:
        # A concrete sharding is required: without it Orbax falls back to
        # the checkpoint's own sharding metadata, whose device names are
        # stale across platforms (TPU-written -> CPU restore raises
        # "sharding ... Got None").
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                           sharding=sharding), like
        )
        return ckptr.restore(path, abstract)
    meta = ckptr.metadata(path).item_metadata
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta,
    )
    return ckptr.restore(path, abstract)


def load_pipeline_params(root: str, like: Any) -> Any:
    """Load Pipeline params from an artifacts tree written by
    scripts/train_eval.py (<root>/params/<model>/step_XXXXXXXX or
    <root>/<model>/step_XXXXXXXX).  Models without a checkpoint keep their
    `like` (e.g. random-init) values, so partial artifact sets work.
    A compact `<base>/<model>.npz` (save_params_npz — the git-committable
    form) is used when no Orbax step dir exists.
    """
    base = os.path.join(root, "params") if os.path.isdir(
        os.path.join(root, "params")
    ) else root
    out = dict(like)
    for name in like:
        step_dir = latest_step_dir(os.path.join(base, name))
        if step_dir:
            out[name] = restore_params(step_dir, like=like[name])
        elif os.path.exists(os.path.join(base, f"{name}.npz")):
            out[name] = restore_params_npz(os.path.join(base, f"{name}.npz"))
    return out


def _key_str(k) -> str:
    if hasattr(k, "key"):       # DictKey
        return str(k.key)
    if hasattr(k, "name"):      # GetAttrKey
        return str(k.name)
    return str(getattr(k, "idx", k))  # SequenceKey


def save_params_npz(path: str, params: Any, dtype=np.float16) -> str:
    """Compact single-file checkpoint: the params pytree flattened to
    '/'-joined key paths in one compressed .npz, float leaves cast to
    `dtype` (default f16 — half of f32; pose PCK impact is below eval
    noise, guarded by the round-trip test).  Purpose: a ~15 MB pose
    checkpoint small enough to COMMIT, so a fresh clone runs the trained
    pipeline without the multi-hour retrain (the Orbax tree is ~60 MB and
    gitignored).  Dict-keyed pytrees only (flax params)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for kp, leaf in flat:
        arr = np.asarray(leaf)
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        out["/".join(_key_str(k) for k in kp)] = arr
    np.savez_compressed(path, **out)
    return path


def restore_params_npz(path: str, cast=np.float32) -> Any:
    """Restore a save_params_npz checkpoint to a nested-dict pytree,
    casting float leaves to `cast` (default f32, the training dtype —
    models downcast to bf16 internally where they want it)."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if cast is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(cast)
        node[parts[-1]] = arr
    return tree


def detect_pose_in_frames(root: str) -> int:
    """Infer pose.in_frames from a saved pose checkpoint's stem kernel
    shape (Conv_0 kernel [7, 7, 3*in_frames, 64]) without restoring it.

    The temporal-context width changes the stem's input channels, so a
    checkpoint is only loadable under the in_frames it was trained with;
    this lets pipeline constructors self-configure from the artifacts tree
    (returns 1 when no pose checkpoint exists).
    """
    root = os.path.abspath(root)  # Orbax metadata() silently fails (None)
    # on relative paths, which would mis-detect every multi-frame ckpt as 1.
    base = os.path.join(root, "params") if os.path.isdir(
        os.path.join(root, "params")
    ) else root
    step_dir = latest_step_dir(os.path.join(base, "pose"))
    if not step_dir:
        npz = os.path.join(base, "pose.npz")
        if os.path.exists(npz):
            try:
                with np.load(npz) as d:
                    shape = d["params/Conv_0/kernel"].shape
                return max(int(shape[2]) // 3, 1)
            except Exception:
                return 1
        return 1
    try:
        meta = ocp.StandardCheckpointer().metadata(step_dir).item_metadata
        shape = meta["params"]["Conv_0"]["kernel"].shape
    except Exception:
        return 1
    return max(int(shape[2]) // 3, 1)


def detect_error_spread(root: str) -> Optional[bool]:
    """Infer error.spread_features from a saved error checkpoint's first
    Dense kernel input dim (the spread block adds 2*V feature channels,
    so the two variants are not shape-compatible).  Returns None when no
    error checkpoint exists or the shape matches neither variant."""
    root = os.path.abspath(root)
    base = os.path.join(root, "params") if os.path.isdir(
        os.path.join(root, "params")
    ) else root
    in_dim = None
    step_dir = latest_step_dir(os.path.join(base, "error"))
    if step_dir:
        try:
            meta = ocp.StandardCheckpointer().metadata(step_dir).item_metadata
            in_dim = int(meta["params"]["Dense_0"]["kernel"].shape[0])
        except Exception:
            return None
    else:
        npz = os.path.join(base, "error.npz")
        if os.path.exists(npz):
            try:
                with np.load(npz) as d:
                    in_dim = int(d["params/Dense_0/kernel"].shape[0])
            except Exception:
                return None
    if in_dim is None:
        return None
    from golfaction_tpu.models.error import NUM_ANGLE_FEATURES
    from golfaction_tpu.graph import NUM_JOINTS as V

    base_dim = 2 * V + 2 * V + 2 * NUM_ANGLE_FEATURES + 3 * V + 1
    if in_dim == base_dim:
        return False
    if in_dim == base_dim + 2 * V:
        return True
    return None


def detect_error_aux(root: str) -> Optional[dict]:
    """Infer the error head's aux-feature variant from its first Dense
    kernel input dim: base (no aux), +2*V (spread_features), or +3*V
    (mode_features).  Returns {"spread_features": bool,
    "mode_features": bool} or None when undetectable."""
    root = os.path.abspath(root)
    base = os.path.join(root, "params") if os.path.isdir(
        os.path.join(root, "params")
    ) else root
    in_dim = None
    step_dir = latest_step_dir(os.path.join(base, "error"))
    if step_dir:
        try:
            meta = ocp.StandardCheckpointer().metadata(step_dir).item_metadata
            in_dim = int(meta["params"]["Dense_0"]["kernel"].shape[0])
        except Exception:
            return None
    else:
        npz = os.path.join(base, "error.npz")
        if os.path.exists(npz):
            try:
                with np.load(npz) as d:
                    in_dim = int(d["params/Dense_0/kernel"].shape[0])
            except Exception:
                return None
    if in_dim is None:
        return None
    from golfaction_tpu.models.error import NUM_ANGLE_FEATURES
    from golfaction_tpu.graph import NUM_JOINTS as V

    base_dim = 2 * V + 2 * V + 2 * NUM_ANGLE_FEATURES + 3 * V + 1
    if in_dim == base_dim:
        return {"spread_features": False, "mode_features": False}
    if in_dim == base_dim + 2 * V:
        return {"spread_features": True, "mode_features": False}
    if in_dim == base_dim + 3 * V:
        return {"spread_features": False, "mode_features": True}
    return None


#: pose_meta.json keys -> PipelineConfig override paths.  These are pose
#: properties NOT inferable from checkpoint array shapes (sigma-1.25 and
#: sigma-2 nets are shape-identical) but required for correct decode: a
#: narrow-sigma candidate only beats the canonical-ghost prior with
#: tracked decode at a sub-separation NMS radius (BASELINE.md round 4).
POSE_META_KEYS = {
    "sigma": "pose.sigma",
    "decode_tracking": "pose.decode_tracking",
    "track_lambda": "pose.track_lambda",
    "track_suppress_radius": "pose.track_suppress_radius",
}


def save_pose_meta(root: str, **meta) -> str:
    """Write `<root>/pose_meta.json` recording the promoted pose
    checkpoint's decode configuration (POSE_META_KEYS).  Written at
    promotion time next to `params/`; read back by config_for_artifacts."""
    import json

    unknown = set(meta) - set(POSE_META_KEYS)
    if unknown:
        raise ValueError(f"unknown pose_meta keys: {sorted(unknown)}")
    path = os.path.join(os.path.abspath(root), "pose_meta.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_pose_meta(root: str) -> dict:
    import json

    path = os.path.join(os.path.abspath(root), "pose_meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {k: v for k, v in json.load(f).items() if k in POSE_META_KEYS}


def config_for_artifacts(cfg, root: str):
    """Adapt a PipelineConfig to an artifacts tree: set pose.in_frames to
    the width the saved pose checkpoint was trained with (see
    detect_pose_in_frames), enable the keypoint refiner when the tree
    carries a trained `refine` checkpoint, match error.spread_features
    to the saved error head's feature dim, and apply the checkpoint's own
    decode configuration from `pose_meta.json` (sigma / tracked-decode
    knobs that array shapes cannot reveal).  No-op when they agree."""
    overrides = []
    meta = load_pose_meta(root)
    for key, path in POSE_META_KEYS.items():
        val = meta.get(key)
        if val is None:
            continue
        obj = cfg
        for part in path.split(".")[:-1]:
            obj = getattr(obj, part)
        if val != getattr(obj, path.split(".")[-1]):
            overrides.append(f"{path}={val}")
    nf = detect_pose_in_frames(root)
    if nf != cfg.pose.in_frames:
        overrides.append(f"pose.in_frames={nf}")
    base = os.path.join(root, "params") if os.path.isdir(
        os.path.join(root, "params")
    ) else root
    has_refine = latest_step_dir(os.path.join(base, "refine")) is not None
    if has_refine != cfg.refine.enabled:
        overrides.append(f"refine.enabled={has_refine}")   # Python literal
    aux = detect_error_aux(root)
    if aux is not None:
        for k, v in aux.items():
            if v != getattr(cfg.error, k):
                overrides.append(f"error.{k}={v}")
    if not overrides:
        return cfg
    from golfaction_tpu import config as cfg_mod

    return cfg_mod.apply_overrides(cfg, overrides)


def latest_step_dir(root: str) -> Optional[str]:
    """Find the newest step_XXXXXXXX checkpoint under `root` (resume helper)."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None


def load_error_thresholds(root: str):
    """Per-fault decision thresholds written by scripts/cascade_finetune.py.

    Returns a float32 [NUM_ERRORS] array ordered like config.SWING_ERRORS,
    or None if no calibration file exists (callers fall back to 0.5).
    """
    import json

    from golfaction_tpu import config as cfg_mod

    path = os.path.join(root, "error_thresholds.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    return np.asarray([float(d.get(name, 0.5))
                       for name in cfg_mod.SWING_ERRORS], np.float32)
