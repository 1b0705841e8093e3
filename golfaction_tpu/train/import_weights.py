"""Import externally-trained (PyTorch) weights into the flax models.

SURVEY.md §5 (checkpoint/resume): the reference implies trained weights but
ships none; if its MMPose/PyTorch-style checkpoints ever surface, this
module maps them into our parameter pytrees.

Scope: convolution and dense kernels/biases transfer exactly (layout
transposed OIHW -> HWIO / OI -> IO); normalization layers do NOT transfer
when the source used BatchNorm (this build uses GroupNorm — different
statistics model), so imports are reported per-tensor and the caller
decides whether a partial import is acceptable (typically followed by a
short fine-tune).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _convert_kernel(src: np.ndarray, dst_shape: tuple[int, ...]) -> np.ndarray | None:
    """Convert a torch kernel to the flax layout of dst_shape, or None."""
    if src.ndim == 4:  # Conv OIHW -> HWIO
        cand = np.transpose(src, (2, 3, 1, 0))
        if cand.shape == dst_shape:
            return cand
        # ConvTranspose: torch stores IOHW; flax HWIO with flipped spatial.
        cand = np.transpose(src, (2, 3, 0, 1))[::-1, ::-1]
        if cand.shape == dst_shape:
            return cand
    elif src.ndim == 2:  # Linear OI -> IO
        cand = src.T
        if cand.shape == dst_shape:
            return cand
    elif src.ndim == 1 and src.shape == dst_shape:
        return src
    if src.shape == dst_shape:
        return src
    return None


def import_torch_state_dict(
    params: Any,
    state_dict: Mapping[str, Any],
    strict: bool = False,
) -> tuple[Any, dict]:
    """Greedy order+shape-matched import of a torch state_dict into `params`.

    Walks both parameter sequences in definition order; each flax leaf takes
    the first remaining source tensor that converts to its shape.  Returns
    (new_params, report) where report lists imported / skipped tensors.
    `strict=True` raises if any flax conv/dense kernel found no source.
    """
    leaves, treedef = jax.tree.flatten_with_path(params)
    sources = [(k, _to_numpy(v)) for k, v in state_dict.items()
               if not k.endswith("num_batches_tracked")]
    used = [False] * len(sources)
    imported, skipped = [], []
    new_leaves = []
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        shape = tuple(np.shape(leaf))
        found = None
        for i, (sk, sv) in enumerate(sources):
            if used[i]:
                continue
            conv = _convert_kernel(sv, shape)
            if conv is not None:
                found = (i, sk, conv)
                break
        if found is not None:
            i, sk, conv = found
            used[i] = True
            imported.append({"flax": name, "torch": sk, "shape": list(shape)})
            new_leaves.append(conv.astype(np.asarray(leaf).dtype))
        else:
            skipped.append({"flax": name, "shape": list(shape)})
            new_leaves.append(leaf)
    report = {
        "imported": imported,
        "skipped_flax": skipped,
        "unused_torch": [sk for (sk, _), u in zip(sources, used) if not u],
        "coverage": len(imported) / max(len(leaves), 1),
    }
    if strict and any("kernel" in s["flax"] for s in skipped):
        missing = [s["flax"] for s in skipped if "kernel" in s["flax"]]
        raise ValueError(f"strict import failed; unmatched kernels: {missing}")
    return jax.tree.unflatten(treedef, new_leaves), report


# ---------------------------------------------------------------------------
# Order-preserving pose import
# ---------------------------------------------------------------------------
#
# The greedy matcher above cannot disambiguate same-shaped tensors (every
# GroupNorm scale/bias at one width looks alike), and jax.tree flattening
# sorts module names lexically, NOT in forward order — so for a deep model
# a greedy import silently cross-maps normalization parameters between
# layers.  For the pose net we know the exact forward order from the
# config, and a torch state_dict is an ordered mapping in definition
# order, so position-by-position matching is exact.

def pose_param_order(cfg) -> list[tuple[str, ...]]:
    """Flax param paths of models.pose.PoseNet in FORWARD (definition)
    order, derived from the config.  Mirrors PoseNet.__call__ exactly
    (models/pose.py) — update both together."""
    order: list[tuple[str, ...]] = []

    def gn(mod):
        order.append((mod, "scale"))
        order.append((mod, "bias"))

    # Stem.
    order.append(("Conv_0", "kernel"))
    gn("GroupNorm_0")

    # Stages of ResBlocks.
    in_ch = 64
    rb = 0
    for i, (blocks, ch) in enumerate(zip(cfg.stage_blocks, cfg.stage_channels)):
        for b in range(blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            base = f"ResBlock_{rb}"
            order.append((base, "Conv_0", "kernel"))
            order.append((base, "GroupNorm_0", "scale"))
            order.append((base, "GroupNorm_0", "bias"))
            order.append((base, "Conv_1", "kernel"))
            order.append((base, "GroupNorm_1", "scale"))
            order.append((base, "GroupNorm_1", "bias"))
            if in_ch != ch or stride != 1:   # projection shortcut
                order.append((base, "Conv_2", "kernel"))
                order.append((base, "GroupNorm_2", "scale"))
                order.append((base, "GroupNorm_2", "bias"))
            in_ch = ch
            rb += 1

    # Deconv head (+ the stride-matching extras PoseNet appends).
    backbone_stride = 4 * 2 ** (len(cfg.stage_blocks) - 1)
    cur_stride = backbone_stride // (2 ** len(cfg.deconv_channels))
    target_stride = cfg.input_hw[0] // cfg.heatmap_hw[0]
    n_deconv = len(cfg.deconv_channels)
    while cur_stride > target_stride:
        n_deconv += 1
        cur_stride //= 2
    for j in range(n_deconv):
        order.append((f"ConvTranspose_{j}", "kernel"))
        gn(f"GroupNorm_{1 + j}")

    # Final 1x1 conv (has a bias).
    order.append(("Conv_1", "kernel"))
    order.append(("Conv_1", "bias"))
    return order


def import_torch_pose(params, state_dict, cfg, strict: bool = True):
    """Order-preserving import of a torch pose checkpoint into PoseNet
    params.

    Walks the flax leaves in FORWARD order (pose_param_order) and the
    torch state_dict in its own (definition) order with two pointers; each
    flax leaf takes the next torch tensor that converts to its shape.
    Non-convertible torch tensors (e.g. BatchNorm running statistics when
    importing a BN checkpoint into this GN model) are skipped and
    reported.  `params` is the PoseNet init tree {'params': {...}}.
    """
    inner = params["params"] if "params" in params else params
    order = pose_param_order(cfg)
    sources = [(k, _to_numpy(v)) for k, v in state_dict.items()
               if not k.endswith("num_batches_tracked")
               and "running_mean" not in k and "running_var" not in k]
    si = 0
    imported, skipped = [], []
    new_inner = jax.tree.map(lambda x: x, inner)   # shallow-ish copy
    for path in order:
        node = new_inner
        for p in path[:-1]:
            node = node[p]
        leaf = node[path[-1]]
        shape = tuple(np.shape(leaf))
        conv = None
        while si < len(sources):
            sk, sv = sources[si]
            conv = _convert_kernel(sv, shape)
            if conv is not None:
                break
            skipped.append({"torch": sk, "reason": "no conversion",
                            "shape": list(np.shape(sv))})
            si += 1
        if conv is None:
            if strict:
                raise ValueError(
                    f"ordered import exhausted sources at flax {path}")
            continue
        node[path[-1]] = conv.astype(np.asarray(leaf).dtype)
        imported.append({"flax": "/".join(path), "torch": sources[si][0],
                         "shape": list(shape)})
        si += 1
    report = {
        "imported": imported,
        "skipped_torch": skipped
        + [{"torch": k, "reason": "unused"} for k, _ in sources[si:]],
        "coverage": len(imported) / max(len(order), 1),
    }
    out = dict(params)
    if "params" in params:
        out["params"] = new_inner
        return out, report
    return new_inner, report
