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
