"""Import a published PyTorch pose checkpoint into the artifacts tree.

SURVEY.md §5 (checkpoint/resume): the reference implies trained weights
but ships none; when an MMPose/SimpleBaseline-style .pth surfaces, this
imports its conv/deconv kernels into PoseNet in forward order
(train/import_weights.import_torch_pose) and saves an Orbax checkpoint
the pipeline can load.  BatchNorm statistics do not transfer into this
GroupNorm model — follow with a short fine-tune
(scripts/train_eval.py --skip gcn align error --pose-steps 500).

    python scripts/import_pose.py weights.pth --out artifacts
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth", help="torch checkpoint (.pth / .pt)")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--pose-in-frames", type=int, default=1)
    ap.add_argument("--state-dict-key", default=None,
                    help="key holding the state_dict inside the checkpoint "
                         "(auto-tries 'state_dict' / 'model')")
    ap.add_argument("--lenient", action="store_true",
                    help="allow unmatched kernels (partial import)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from golfaction_tpu import config as cfg_mod
    from golfaction_tpu.models import pose as pose_mod
    from golfaction_tpu.train import checkpoint, import_weights

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if args.state_dict_key:
        sd = sd[args.state_dict_key]
    else:
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break

    cfg = cfg_mod.PoseConfig(in_frames=args.pose_in_frames)
    model = pose_mod.create_pose_model(cfg)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, *cfg.input_hw, 3 * cfg.in_frames)))
    params, report = import_weights.import_torch_pose(
        params, sd, cfg, strict=not args.lenient)

    ck = checkpoint.save_params(f"{args.out}/params/pose", params, step=0)
    report_path = os.path.join(args.out, "pose_import_report.json")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"checkpoint": ck, "coverage": report["coverage"],
                      "imported": len(report["imported"]),
                      "report": report_path}))


if __name__ == "__main__":
    main()
