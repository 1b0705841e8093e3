"""Promote a staged artifacts tree into the repo's `artifacts/`.

Used at the end of a pose-candidate chain (train -> probe -> cascade ->
calibrate -> demo_e2e on a staging dir, e.g. /tmp/artG): gates on the
staged e2e metrics, then copies checkpoints (compacted to fp16 npz),
thresholds, the pose_meta.json decode-config sidecar, probe records and
demo artifacts into the committed tree.

    python scripts/promote_artifacts.py --staged /tmp/artG \
        --gate chicken_wing=0.7 casting=0.8 overall=0.85

Checkpoints are written as compact npz and the superseded Orbax step dirs
of the same model are REMOVED (restore prefers step dirs over npz, so a
stale step dir would silently shadow the promoted weights —
train/checkpoint.py restore order).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--staged", required=True)
    ap.add_argument("--artifacts", default="artifacts")
    ap.add_argument("--models", nargs="*",
                    default=["pose", "gcn", "error", "align"])
    ap.add_argument("--gate", nargs="*", default=[],
                    help="fault=minF1 pairs checked against the staged "
                         "demo/e2e_metrics.json per-fault table; 'overall' "
                         "checks the pooled error F1")
    ap.add_argument("--force", action="store_true",
                    help="promote even if a gate fails (prints the misses)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from golfaction_tpu.train import checkpoint

    def log(m):
        print(m, file=sys.stderr, flush=True)

    staged, art = args.staged, args.artifacts

    # ---- gate on the staged e2e metrics ----
    metrics_path = os.path.join(staged, "demo", "e2e_metrics.json")
    misses = []
    if args.gate:
        with open(metrics_path) as f:
            m = json.load(f)
        per_fault = m.get("error_detection_per_fault", {})
        for spec in args.gate:
            name, thr = spec.split("=")
            thr = float(thr)
            if name == "overall":
                got = float(m.get("error_detection", {}).get("f1", 0.0))
            else:
                got = float(per_fault.get(name, {}).get("f1", 0.0))
            status = "ok" if got >= thr else "MISS"
            log(f"gate {name}: {got:.3f} >= {thr:.2f} ... {status}")
            if got < thr:
                misses.append((name, got, thr))
        if misses and not args.force:
            log("gate failed; not promoting (use --force to override)")
            sys.exit(1)

    # ---- checkpoints: staged latest -> compact npz; prune stale dirs ----
    for name in args.models:
        src_dir = checkpoint.latest_step_dir(
            os.path.join(staged, "params", name))
        src_npz = os.path.join(staged, "params", f"{name}.npz")
        dst_npz = os.path.join(art, "params", f"{name}.npz")
        if src_dir:
            params = checkpoint.restore_params(src_dir)
            checkpoint.save_params_npz(dst_npz, params)
            log(f"{name}: {src_dir} -> {dst_npz}")
        elif os.path.exists(src_npz):
            shutil.copy2(src_npz, dst_npz)
            log(f"{name}: {src_npz} -> {dst_npz}")
        else:
            log(f"{name}: nothing staged, keeping current")
            continue
        stale = os.path.join(art, "params", name)
        if os.path.isdir(stale):
            shutil.rmtree(stale)
            log(f"{name}: removed superseded step dirs {stale}/")

    # ---- sidecars + records ----
    for fn in ("pose_meta.json", "error_thresholds.json",
               "probe_arm_gain.json", "probe_heatmap_modes.json",
               "probe_heatmap_spread.json"):
        src = os.path.join(staged, fn)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(art, fn))
            log(f"copied {fn}")
    demo_src = os.path.join(staged, "demo")
    if os.path.isdir(demo_src):
        demo_dst = os.path.join(art, "demo")
        os.makedirs(demo_dst, exist_ok=True)
        for fn in os.listdir(demo_src):
            shutil.copy2(os.path.join(demo_src, fn),
                         os.path.join(demo_dst, fn))
        log("copied demo artifacts")

    print(json.dumps({"promoted": args.models,
                      "gate_misses": [list(x) for x in misses]}))


if __name__ == "__main__":
    main()
