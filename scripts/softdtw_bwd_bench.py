"""Compile + step time of batched soft-DTW *gradients*: Pallas vs vmapped scan.

VERDICT r2 #4: the round-2 forward Pallas wavefront exists because the
vmapped `lax.scan` wavefront compiles pathologically slowly at batch on
TPU — and training's backward pass (the E-recursion) had the same
pathology latent.  This script measures both paths at the alignment
trainer's design point (B pairs of T-frame embedding sequences,
divergence loss needs 3B cost evaluations) and proves the Pallas
forward+backward pair removed it:

    python scripts/softdtw_bwd_bench.py --B 64 --T 128 --scan-timeout 600

Emits one JSON line with compile and steady-state step times.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(path: str, B: int, T: int, Dim: int, gamma: float, iters: int,
             q=None):
    """Compile + run grad steps for one path; returns (compile_s, step_s).

    Runs in a spawned child process: the axon tunnel allows one TPU client
    at a time, so the parent stays jax-free and the two paths get the
    device sequentially (memory: axon-tpu-env-gotchas).
    """
    import jax

    from golfaction_tpu.utils import profiling
    profiling.enable_compile_cache()
    import jax.numpy as jnp

    from golfaction_tpu.ops import softdtw as sdtw
    from golfaction_tpu.ops.pallas import softdtw_kernel as sk

    rng = np.random.default_rng(0)
    ea = jnp.asarray(rng.normal(size=(B, T, Dim)), jnp.float32)
    eb = jnp.asarray(rng.normal(size=(B, T, Dim)), jnp.float32)

    if path == "pallas":
        def loss(ea, eb):
            Dab = jax.vmap(sdtw.pairwise_sqdist)(ea, eb)
            return sk.softdtw_cost_pallas(Dab, gamma).sum()
    else:
        def loss(ea, eb):
            Dab = jax.vmap(sdtw.pairwise_sqdist)(ea, eb)
            return jax.vmap(lambda d: sdtw.softdtw_cost(d, gamma))(Dab).sum()

    grad = jax.jit(jax.grad(loss))
    t0 = time.time()
    g = grad(ea, eb)
    # Value fetch: block_until_ready is not a completion fence over the
    # axon tunnel (memory: axon-tpu-env-gotchas).
    float(jnp.sum(jnp.abs(g)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        g = grad(ea, eb)
    float(jnp.sum(jnp.abs(g)))
    step_s = (time.time() - t0) / iters
    if q is not None:
        q.put((compile_s, step_s))
    return compile_s, step_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--T", type=int, default=128)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--gamma", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--scan-timeout", type=float, default=600.0,
                    help="kill the vmapped-scan compile after this many "
                         "seconds and report it as a lower bound")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    out = {"B": args.B, "T": args.T, "dim": args.dim}

    # Each path runs in its own spawned child under a hard timeout: XLA
    # compilation can't be interrupted in-process, and the axon tunnel
    # allows one TPU client at a time, so the parent must stay jax-free.
    ctx = mp.get_context("spawn")
    for path, timeout in (("pallas", args.scan_timeout),
                          ("scan", args.scan_timeout)):
        q: mp.Queue = ctx.Queue()
        p = ctx.Process(target=_measure, args=(path, args.B, args.T, args.dim,
                                               args.gamma, args.iters, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            out[path] = {"compile_s": f">{timeout:.0f} (killed)",
                         "step_s": None}
            print(f"{path}: killed after {time.time() - t0:.0f}s "
                  f"(still compiling)", file=sys.stderr, flush=True)
        else:
            c, s = q.get()
            out[path] = {"compile_s": round(c, 2), "step_s": round(s, 4)}
            print(f"{path}: compile {c:.1f}s  step {s * 1e3:.2f}ms",
                  file=sys.stderr, flush=True)

    line = json.dumps(out)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
