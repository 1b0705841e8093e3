"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

Per-stage wall-time tracking with `jax.profiler` trace annotations, plus a
simple scoped timer that fences async dispatch with `block_until_ready` so
numbers mean what they say.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Optional

import jax


class StageTimer:
    """Accumulates per-stage wall times; emits a breakdown dict/JSONL."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence: Any = None):
        """Time a stage; annotates the profiler trace with the stage name.

        `fence`: optional pytree of device values to block on before closing
        the timer (otherwise async dispatch makes stages look free).
        """
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def breakdown(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_ms": 1e3 * v / self.counts[k]}
            for k, v in self.totals.items()
        }

    def report(self) -> str:
        return json.dumps(self.breakdown(), indent=2, sort_keys=True)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a full jax.profiler device trace (viewable in TensorBoard /
    Perfetto) around a code region.  No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def value_fence(out) -> float:
    """Force device completion by materializing a scalar on the host.

    Stronger than `jax.block_until_ready`: on remote/tunneled runtimes the
    latter can return before execution finishes (bench.py documents the
    observed symptom), while fetching bytes cannot be faked.
    """
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed_blocked(fn, *args, warmup: int = 1, iters: int = 5, **kw):
    """Mean wall time of fn(*args) with completion-forcing fencing."""
    for _ in range(warmup):
        value_fence(fn(*args, **kw))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, **kw)
    value_fence(out)
    return (time.perf_counter() - t0) / iters


def enable_compile_cache(path: str = "/tmp/golfaction_jax_cache",
                         min_compile_secs: float = 1.0) -> None:
    """Persistent XLA compile cache shared by scripts/tests/bench.

    Tunnel compiles of the pipeline programs run minutes each on this
    class of dev host; every entry point that jits them should call this
    before first compilation so reruns (and the driver's bench) hit the
    same cache the test suite warms.
    """
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
