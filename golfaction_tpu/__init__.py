"""golfaction_tpu — TPU-native golf-swing analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`TanNguyen2812/COMPUTER-VISION-SYSTEM-FOR-ANALYZING-GOLFER-ACTION`
(reference at /root/reference — documentation-only; SURVEY.md reconstructs
the functional spec this package implements).

Public surface:
    analyze(video)  -> AnalysisResult       (pipeline.orchestrator)
    Pipeline        full orchestrator class
    config.get_config(preset)               five BASELINE presets
"""

from golfaction_tpu import config, graph, types
from golfaction_tpu.config import get_config
from golfaction_tpu.types import AlignmentResult, AnalysisResult, Clip, Skeleton

__version__ = "0.1.0"

__all__ = [
    "analyze",
    "Pipeline",
    "config",
    "graph",
    "types",
    "get_config",
    "Clip",
    "Skeleton",
    "AlignmentResult",
    "AnalysisResult",
]


def __getattr__(name):
    # Lazy imports keep `import golfaction_tpu` light (no model/pipeline build).
    if name in ("analyze", "Pipeline"):
        from golfaction_tpu.pipeline import orchestrator

        return getattr(orchestrator, name)
    if name in ("StreamAnalyzer", "analyze_stream"):
        from golfaction_tpu.pipeline import streaming

        return getattr(streaming, name)
    if name in ("build_report", "format_report"):
        from golfaction_tpu.pipeline import report

        return getattr(report, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
