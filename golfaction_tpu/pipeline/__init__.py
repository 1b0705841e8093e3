"""Pipeline layer: orchestration, IO, streaming, visualization, reporting."""

from golfaction_tpu.pipeline.orchestrator import Pipeline, analyze
from golfaction_tpu.pipeline.report import build_report, format_report
from golfaction_tpu.pipeline.streaming import StreamAnalyzer, analyze_stream

__all__ = [
    "Pipeline",
    "analyze",
    "StreamAnalyzer",
    "analyze_stream",
    "build_report",
    "format_report",
]
