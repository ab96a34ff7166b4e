from .engine import (
    file_stream,
    run_available_now,
    dual_sink_writer,
    DualSinkPaths,
)

__all__ = [
    "file_stream",
    "run_available_now",
    "dual_sink_writer",
    "DualSinkPaths",
]
