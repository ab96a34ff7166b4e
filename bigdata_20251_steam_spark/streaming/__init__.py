from .engine import (
    file_stream,
    run_available_now,
    dual_sink_writer,
    DualSinkPaths,
)
from .stateful import running_totals

__all__ = [
    "file_stream",
    "run_available_now",
    "dual_sink_writer",
    "DualSinkPaths",
    "running_totals",
]
