from .engine import (
    file_stream,
    run_available_now,
    dual_sink_writer,
    await_streams,
    DualSinkPaths,
)
from .stateful import running_totals

__all__ = [
    "file_stream",
    "run_available_now",
    "dual_sink_writer",
    "await_streams",
    "DualSinkPaths",
    "running_totals",
]
