from .engine import (
    file_stream,
    run_available_now,
    dual_sink_writer,
    await_streams,
    dedup_stream,
    idempotent_epoch_append,
    DualSinkPaths,
)
from .stateful import running_totals

__all__ = [
    "file_stream",
    "run_available_now",
    "dual_sink_writer",
    "await_streams",
    "dedup_stream",
    "idempotent_epoch_append",
    "DualSinkPaths",
    "running_totals",
]
