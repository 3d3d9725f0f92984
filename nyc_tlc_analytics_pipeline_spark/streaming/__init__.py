from .events import (
    hourly_type_counts_stream,
    read_event_stream,
    session_windows_stream,
    sliding_value_stream,
)

__all__ = [
    "hourly_type_counts_stream",
    "read_event_stream",
    "session_windows_stream",
    "sliding_value_stream",
]
