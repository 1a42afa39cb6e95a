from .upsert import scd2_streaming_sink
from .windows import (
    session_window_stream,
    sliding_window_stream,
    tumbling_window_stream,
)

__all__ = [
    "scd2_streaming_sink",
    "session_window_stream",
    "sliding_window_stream",
    "tumbling_window_stream",
]
