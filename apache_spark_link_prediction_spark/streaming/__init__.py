from .events import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    streaming_session_agg,
    streaming_window_agg,
)
