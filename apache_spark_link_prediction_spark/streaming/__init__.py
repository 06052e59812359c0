from .events import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    streaming_dedup,
    streaming_session_agg,
    streaming_user_ema,
    streaming_window_agg,
)
