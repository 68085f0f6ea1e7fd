from .events import (  # noqa: F401
    read_events_stream,
    replay_to_table,
    session_window_agg,
    sessionize,
    windowed_event_counts,
    windowed_user_spend,
)
