from .events import (  # noqa: F401
    read_events_stream,
    windowed_event_counts,
    windowed_user_spend,
    sessionize,
)
