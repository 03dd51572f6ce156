from dataweb_spark.streaming.events import (
    EVENT_SCHEMA,
    hourly_rollup,
    read_event_stream,
    run_available_now,
    session_rollup,
    sliding_rollup,
    stateful_user_totals,
)

__all__ = ["EVENT_SCHEMA", "read_event_stream", "hourly_rollup",
           "sliding_rollup", "session_rollup", "stateful_user_totals",
           "run_available_now"]
