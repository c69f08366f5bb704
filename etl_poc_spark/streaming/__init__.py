from etl_poc_spark.streaming.windows import (  # noqa: F401
    hourly_event_counts_stream,
    read_events_stream,
    session_window_stream,
    sliding_value_avg_stream,
)
