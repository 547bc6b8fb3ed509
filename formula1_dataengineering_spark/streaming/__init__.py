from .events import (  # noqa: F401
    read_events_stream,
    run_to_completion,
    sessionized_counts,
    sliding_value_sums,
    stream_dedup,
    tumbling_event_counts,
)
