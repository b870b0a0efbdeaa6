from app_insights_generator_spark.streaming.windows import (  # noqa: F401
    clicks_before_errors_stream,
    dedup_within_watermark,
    enrich_stream_static,
    read_events_stream,
    run_to_memory,
    session_sums_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
