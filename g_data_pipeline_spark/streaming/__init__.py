from g_data_pipeline_spark.streaming.pipelines import (
    click_to_purchase_stream,
    dedup_events_stream,
    enrich_events_stream,
    run_available_now,
    running_user_totals_stream,
    sessionize_stream,
    sessionized_counts_stream,
    sliding_counts_stream,
    stream_events_from_json,
    tumbling_counts_stream,
)

__all__ = [
    "click_to_purchase_stream",
    "dedup_events_stream",
    "enrich_events_stream",
    "run_available_now",
    "running_user_totals_stream",
    "sessionize_stream",
    "sessionized_counts_stream",
    "sliding_counts_stream",
    "stream_events_from_json",
    "tumbling_counts_stream",
]
