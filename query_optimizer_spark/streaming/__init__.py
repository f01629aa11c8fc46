"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.6); this module adds
the Spark-native one a production pipeline needs: file-source readStream,
watermarked tumbling-window aggregation, and custom stateful
sessionization via ``applyInPandasWithState``.

Everything runs with ``trigger(availableNow=True)`` against the testdata
parquet so results are finite and deterministic; on a real cluster the
same code tails a directory/Kafka source continuously.
"""

from .ops import (
    asof_stream,
    asof_stream_oracle,
    cdc_tail_stream,
    cdc_tail_stream_oracle,
    incremental_dedup_stream,
    incremental_dedup_stream_oracle,
    kmv_distinct_stream,
    kmv_distinct_stream_oracle,
    window_funnel_stream,
    window_funnel_stream_oracle,
    dedup_stream,
    feedback_broadcast_join,
    feedback_broadcast_join_oracle,
    join_stream,
    join_stream_oracle,
    dedup_stream_oracle,
    enrich_stream,
    enrich_stream_oracle,
    sliding_counts_stream,
    sliding_counts_stream_oracle,
    hll_users_stream,
    hll_users_stream_oracle,
    quantile_sketch_stream,
    quantile_sketch_stream_oracle,
    hourly_counts_stream,
    hourly_counts_stream_oracle,
    sessionize_stream,
    sessionize_stream_oracle,
    sink_parquet_stream,
    sink_parquet_stream_oracle,
    stream_events,
)

__all__ = [
    "stream_events",
    "asof_stream",
    "asof_stream_oracle",
    "incremental_dedup_stream",
    "incremental_dedup_stream_oracle",
    "kmv_distinct_stream",
    "window_funnel_stream",
    "window_funnel_stream_oracle",
    "kmv_distinct_stream_oracle",
    "feedback_broadcast_join",
    "feedback_broadcast_join_oracle",
    "join_stream",
    "join_stream_oracle",
    "hourly_counts_stream",
    "hourly_counts_stream_oracle",
    "sessionize_stream",
    "sessionize_stream_oracle",
    "dedup_stream",
    "dedup_stream_oracle",
    "enrich_stream",
    "enrich_stream_oracle",
    "sliding_counts_stream",
    "sliding_counts_stream_oracle",
    "sink_parquet_stream",
    "sink_parquet_stream_oracle",
    "hll_users_stream",
    "hll_users_stream_oracle",
    "quantile_sketch_stream",
    "quantile_sketch_stream_oracle",
]
