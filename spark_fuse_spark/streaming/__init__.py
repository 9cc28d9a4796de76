"""Structured Streaming operators over the ``events`` stream.

The reference has no streaming surface (SURVEY.md §2.9 — verified: no
``readStream``/``writeStream`` anywhere under ``/root/reference/src``);
this module is the net-new coverage SURVEY.md §7 milestone 6 calls for,
built entirely on Spark's native streaming engine:

* watermarked tumbling/sliding window aggregates (``F.window``),
* session windows (``F.session_window``),
* late-data dedup (``dropDuplicatesWithinWatermark``),
* ``foreachBatch`` sink into the SCD change-tracking protocols,
* custom stateful operators (``applyInPandasWithState``): gap-based
  sessionization and an ordered conversion-funnel tracker, both with
  event-time timeouts and O(1) state per active key.

Every transformation takes/returns DataFrames and works identically on a
batch frame (for differential testing — the ``e_*`` catalog queries are
the batch twins) and a streaming frame.
"""

from spark_fuse_spark.streaming.ops import (
    flag_stream_anomalies,
    EVENT_SCHEMA,
    dedup_within_watermark,
    ewma_with_state,
    funnel_with_state,
    interval_join_stream,
    read_event_stream,
    running_totals_with_state,
    session_event_rollup,
    sessionize_with_state,
    sliding_event_counts,
    changelog_batch_applier,
    join_view_batch_applier,
    neardup_batch_applier,
    stream_changelog_publisher,
    stream_neardup_filter,
    stream_join_view,
    stream_to_scd,
    tumbling_event_counts,
    windowed_distinct_estimate,
    windowed_heavy_hitter_cms,
)

__all__ = [
    "flag_stream_anomalies",
    "EVENT_SCHEMA",
    "read_event_stream",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_rollup",
    "dedup_within_watermark",
    "changelog_batch_applier",
    "join_view_batch_applier",
    "neardup_batch_applier",
    "stream_changelog_publisher",
    "stream_neardup_filter",
    "stream_join_view",
    "stream_to_scd",
    "sessionize_with_state",
    "ewma_with_state",
    "funnel_with_state",
    "interval_join_stream",
    "running_totals_with_state",
    "windowed_distinct_estimate",
    "windowed_heavy_hitter_cms",
]
