"""Structured Streaming: the streaming plan must equal the batch plan
on bounded input (the core Structured Streaming guarantee)."""

from __future__ import annotations

from map_reduce_server_spark.streaming.events import (
    stream_window_counts,
    windowed_event_counts,
)
from map_reduce_server_spark.tables import load_table


def test_stream_equals_batch(spark, sf_small):
    streamed = {
        (r.w_start, r.event_type, r.n_events, r.total_value)
        for r in stream_window_counts(spark, sf_small).collect()
    }
    batch = {
        (r.w_start, r.event_type, r.n_events, r.total_value)
        for r in windowed_event_counts(
            load_table(spark, sf_small, "events")
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0
