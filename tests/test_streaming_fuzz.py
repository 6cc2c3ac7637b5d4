"""Model-based streaming fuzz: random micro-batch sequences through
the REAL windowed streaming aggregation (update mode, foreachBatch)
must match a pure-Python model of Spark's watermark physics —
watermark advances only BETWEEN micro-batches (wm = max event time
seen - delay), a row whose tumbling window was already finalized
(window end <= wm at batch start) is dropped as late, everything
else accumulates. The hand-written streaming tests pin single
scenarios; this sweeps the scenario space.

Timestamps are generated at :13 seconds past the minute so the
watermark (max_ts - 600 s) can never land EXACTLY on a 300 s window
boundary — the <=-vs-< eviction edge is deliberately excluded (an
engine-version-dependent tie the queries themselves never depend
on), keeping the model exact everywhere else.
"""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.streaming.events import windowed_event_counts

_BASE = dt.datetime(2024, 1, 1, 0, 0, 13)
_BASE_EPOCH = int(_BASE.replace(tzinfo=dt.timezone.utc).timestamp())
_WINDOW_S = 300
_DELAY_S = 600

# one event: (event_type, minute offset 0..90, value in cents)
_EVENT = st.tuples(
    st.sampled_from(["A", "B"]),
    st.integers(0, 90),
    st.integers(0, 500),
)
_BATCHES = st.lists(
    st.lists(_EVENT, min_size=1, max_size=6), min_size=1, max_size=4
)


def _model(batches):
    """Replay the watermark/window physics in plain Python."""
    wm = 0  # epoch seconds; 0 = not yet advanced (batch 1 drops nothing)
    state: dict = {}
    emitted: dict = {}
    for batch in batches:
        touched = set()
        for etype, minute, cents in batch:
            ts = _BASE_EPOCH + minute * 60
            w_start = ts // _WINDOW_S * _WINDOW_S
            if wm and w_start + _WINDOW_S <= wm:
                continue  # late: its window was already finalized
            k = (w_start, etype)
            n, total = state.get(k, (0, 0))
            state[k] = (n + 1, total + cents)
            touched.add(k)
        for k in touched:
            emitted[k] = state[k]
        batch_max = max(_BASE_EPOCH + m * 60 for _, m, _ in batch)
        wm = max(wm, batch_max - _DELAY_S)
    return {
        (dt.datetime.fromtimestamp(w, dt.timezone.utc).replace(tzinfo=None), e): (
            n,
            round(total / 100.0, 2),
        )
        for (w, e), (n, total) in emitted.items()
    }


@settings(
    max_examples=6,
    deadline=None,
    print_blob=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_BATCHES)
# a late row: batch 2's watermark finalizes minute-0's window before
# batch 3 tries to add to it
@example(batches=[[("A", 0, 100)], [("B", 40, 50)], [("A", 1, 25)]])
# same key accumulating across batches inside the watermark
@example(batches=[[("A", 3, 10)], [("A", 4, 20)], [("A", 12, 30)]])
def test_fuzz_windowed_stream_matches_watermark_model(spark, tmp_path, batches):
    import uuid

    src = tmp_path / f"src_{uuid.uuid4().hex[:8]}"
    src.mkdir()
    stream = spark.readStream.schema(
        "event_type string, value double, ts timestamp"
    ).json(str(src))
    agg = windowed_event_counts(stream)

    got: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[(r.w_start, r.event_type)] = (
                r.n_events,
                round(r.total_value, 2),
            )

    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        for i, batch in enumerate(batches):
            (src / f"b{i:03d}.json").write_text(
                "\n".join(
                    json.dumps(
                        {
                            "event_type": e,
                            "value": c / 100.0,
                            "ts": (
                                _BASE + dt.timedelta(minutes=m)
                            ).strftime("%Y-%m-%d %H:%M:%S"),
                        }
                    )
                    for e, m, c in batch
                )
            )
            q.processAllAvailable()
    finally:
        q.stop()

    assert got == _model(batches), f"batches={batches}"
