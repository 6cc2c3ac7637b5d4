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


# --- session-window model fuzz (append mode) ---------------------------------
# Same harness, different physics: session windows MERGE (the one
# streaming aggregation whose keys change identity), Spark restricts
# them to APPEND mode, and a session emits exactly once when the
# watermark passes its end. The model replays that lifecycle in
# plain Python: per-user open-session intervals, merge on overlap,
# drop a row iff its own initial window is already finalized
# (ts + gap <= wm at batch start), finalize (emit + remove) every
# session whose end <= wm after the batch's watermark update.
# GAP is 570 s (not a multiple of the 60 s event grid) so session
# ends sit at :43 while the watermark stays on the :13 grid — the
# <=-vs-< eviction/late ties are structurally unreachable, exactly
# like the tumbling fuzz's :13 anchoring. A late-but-not-dropped row
# CAN legitimately open a session overlapping an already-emitted one
# (state is gone); both the engine and the model produce the
# overlap, which is why emissions are compared as a multiset.

_GAP_S = 570


def _session_model(batches):
    wm = 0
    open_sessions: dict = {}  # user -> list of [min_ts, max_ts, n, cents]
    emitted: list = []
    for batch in batches:
        for user, minute, cents in batch:
            ts = _BASE_EPOCH + minute * 60
            if wm and ts + _GAP_S <= wm:
                continue  # late: its own initial window is finalized
            cur = [ts, ts, 1, cents]
            merged = []
            for s in open_sessions.get(user, []):
                # intervals [min_ts, max_ts + GAP) — touching at the
                # exclusive end merges (pinned by q_session_window)
                if cur[0] <= s[1] + _GAP_S and s[0] <= cur[1] + _GAP_S:
                    cur = [
                        min(cur[0], s[0]),
                        max(cur[1], s[1]),
                        cur[2] + s[2],
                        cur[3] + s[3],
                    ]
                else:
                    merged.append(s)
            merged.append(cur)
            open_sessions[user] = merged
        batch_max = max(_BASE_EPOCH + m * 60 for _, m, _ in batch)
        wm = max(wm, batch_max - _DELAY_S)
        for user, sess in list(open_sessions.items()):
            keep = []
            for s in sess:
                if s[1] + _GAP_S <= wm:
                    emitted.append(
                        (
                            user,
                            dt.datetime.fromtimestamp(
                                s[0], dt.timezone.utc
                            ).replace(tzinfo=None),
                            dt.datetime.fromtimestamp(
                                s[1] + _GAP_S, dt.timezone.utc
                            ).replace(tzinfo=None),
                            s[2],
                            round(s[3] / 100.0, 2),
                        )
                    )
                else:
                    keep.append(s)
            open_sessions[user] = keep
    return sorted(emitted)


_SESSION_EVENT = st.tuples(
    st.sampled_from(["u1", "u2"]),
    st.integers(0, 90),
    st.integers(0, 500),
)
_SESSION_BATCHES = st.lists(
    st.lists(_SESSION_EVENT, min_size=1, max_size=6), min_size=1, max_size=4
)


@settings(
    max_examples=6,
    deadline=None,
    print_blob=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_SESSION_BATCHES)
# growth across batches, then a distant event finalizes the session
@example(batches=[[("u1", 0, 100)], [("u1", 8, 50)], [("u1", 60, 25)]])
# two users, one quiet: only the active user's sessions finalize
@example(batches=[[("u1", 0, 10), ("u2", 1, 20)], [("u1", 80, 30)]])
# late-but-not-dropped row re-opens ground an emitted session covered
@example(
    batches=[[("u1", 0, 10)], [("u1", 40, 20)], [("u1", 31, 30)]]
)
def test_fuzz_session_stream_matches_watermark_model(spark, tmp_path, batches):
    import uuid

    from pyspark.sql import functions as F

    src = tmp_path / f"sess_{uuid.uuid4().hex[:8]}"
    src.mkdir()
    stream = spark.readStream.schema(
        "user_id string, value double, ts timestamp"
    ).json(str(src))
    agg = (
        stream.withWatermark("ts", f"{_DELAY_S} seconds")
        .groupBy(F.session_window("ts", f"{_GAP_S} seconds"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n_events",
            "total_value",
        )
    )

    got: list = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got.append(
                (
                    r.user_id,
                    r.s_start,
                    r.s_end,
                    r.n_events,
                    round(r.total_value, 2),
                )
            )

    q = agg.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        for i, batch in enumerate(batches):
            (src / f"b{i:03d}.json").write_text(
                "\n".join(
                    json.dumps(
                        {
                            "user_id": u,
                            "value": c / 100.0,
                            "ts": (
                                _BASE + dt.timedelta(minutes=m)
                            ).strftime("%Y-%m-%d %H:%M:%S"),
                        }
                    )
                    for u, m, c in batch
                )
            )
            q.processAllAvailable()
    finally:
        q.stop()

    assert sorted(got) == _session_model(batches), f"batches={batches}"
