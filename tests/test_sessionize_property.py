"""Property-based test: the shared gap sessionizer
(``functions/sessionize.py``) must match a pure-Python replay of its
contract for arbitrary event sets — NULL timestamps dropped
(mirroring Spark's native ``session_window``), strictly-greater gap
splits (an exactly-30:00 gap merges), and (ts, event_id) tie-break —
since three registered twins (q_sessionize, q_session_concurrency,
q_interval_overlap_join) all build on it.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.functions.sessionize import session_spans

_BASE = dt.datetime(2024, 1, 1)
_GAP_S = 1800

# Offsets cluster around multiples of the 30-min gap so exact-boundary
# ties (merge) and one-second-over splits are both routinely generated.
_OFFSET = st.one_of(
    st.integers(min_value=0, max_value=3 * _GAP_S),
    st.builds(
        lambda k, j: k * _GAP_S + j,
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=-1, max_value=1),
    ),
)

_EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),  # user_id
    st.one_of(st.none(), _OFFSET),  # ts offset seconds (None = NULL ts)
)


def replay(events):
    """Pure-Python sessionizer: same contract, no Spark."""
    by_user: dict[int, list[tuple[dt.datetime, int]]] = {}
    for eid, (user, off) in enumerate(events, start=1):
        if off is None:
            continue  # NULL ts dropped
        by_user.setdefault(user, []).append(
            (_BASE + dt.timedelta(seconds=off), eid)
        )
    spans = set()
    for user, evs in by_user.items():
        evs.sort()  # (ts, event_id) tie-break
        sno = 0
        s_start = s_end = None
        prev = None
        for ts, _eid in evs:
            if prev is None or (ts - prev).total_seconds() > _GAP_S:
                if s_start is not None:
                    spans.add((user, sno, s_start, s_end))
                sno += 1
                s_start = ts
            s_end = ts
            prev = ts
        if s_start is not None:
            spans.add((user, sno, s_start, s_end))
    return spans


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(_EVENT, min_size=1, max_size=30))
def test_session_spans_match_python_replay(spark, events):
    rows = [
        (
            eid,
            None
            if off is None
            else _BASE + dt.timedelta(seconds=off),
            user,
        )
        for eid, (user, off) in enumerate(events, start=1)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    )
    got = {
        (r.user_id, r.session_no, r.s_start, r.s_end)
        for r in session_spans(df).collect()
    }
    assert got == replay(events)
