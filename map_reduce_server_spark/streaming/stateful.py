"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.D); this is the
north-star "custom stateful operator" path: user-defined per-key
state evolved batch by batch, with watermark-driven timeout — the
building block for streaming dedup, running aggregates with custom
merge logic, or online feature extraction at 100 TB/day (state is
partitioned by key across executors; only the key's state, never the
stream, lives in memory).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _update_counts(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into (count, exact-cents total) state.

    Cents (int64) instead of float accumulation: each value rounds
    to cents independently (HALF_UP, matching decimal(30,2)), so the
    integer total is associative and exact — independent of batch
    boundaries, the streaming analog of the engine's decimal-sum
    rule.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    cent = Decimal("0.01")
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # round each VALUE to cents exactly as the engine's
        # decimal(30,2) cast does — shortest decimal repr of the
        # double (JVM BigDecimal.valueOf == Python repr), then
        # HALF_UP (ties away from zero, for negatives too) — and sum
        # integers: a per-batch float sum rounded once would make
        # the total depend on batch boundaries, and the former
        # floor(|v|*100 + 0.5) trick mis-rounds values like 0.145
        # whose *100 falls a ulp below the half boundary. NULL/NaN
        # AND +/-inf values carry no measurable amount: the
        # decimal(30,2) cast yields NULL for all of them and SUM
        # skips the value (n still counts the row — COUNT(*));
        # Decimal('Infinity').quantize would raise instead.
        vals = pdf["value"].dropna()
        vals = vals[np.isfinite(vals)]
        total_cents += sum(
            int(Decimal(repr(float(v))).quantize(cent, ROUND_HALF_UP) * 100)
            for v in vals
        )
    state.update((n, total_cents))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
        }
    )


def running_counts_stream(events_stream: DataFrame) -> DataFrame:
    """Per-event-type running (count, total) with custom state."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Worker-side functions in this module must not require the repo on
# the Python worker's sys.path — ship them by value (see
# functions.register_by_value).
from map_reduce_server_spark.functions import (  # noqa: E402
    register_by_value as _rbv,
)

_rbv(__name__)
del _rbv  # a lingering ref would pickle the functions pkg by reference
