"""Property-based test: the distributed group stage must match a
pure-Python model of the reference's observable contract
(``master/__main__.py:249-256``) for arbitrary line multisets —
duplicates together, distinct lines round-robin in sorted order,
partitions internally sorted.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from map_reduce_server_spark.mapreduce.job import group_partition

_LINE = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\n\r", min_codepoint=32
    ),
    max_size=12,
)


def reference_model(lines: list[str], num_reducers: int) -> list[list[str]]:
    """Direct restatement of the reference's merge+partition walk."""
    parts: list[list[str]] = [[] for _ in range(num_reducers)]
    rank = -1
    prev = None
    for line in sorted(lines):
        if line != prev:
            rank += 1
            prev = line
        parts[rank % num_reducers].append(line)
    return parts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(_LINE, min_size=1, max_size=40),
    num_reducers=st.integers(min_value=1, max_value=4),
)
def test_group_partition_matches_reference_model(spark, lines, num_reducers):
    rdd = spark.sparkContext.parallelize(lines, numSlices=3)
    grouped = group_partition(rdd, num_reducers)
    got = grouped.glom().collect()
    assert got == reference_model(lines, num_reducers)


_BYTES_LINE = st.binary(max_size=8).filter(lambda b: b"\n" not in b)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(_BYTES_LINE, min_size=1, max_size=30),
    num_reducers=st.integers(min_value=1, max_value=3),
)
def test_group_partition_byte_order(spark, lines, num_reducers):
    """The r9 byte-faithful pipeline: group_partition over raw BYTES
    elements (what the mapper stage now emits) must sort in byte
    order — the reference's whole-line sort — including non-UTF-8
    bytes (0x80-0xFF) that the former strict-decode pipeline crashed
    on. Python sorts bytes lexicographically by byte value, so the
    same reference model applies verbatim."""
    rdd = spark.sparkContext.parallelize(lines, numSlices=2)
    got = group_partition(rdd, num_reducers).glom().collect()
    assert got == reference_model(lines, num_reducers)
