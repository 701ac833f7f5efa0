"""Property-based checks (hypothesis): the custom join operators agree
with a naive specification on arbitrary small inputs — the cheap way to
sweep the edge-case space (empty sides, ties, all-in-one-key,
boundary-touching intervals) that example tests miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=12
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.floats(0, 10)),
    min_size=0,
    max_size=12,
    unique_by=lambda r: (r[0], r[1]),  # asof contract: unique (key, ts)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows_left, right=rows_right)
def test_asof_join_matches_naive_spec(spark, left, right):
    from us_dot_flights_lakehouse_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, t int, lid int"
    )
    rdf = spark.createDataFrame(right, "k int, t int, rv double")
    got = {
        r.lid: (r.t_matched, r.rv)
        for r in asof_join(ldf, rdf, ["k"], "t", "t", ["rv"]).collect()
    }
    for i, (k, t) in enumerate(left):
        matches = [(rt, rv) for rk, rt, rv in right if rk == k and rt <= t]
        want = max(matches, key=lambda m: m[0]) if matches else (None, None)
        assert got[i] == want, (i, k, t, got[i], want)


intervals = st.lists(
    st.tuples(st.integers(0, 2), st.floats(0, 40), st.floats(0, 40)),
    min_size=0,
    max_size=8,
)
points = st.lists(st.floats(0, 40), min_size=0, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(points=points, intervals=intervals)
def test_bucketed_range_join_matches_naive_spec(spark, points, intervals):
    from us_dot_flights_lakehouse_spark.operators.joins import bucketed_range_join

    pdf = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], "pid int, x double"
    )
    ivdf = spark.createDataFrame(
        [(i, min(lo, hi), max(lo, hi)) for i, (_, lo, hi) in enumerate(intervals)],
        "iv int, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iv)
        for r in bucketed_range_join(pdf, ivdf, "x", "lo", "hi", 7.0).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, x in enumerate(points)
        for ii, (_, lo, hi) in enumerate(intervals)
        if min(lo, hi) <= x < max(lo, hi)
    )
    assert got == want
