"""Round-14 optimization equality tests.

Every optimization that adds a bounded driver-side fast path must prove
bit-equality with the plan-side shape it replaces (the r13 posture:
curation CC, g4 LPA, quantiles)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles
from us_dot_flights_lakehouse_spark.queries.sim_q import _kcenter_driver


def _kcenter_distributed(spark, rows, k):
    """Verbatim replica of sim_kcenter_diversity's over-cap k-scan loop
    (the plan-side shape the driver path must match bit-for-bit)."""
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>").cache()

    def sqdist_to(center):
        return F.aggregate(
            F.zip_with(
                F.col("v"), lit_doubles(center), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    seed_row = corpus.orderBy("vec_id").limit(1).collect()[0]
    selected = [(0, int(seed_row["vec_id"]), 0.0)]
    centers = [list(seed_row["v"])]
    mind = F.lit(float("inf"))
    for r in range(1, k):
        mind = F.least(mind, sqdist_to(centers[-1]))
        cand = corpus.filter(
            ~F.col("vec_id").isin([s[1] for s in selected])
        ).select("vec_id", "v", mind.alias("d"))
        top = cand.orderBy(F.desc("d"), F.asc("vec_id")).limit(1).collect()[0]
        selected.append((r, int(top["vec_id"]), float(top["d"])))
        centers.append(list(top["v"]))
    corpus.unpersist()
    return selected


def test_kcenter_driver_equals_distributed(spark):
    """Random corpora with deliberately tie-heavy integer coordinates
    (equal max distances force the vec_id tie-break) and irrational
    float coordinates (exercise the exact fold order)."""
    rng = np.random.default_rng(14)
    for trial in range(4):
        n = int(rng.integers(8, 26))
        dim = int(rng.integers(2, 9))
        k = int(rng.integers(3, min(8, n) + 1))
        if trial % 2 == 0:
            V = rng.integers(-2, 3, size=(n, dim)).astype("float64")
        else:
            V = rng.standard_normal((n, dim)) * 10
        ids = rng.permutation(1000)[:n].astype("int64")
        tbl = pa.table(
            {"vec_id": pa.array(ids), "v": pa.array(list(V))}
        )
        got = _kcenter_driver(tbl, k)
        assert got is not None
        rows = [(int(i), [float(x) for x in row]) for i, row in zip(ids, V)]
        want = _kcenter_distributed(spark, rows, k)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_kcenter_driver_fallback_preconditions():
    """NaN values, ragged vectors, NULL cells and duplicate ids must all
    return None (→ the query keeps its plan-side shape)."""
    good_v = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    base_ids = pa.array([1, 2, 3], type=pa.int64())
    nan_v = [[1.0, float("nan")], [3.0, 4.0], [5.0, 6.0]]
    assert _kcenter_driver(pa.table({"vec_id": base_ids, "v": nan_v}), 2) is None
    ragged = [[1.0], [3.0, 4.0], [5.0, 6.0]]
    assert _kcenter_driver(pa.table({"vec_id": base_ids, "v": ragged}), 2) is None
    withnull = pa.table(
        {"vec_id": base_ids, "v": pa.array([None, [3.0, 4.0], [5.0, 6.0]],
                                           type=pa.list_(pa.float64()))}
    )
    assert _kcenter_driver(withnull, 2) is None
    dup = pa.table(
        {"vec_id": pa.array([1, 1, 3], type=pa.int64()), "v": good_v}
    )
    assert _kcenter_driver(dup, 2) is None
    # fewer rows than k: the replica refuses rather than diverging from
    # the plan-side crash
    small = pa.table({"vec_id": base_ids, "v": good_v})
    assert _kcenter_driver(small, 5) is None


def test_histogram_input_pregate_skips_collection(spark, monkeypatch):
    """ADVICE r13: over the estimated-input-bytes gate the histogram path
    must bail WITHOUT running the aggregate (no wasted 100 TB pass)."""
    from us_dot_flights_lakehouse_spark.operators import quantiles as q

    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    assert q.collect_value_histogram(df, ["g"], ["v"]) is not None
    monkeypatch.setattr(q, "DRIVER_HIST_MAX_INPUT_BYTES", 0)
    calls = []
    monkeypatch.setattr(
        df.__class__, "groupBy",
        lambda self, *a, **k: calls.append(1) or pytest.fail(
            "aggregate built despite the pre-gate"
        ),
    )
    assert q.collect_value_histogram(df, ["g"], ["v"]) is None
    assert not calls
