"""The r2 round lost its entire perf signal because bench.py had no
per-query fault isolation — one NameError killed the run. These tests pin
the harness contract itself."""

import json
import subprocess
import sys


def test_bench_isolates_query_failures(tmp_path, monkeypatch):
    """A registry with one broken query must still produce a parseable
    JSON line, an ERR marker, and timings for the healthy queries."""
    import bench
    from pyspark.sql import functions as F

    def fake_queries():
        return {
            "ok_one": lambda spark, sf: spark.range(10).select(F.col("id")),
            "broken": lambda spark, sf: (_ for _ in ()).throw(
                NameError("name 'n' is not defined")
            ),
            "ok_two": lambda spark, sf: spark.range(5).select((F.col("id") * 2).alias("x")),
        }

    monkeypatch.setattr(bench.registry, "queries", fake_queries)
    monkeypatch.setenv("BENCH_REPS", "1")
    # keep the file mirror out of the repo root — a real bench_out.json from a
    # driver run must not be clobbered with these fake-query timings
    monkeypatch.setenv("BENCH_OUT", str(tmp_path / "bench_out.json"))
    printed = []
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    stopped = {}
    import us_dot_flights_lakehouse_spark.session as sess

    real_get = sess.get_spark

    def keep_alive(*a, **k):
        spark = real_get(*a, **k)
        stopped["spark"] = spark
        spark.stop = lambda: None  # session is shared with other tests
        return spark

    monkeypatch.setattr(bench, "get_spark", keep_alive)
    bench.main()
    # stdout contract (VERDICT r4 item 3): every line is parseable JSON;
    # the LAST line is a compact clip-proof summary, the one before it the
    # full result dict, preceded by one terse {"q","s"} line per query.
    lines = [json.loads(s) for s in printed]
    compact = lines[-1]
    assert compact["metric"] == "sum_median_sec_all_queries"
    assert compact["value"] > 0
    assert compact["n_queries"] == 3
    assert compact["n_err"] == 1
    assert len(json.dumps(compact)) < 400
    out = lines[-2]
    assert out["queries"]["broken"] == "ERR"
    assert "NameError" in out["errors"]["broken"]
    assert isinstance(out["queries"]["ok_one"], float)
    assert isinstance(out["queries"]["ok_two"], float)
    assert out["value"] > 0
    perq = {d["q"]: d["s"] for d in lines[:-2] if "q" in d}
    assert perq == out["queries"]
