"""Quality-gate semantics: pass/fail behavior and the fail-closed vs
warn-only modes mirroring the reference's silver vs bronze gates."""

from __future__ import annotations

import pytest

from us_dot_flights_lakehouse_spark.quality.checks import (
    QualityGateError,
    QualitySuite,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "AA", 100.0),
            (2, "BB", 200.0),
            (3, None, 250.0),
            (3, "CC", 5000.0),  # dup id + out-of-range value
        ],
        "id long, code string, amount double",
    )


def test_suite_runs_single_pass_and_flags_failures(frame):
    suite = (
        QualitySuite("t")
        .expect_row_count_at_least(10)  # fails: 4 rows
        .expect_column_exists("code")
        .expect_column_exists("missing_col")  # fails
        .expect_null_rate_at_most("code", 0.30)  # passes: 1/4 = 0.25
        .expect_unique("id")  # fails: dup 3
        .expect_values_between("amount", 0, 1000, mostly=0.5)  # passes: 3/4
        .expect_values_in_set("code", ("AA", "BB", "CC"))
        .expect_length_between("code", 2, 2)
    )
    by_key = {(r.check, r.column): r for r in suite.run(frame)}
    assert not by_key[("row_count_at_least", "*")].passed
    assert by_key[("column_exists", "code")].passed
    assert not by_key[("column_exists", "missing_col")].passed
    assert by_key[("null_rate_at_most", "code")].passed
    assert by_key[("null_rate_at_most", "code")].observed == 0.25
    assert not by_key[("unique", "id")].passed
    assert by_key[("values_between", "amount")].passed
    assert by_key[("values_in_set", "code")].passed  # nulls don't fail set checks
    assert by_key[("length_between", "code")].passed


def test_row_count_between_and_column_type(frame):
    suite = (
        QualitySuite("t2")
        .expect_row_count_between(1, 10)      # passes: 4 rows
        .expect_row_count_between(1, 3)       # fails: upper bound
        .expect_column_type("amount", "double")   # passes
        .expect_column_type("amount", "bigint")   # fails
        .expect_column_type("nope", "string")     # fails: absent column
    )
    res = suite.run(frame)
    rc = [r for r in res if r.check == "row_count_between"]
    assert rc[0].passed and not rc[1].passed
    ct = {r.column: r.passed for r in res if r.check == "column_type"}
    assert ct["amount:double"] and not ct["amount:bigint"] and not ct["nope:string"]


def test_fail_closed_raises_like_silver_gate(frame):
    suite = QualitySuite("silver").expect_unique("id")
    with pytest.raises(QualityGateError) as exc:
        suite.validate(frame, fail_closed=True)
    assert exc.value.failures[0].check == "unique"


def test_warn_only_returns_like_bronze_gate(frame):
    suite = QualitySuite("bronze").expect_unique("id")
    results = suite.validate(frame, fail_closed=False)
    assert any(not r.passed for r in results)


def test_observed_gate_rides_the_write_action(spark):
    from us_dot_flights_lakehouse_spark.quality.checks import (
        QualitySuite,
        attach_observed,
    )

    df = spark.range(0, 100).selectExpr("id", "CASE WHEN id < 90 THEN id END AS v")
    suite = (
        QualitySuite("obs_gate")
        .expect_row_count_at_least(50)
        .expect_null_rate_at_most("v", 0.2)
        .expect_column_exists("id")
    )
    observed, resolve = attach_observed(suite, df)
    observed.write.format("noop").mode("overwrite").save()  # the only action
    got = {(r.check, r.column): r.passed for r in resolve()}
    want = {(r.check, r.column): r.passed for r in suite.run(df)}
    assert got == want and all(got.values())


def test_render_html_data_docs(tmp_path):
    from us_dot_flights_lakehouse_spark.quality.checks import (
        CheckResult,
        render_html,
        write_data_docs,
    )

    results = {
        "silver<&>": [
            CheckResult("null_rate_at_most", "op_carrier", True, 0.0),
            CheckResult("values_between", "dep_delay", False, 99999.0),
        ],
        "gold": [CheckResult("unique", "flight_key", True, 1.0)],
    }
    html = render_html(results)
    assert "silver&lt;&amp;&gt;" in html  # suite names are escaped
    assert "2/3 checks passed" in html and "1 FAILING" in html
    assert html.count("<table>") == 2
    out = write_data_docs(results, str(tmp_path / "docs" / "index.html"))
    assert open(out).read() == html


def test_data_docs_collector_is_thread_isolated(spark):
    """Two threads validating concurrently must record into their OWN
    collectors (the active stack is a ContextVar, not process-global)."""
    import threading

    from us_dot_flights_lakehouse_spark.quality.checks import (
        CheckResult,
        DataDocsCollector,
    )

    seen = {}

    def run(tag):
        with DataDocsCollector() as docs:
            DataDocsCollector.record(
                f"suite_{tag}", [CheckResult(f"c_{tag}", "col", True, 1.0)]
            )
            seen[tag] = dict(docs.results)

    ts = [threading.Thread(target=run, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert set(seen["a"]) == {"suite_a"}
    assert set(seen["b"]) == {"suite_b"}
