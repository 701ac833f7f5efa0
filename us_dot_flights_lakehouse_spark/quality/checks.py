"""Native data-quality gates (SURVEY.md §5): the reference validates every
layer with Great Expectations suites run in-pipeline
(``expectations/bronze_expectations.py:50-76``,
``silver_expectations.py:54-187``, ``gold_expectations.py`` PK-uniqueness);
this module re-derives the same check vocabulary as plain Spark
aggregations with no external dependency.

Design: a suite COMPILES to one wide aggregation — every null-rate /
range / set / length / uniqueness check becomes a conditional-count
column, so validating a 100 TB table costs exactly one scan + one
single-row aggregate, not one job per expectation (which is how GE on
Spark degrades at scale).

Gate semantics mirror the reference: ``fail_closed=True`` raises on any
failure (silver, ``flights_silver_transform.py:157-162``);
``fail_closed=False`` logs and continues (bronze,
``download_and_ingest.py:308-311``).
"""

from __future__ import annotations

from contextvars import ContextVar
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    column: str
    passed: bool
    observed: float | None


class QualityGateError(RuntimeError):
    """Raised by a fail-closed gate; carries the failing results."""

    def __init__(self, failures: list[CheckResult]):
        self.failures = failures
        super().__init__(
            "quality gate failed: "
            + "; ".join(f"{r.check}({r.column}) observed={r.observed}" for r in failures)
        )


class QualitySuite:
    """Accumulates expectations, compiles them into one aggregation pass."""

    def __init__(self, name: str):
        self.name = name
        # (check_name, column, agg Column producing observed, pass predicate)
        self._checks: list[tuple[str, str, Column | None, object]] = []

    # -- expectation vocabulary (GE-suite equivalents) ----------------------

    def expect_row_count_at_least(self, n: int) -> "QualitySuite":
        self._checks.append(
            ("row_count_at_least", "*", F.count("*").cast("double"), lambda v: v >= n)
        )
        return self

    def expect_row_count_between(self, lo: int, hi: int) -> "QualitySuite":
        """Two-sided row-count bound (reference
        ``expect_table_row_count_to_be_between`` — the upper bound catches
        runaway joins/dup explosions, not just empty feeds)."""
        self._checks.append(
            (
                "row_count_between",
                "*",
                F.count("*").cast("double"),
                lambda v, lo=lo, hi=hi: lo <= v <= hi,
            )
        )
        return self

    def expect_column_exists(self, col: str) -> "QualitySuite":
        self._checks.append(("column_exists", col, None, None))
        return self

    def expect_column_type(self, col: str, dtype: str) -> "QualitySuite":
        """Schema-level type check (reference
        ``expect_column_values_to_be_of_type``): compares the column's
        Spark simpleString dtype — resolved from metadata, zero scan
        cost."""
        self._checks.append(("column_type", f"{col}:{dtype}", None, None))
        return self

    def expect_null_rate_at_most(self, col: str, rate: float) -> "QualitySuite":
        observed = (
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        )
        self._checks.append(
            ("null_rate_at_most", col, observed, lambda v, r=rate: v <= r)
        )
        return self

    def expect_unique(self, col: str) -> "QualitySuite":
        observed = (F.count(col) - F.countDistinct(col)).cast("double")
        self._checks.append(("unique", col, observed, lambda v: v == 0))
        return self

    def expect_values_between(
        self, col: str, lo: float, hi: float, mostly: float = 1.0
    ) -> "QualitySuite":
        in_range = F.when(
            F.col(col).isNull() | F.col(col).between(lo, hi), 1
        ).otherwise(0)
        observed = F.sum(in_range).cast("double") / F.count("*").cast("double")
        self._checks.append(
            ("values_between", col, observed, lambda v, m=mostly: v >= m)
        )
        return self

    def expect_values_in_set(
        self, col: str, values: tuple, mostly: float = 1.0
    ) -> "QualitySuite":
        ok = F.when(F.col(col).isNull() | F.col(col).isin(*values), 1).otherwise(0)
        observed = F.sum(ok).cast("double") / F.count("*").cast("double")
        self._checks.append(
            ("values_in_set", col, observed, lambda v, m=mostly: v >= m)
        )
        return self

    def expect_length_between(self, col: str, lo: int, hi: int) -> "QualitySuite":
        ok = F.when(
            F.col(col).isNull() | F.length(col).between(lo, hi), 1
        ).otherwise(0)
        observed = F.sum(ok).cast("double") / F.count("*").cast("double")
        self._checks.append(("length_between", col, observed, lambda v: v >= 1.0))
        return self

    # -- execution ----------------------------------------------------------

    def run(self, df: DataFrame) -> list[CheckResult]:
        """Single-pass evaluation: one agg over all compiled observations."""
        results: list[CheckResult] = []
        aggs, slots = [], []
        for check, col, observed, pred in self._checks:
            if check == "column_exists":
                results.append(CheckResult(check, col, col in df.columns, None))
                continue
            if check == "column_type":
                name, want = col.split(":", 1)
                got = dict(df.dtypes).get(name)
                results.append(CheckResult(check, col, got == want, None))
                continue
            aggs.append(observed.alias(f"obs_{len(aggs)}"))
            slots.append((check, col, pred))
        if aggs:
            row = df.agg(*aggs).collect()[0]
            for i, (check, col, pred) in enumerate(slots):
                v = row[f"obs_{i}"]
                results.append(CheckResult(check, col, bool(pred(v)), v))
        return results

    def validate(self, df: DataFrame, fail_closed: bool = True) -> list[CheckResult]:
        results = self.run(df)
        DataDocsCollector.record(self.name, results)
        failures = [r for r in results if not r.passed]
        if failures and fail_closed:
            raise QualityGateError(failures)
        return results

    def report_df(self, spark, df: DataFrame) -> DataFrame:
        """Results as a DataFrame (for persistence next to the table)."""
        rows = [
            (self.name, r.check, r.column, r.passed, r.observed) for r in self.run(df)
        ]
        return spark.createDataFrame(
            rows, "suite string, check string, column string, passed boolean, observed double"
        )


def attach_observed(suite: QualitySuite, df: DataFrame):
    """Attach the suite's compiled checks to ``df`` as an ``observe()``
    metric set: the metrics are computed BY the caller's own action
    (typically the table write), so at 100 TB the quality gate costs zero
    extra scans — unlike ``run()``, which triggers its own aggregate job.

    Returns ``(observed_df, resolve)``. Run an action on ``observed_df``
    (write/count/noop-sink), then call ``resolve()`` for the
    ``CheckResult`` list. ``resolve()`` blocks until metrics arrive and
    may only be consumed after exactly one action.
    """
    from pyspark.sql import Observation

    results_static: list[CheckResult] = []
    aggs, slots = [], []
    for check, col, observed, pred in suite._checks:
        if check == "column_exists":
            results_static.append(CheckResult(check, col, col in df.columns, None))
            continue
        if check == "column_type":
            name, want = col.split(":", 1)
            got = dict(df.dtypes).get(name)
            results_static.append(CheckResult(check, col, got == want, None))
            continue
        aggs.append(observed.alias(f"obs_{len(aggs)}"))
        slots.append((check, col, pred))
    if not aggs:
        return df, lambda: list(results_static)
    obs = Observation(suite.name)
    observed_df = df.observe(obs, *aggs)

    def resolve() -> list[CheckResult]:
        row = obs.get
        out = list(results_static)
        for i, (check, col, pred) in enumerate(slots):
            v = row[f"obs_{i}"]
            out.append(CheckResult(check, col, bool(pred(v)), v))
        return out

    return observed_df, resolve


def render_html(results_by_suite: dict[str, list[CheckResult]]) -> str:
    """Static HTML data-docs for quality results — the native counterpart
    of the reference's Great Expectations local data-docs site
    (``expectations/great_expectations/great_expectations.yml:118-128``):
    one summary strip plus one table per suite, pass/fail badged, no
    external assets or JS. Pure string templating on already-computed
    results: rendering never touches Spark, so docs generation is free at
    any table scale."""
    from html import escape

    total = sum(len(v) for v in results_by_suite.values())
    failed = sum(1 for v in results_by_suite.values() for r in v if not r.passed)
    css = (
        "body{font-family:sans-serif;margin:2em;color:#222}"
        "table{border-collapse:collapse;margin:1em 0 2em}"
        "td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}"
        ".pass{color:#086a2d;font-weight:bold}"
        ".fail{color:#a11212;font-weight:bold}"
        ".summary{padding:8px 12px;background:#f4f4f4;border-radius:6px}"
    )
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>Data quality docs</title><style>{css}</style></head><body>",
        "<h1>Data quality docs</h1>",
        f"<p class='summary'>{total - failed}/{total} checks passed across "
        f"{len(results_by_suite)} suites — "
        + ("<span class='pass'>ALL PASSING</span>" if failed == 0 else f"<span class='fail'>{failed} FAILING</span>")
        + "</p>",
    ]
    for suite, results in results_by_suite.items():
        n_fail = sum(1 for r in results if not r.passed)
        badge = (
            "<span class='pass'>PASS</span>"
            if n_fail == 0
            else f"<span class='fail'>{n_fail} FAIL</span>"
        )
        parts.append(f"<h2>{escape(suite)} {badge}</h2>")
        parts.append(
            "<table><tr><th>check</th><th>column</th><th>status</th>"
            "<th>observed</th></tr>"
        )
        for r in results:
            status = (
                "<span class='pass'>pass</span>"
                if r.passed
                else "<span class='fail'>FAIL</span>"
            )
            obs = "" if r.observed is None else f"{r.observed:g}"
            parts.append(
                f"<tr><td>{escape(r.check)}</td><td>{escape(r.column)}</td>"
                f"<td>{status}</td><td>{obs}</td></tr>"
            )
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def write_data_docs(results_by_suite: dict[str, list[CheckResult]], path: str) -> str:
    """Render ``render_html`` output to ``path`` (local file or any
    directory the driver can write); returns the path for logging."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_html(results_by_suite))
    return path


class DataDocsCollector:
    """Context manager capturing every ``QualitySuite.validate``/``run``
    result produced while active, keyed by suite name — the pipeline's
    one-stop feed for ``write_data_docs`` without threading result lists
    through every stage (the same role GE's ValidationOperator store
    plays for its data-docs site). Last-in wins per suite name; nesting
    is LIFO. The active stack is a ``ContextVar``, so two pipelines
    validating concurrently (threads or asyncio tasks) each record into
    their OWN collector instead of cross-recording into whichever was
    entered last."""

    _stack: ContextVar[tuple["DataDocsCollector", ...]] = ContextVar(
        "data_docs_stack", default=()
    )

    def __init__(self) -> None:
        self.results: dict[str, list[CheckResult]] = {}

    def __enter__(self) -> "DataDocsCollector":
        DataDocsCollector._stack.set(DataDocsCollector._stack.get() + (self,))
        return self

    def __exit__(self, *exc) -> None:
        DataDocsCollector._stack.set(DataDocsCollector._stack.get()[:-1])

    @classmethod
    def record(cls, suite: str, results: list[CheckResult]) -> None:
        stack = cls._stack.get()
        if stack:
            stack[-1].results[suite] = results

    def write(self, path: str) -> str:
        return write_data_docs(self.results, path)
