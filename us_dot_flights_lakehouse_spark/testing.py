"""Shared test/verification helpers (SURVEY.md §5: the reference ships no
unit tests — only in-pipeline Great Expectations suites — so this engine's
test strategy is stricter: per-operator unit tests plus engine-vs-DuckDB
oracle comparison on identical parquet inputs)."""

from __future__ import annotations

import hashlib


def cell(v) -> str:
    """Stable scalar stringification: None/NaN -> sentinel, floats via repr
    (bit-faithful round-trip), everything else str()."""
    if v is None or (isinstance(v, float) and v != v):
        return "\\N"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    """Order-insensitive canonical form: columns sorted by name, rows
    stringified then sorted — mirrors the driver's compare protocol."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x1f".join(cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def norm_hash(cols: list[str], rows: list[tuple]) -> str:
    return hashlib.md5("\x1e".join(norm_rows(cols, rows)).encode()).hexdigest()


def assert_df_equal(spark_df, duck_rows, duck_cols) -> None:
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(spark_df.columns) == sorted(duck_cols), (
        f"columns differ: {sorted(spark_df.columns)} vs {sorted(duck_cols)}"
    )
    assert len(s_rows) == len(duck_rows), f"rows {len(s_rows)} != {len(duck_rows)}"
    a, b = norm_rows(spark_df.columns, s_rows), norm_rows(list(duck_cols), duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
