"""Grouped-map operators (applyInPandas) and Python UDTFs.

These are the sanctioned Python escape hatches when per-group logic
genuinely exceeds built-in expressions (SURVEY.md §7.3): Arrow moves each
group to Python as one pandas frame, so cost is batch-sized, not
row-sized. Everything here is still one shuffle on the group key — the
same exchange a built-in groupBy would pay.

Caveats at 100 TB: a single group must fit in one task's memory (the
grouped-map contract); for skewed group sizes pre-split hot groups or
fall back to the window-function formulation (which streams).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_minmax_scale(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group min-max scaling via applyInPandas (grouped map).

    Semantically identical to the pure-window formulation
    ``(v - min(v) over g) / nullif(max(v) over g - min(v) over g, 0)`` —
    that identity is what the DuckDB oracle checks, and min/max (unlike
    mean/std) are order-exact, so the two formulations agree bitwise.
    Use the window form when the logic stays this simple; the grouped-map
    form is the template for logic that needs real pandas/numpy.
    """
    # build the output schema as DDL: a StructType obtained from df.schema
    # carries column references that Spark 4's analyzer refuses to resolve
    # against the grouped-map output
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` double"]
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[value_col].min()
        hi = pdf[value_col].max()
        rng = hi - lo
        pdf[out_col] = (pdf[value_col] - lo) / rng if rng != 0 else None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(scale, schema=schema)


def make_shingle_udtf():
    """Python UDTF (Spark 4 user-defined table function) emitting
    positional character 3-grams for one text value — the lateral-join
    form of a tokenizer. Kept as the UDTF *capability* demo: for this
    exact logic the built-in ``posexplode(split(...))``-style expression
    path is strictly faster (JVM, codegen); reach for a UDTF only when
    the row-expansion logic needs real Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, shingle string")
    class Shingler:
        def eval(self, text: str):
            if text is None:
                return
            for i in range(max(len(text) - 2, 0)):
                yield i, text[i : i + 3]

    return Shingler
