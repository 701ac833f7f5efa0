"""Event-time operators, usable in BOTH batch and streaming plans
(SURVEY.md §2.8 extension note: the reference has no event-time windowing;
Spark gives it built-in via F.window / withWatermark / session windows).

``windowed_event_stats`` and ``sessionize`` take any events DataFrame —
batch (parquet scan) or streaming (readStream). The streaming caller adds
``withWatermark`` before the call (see tests/test_streaming.py); semantics
are identical, which is what makes the batch DuckDB oracle a valid check
of the streaming aggregation logic.

Scale notes (100 TB):
- Window aggregation shuffles on (window, key) — group cardinality, not
  event cardinality; partial aggregation applies as usual.
- Batch sessionization is two window functions over (user, ts) — one
  shuffle on user_id. Skewed users (bots) are the classic hazard: AQE
  skew handling plus a per-user event cap upstream is the mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.operators.aggregates import dec_sum


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window stats per event type: count + exact-decimal
    value sum. Works unchanged under readStream (append mode once the
    caller adds a watermark on ``ts_col``)."""
    return (
        events.groupBy(F.window(ts_col, window_duration).alias("win"), F.col(type_col))
        .agg(F.count("*").alias("n_events"), dec_sum(value_col, "total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            type_col,
            "n_events",
            "total_value",
        )
    )


def sliding_window_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """SLIDING event-time windows (each event contributes to
    duration/slide overlapping windows — the trailing-hour-updated-every-
    half-hour dashboard shape). Same streaming contract as the tumbling
    variant: add a watermark and this runs unchanged under readStream.
    Scale: the window fan-out is duration/slide rows per event applied
    map-side before ONE hash aggregate — no self-joins."""
    return (
        events.groupBy(
            F.window(ts_col, window_duration, slide_duration).alias("win"),
            F.col(type_col),
        )
        .agg(F.count("*").alias("n_events"), dec_sum(value_col, "total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            type_col,
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session index,
    then per-session rollup (the lag/cumsum idiom; streaming equivalent is
    ``session_window`` which needs no pre-assigned ids). Deterministic
    ordering via (ts, event_id) tie-break."""
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = W.partitionBy(user_col).orderBy(*order)
    # integer microseconds: exact gap comparison at any timestamp precision.
    # timestamp_diff (not unix_micros) so TIMESTAMP and TIMESTAMP_NTZ inputs
    # both work — parquet micros without timezone arrives as NTZ.
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.timestamp_diff("MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col))
            > gap_us,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return flagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        dec_sum("value", "total_value"),
    )


def clickstream_attribution_stream(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each purchase with the clicks by the
    same user inside the preceding ``lookback`` window.

    Both inputs may be streaming DataFrames; each gets a watermark so the
    state store can evict click rows once ``p_ts - lookback`` has passed
    the watermark — without both watermarks AND both time bounds the join
    state grows without bound, which is the thing that kills
    stream-stream joins at 100 TB/day. Works identically on batch inputs
    (watermarks are no-ops there), so the batch oracle query
    ``j11_clickstream_interval_join`` checks this operator's join
    semantics; the streaming path is parity-tested in
    tests/test_streaming.py.
    """
    p = purchases.select(
        "event_id",
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select(
        "event_id",
        F.col("p_user").alias("user_id"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("c_ts").alias("click_ts"),
        "click_value",
    )


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, on, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich a streaming DataFrame with a batch
    dimension. The static side is re-planned per micro-batch (so a dim
    refresh lands without restarting the query) and broadcast — the
    stream side never shuffles, which is the property that keeps a 100
    TB/day ingest enrichment stateless and linear. No watermark needed:
    stream-static joins keep no state."""
    return stream.join(F.broadcast(dim), on, how)
