"""Query registry — the driver-facing catalog of implemented operators.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB
over the same parquet tables. ``__spark_entry__.py`` exposes this registry.

Determinism contract (why results hash-match the oracle bit-for-bit):
- money-like SUMs go through exact DECIMAL accumulation, surfaced as DOUBLE
  (float summation order is nondeterministic under parallel aggregation);
- derived ratios/averages are computed with plain IEEE-754 double ops
  (cast → multiply → divide) with NO round() — both engines then produce
  identical bit patterns; round() is avoided because Spark rounds via
  BigDecimal (decimal-exact) while other engines round in binary floating
  point, which can disagree (classic round(2.675, 2) case);
- integer-valued aggregates are BIGINT on both sides;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from us_dot_flights_lakehouse_spark.queries import (
    flights,
    llm,
    quality,
    relational,
    streaming,
)

_MODULES = (llm, streaming, quality, flights, relational)

#: Names pulled to the FRONT of the registry, in this order. The driver's
#: correctness harness samples a bounded prefix of the catalog (the head
#: 50), so ordering is signal allocation: queries NEW or CHANGED this
#: round come first, then — since round 13 — the entries whose most
#: recent green DRIVER row is oldest (staleness rotation, recomputed
#: per round by tools/rotation_plan.py; every catalog entry has >=1
#: lifetime green driver row, and the full catalog is locally
#: oracle-swept at three SFs each round regardless). Entries not listed
#: keep their module registration order below the fold. Per-round
#: rotation rationale lives in git history:
#: `git log -L :_PRIORITY:us_dot_flights_lakehouse_spark/queries/__init__.py`.
_PRIORITY = (
    # ---- round-13 front-load (driver samples the FIRST 50 entries) ----
    # New: the advisor-driven join seam — q_join_cardinality_advisor's
    # strategy recommendation actually DRIVES the physical plan
    # (broadcast hint vs forced shuffled SMJ; the partition count rides
    # the advised_shuffle_partitions conf seam), semantics proven
    # unchanged against a plain-SQL-join oracle:
    "j19_advised_join",
    # New: join-key skew advisor (Misra-Gries heavy hitters per edge ->
    # per-key salt/none verdict + salt count; the detection half of the
    # r13 skew-stress gate) and the seam that applies it:
    "q_join_skew_advisor",
    "j20_skew_advised_join",
    # New: the group-by advisor's recommendation sizing the mart's
    # pre-write repartition (the X2 anti-small-files seam, stats-driven):
    "a42_advised_mart_layout",
    # New: range-layout advisor (exact-percentile cut points; the KLL
    # path's CHECK at scale) and the seam writing the range-clustered,
    # locally-sorted mart layout with oracle-pinned disjoint extents:
    "q_range_partition_advisor",
    "x13_advised_range_layout",
    # ---- staleness rotation (VERDICT r12 item 1) ----
    # The remaining head-50 slots go to the entries with the STALEST lifetime
    # driver attestation (most recent green CORRECTNESS_r*.json row:
    # 44 from r1-r2, 5 from r3 — computed by tools/rotation_plan.py,
    # plan recorded in COVERAGE.md). They are covered by every local
    # 306/306 sweep; this refreshes the DRIVER-side hard evidence.
    "a10_cube_returnflag_status",  # last driver row r1
    "a13_pivot_status_by_segment",  # last driver row r1
    "a14_unpivot_status_counts",  # last driver row r1
    "a15_grouping_sets",  # last driver row r1
    "a16_collection_aggs",  # last driver row r1
    "a17_bitwise_bool_aggs",  # last driver row r1
    "a3_global_summary",  # last driver row r1
    "a4_distinct_dim",  # last driver row r1
    "a5_topk_parts",  # last driver row r1
    "a7_grouped_dim_supplier",  # last driver row r1
    "a9_rollup_segment_status",  # last driver row r1
    "dd_fuzzy_name_pairs",  # last driver row r1
    "f_array_suite",  # last driver row r1
    "f_array_suite2",  # last driver row r1
    "f_datetime_suite",  # last driver row r1
    "f_datetime_suite2",  # last driver row r1
    "f_explode_suite",  # last driver row r1
    "f_map_suite",  # last driver row r1
    "f_string_suite",  # last driver row r1
    "f_string_suite2",  # last driver row r1
    "f_udtf_shingles",  # last driver row r1
    "f_xml_suite",  # last driver row r1
    "j10_regional_revenue",  # last driver row r1
    "j12_lateral_topk_orders",  # last driver row r1
    "j2_star_fact_build",  # last driver row r1
    "j4_outer_merge_daily_flow",  # last driver row r1
    "j6_semi_high_value_customers",  # last driver row r1
    "j7_anti_customers_without_orders",  # last driver row r1
    "j9_range_join_price_bands",  # last driver row r1
    "o3_date_dim",  # last driver row r1
    "o4_recursive_month_spine",  # last driver row r1
    "p4_conditional_cleaning",  # last driver row r1
    "p5_null_handling",  # last driver row r1
    "p6_grouped_minmax_scale",  # last driver row r1
    "s1_deterministic_sample",  # last driver row r1
    "u1_union_distinct_nations",  # last driver row r1
    "u2_intersect_except_nations",  # last driver row r1
    "u3_multiset_ops",  # last driver row r1
    "w1_topk_per_group",  # last driver row r1
    "w2_window_suite",  # last driver row r1
    "fl_daily_airline_mart",  # last driver row r2
    "fl_fact_star",  # last driver row r2
    "j1_enrich_lookup_join",  # last driver row r2
    "q_quality_report",  # last driver row r2
    "a11_exact_quantiles",  # last driver row r3
    "a12_approx_sketches",  # last driver row r3
    "a18_stat_moments",  # last driver row r3
    "a8_describe_orders",  # last driver row r3
    "dd_dup_clusters",  # last driver row r3
)
# Uniqueness guard so hand-counting the driver head-50 budget stays
# honest. An explicit raise, not a bare assert: asserts vanish under
# `python -O`, which would strip the guard exactly in optimized
# deployments (ADVICE r11).
if len(_PRIORITY) != len(set(_PRIORITY)):
    _dups = sorted({n for n in _PRIORITY if _PRIORITY.count(n) > 1})
    raise ValueError(f"duplicate _PRIORITY entries: {_dups}")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        merged.update(m.QUERIES)
    # a typo'd _PRIORITY name would otherwise silently demote that query
    # out of the driver's head-50 sample — fail loudly instead, same
    # posture as the duplicate guard above (ADVICE r11 / review r12)
    unknown = [n for n in _PRIORITY if n not in merged]
    if unknown:
        raise ValueError(f"_PRIORITY names not in any QUERIES module: {unknown}")
    out = {n: merged[n] for n in _PRIORITY}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        for name, sql in m.ORACLES.items():
            if callable(sql):
                # data-dependent oracle (e.g. sim_ivf_topk's literal
                # centroids, re-trained from the parquet): build lazily;
                # if the data isn't reachable, fall back to a rows-only
                # check by omitting the entry.
                try:
                    sql = sql()
                except Exception:
                    continue
            out[name] = sql
    return out
