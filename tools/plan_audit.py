"""Catalog-wide physical-plan audit: build every registered query at
sf0.001 and scan its final plan for 100 TB anti-patterns.

Flags per query:
- PY_ROW   : BatchEvalPython / ArrowEvalPython (row/expr-level Python —
             the Arrow GROUP/MAP kernels FlatMap*InPandas are fine)
- CARTESIAN: CartesianProduct (an unintended cross join shuffles n*m)
- ONE_PART : Exchange SinglePartition outside a final global ORDER BY /
             1-row aggregate (serializes the job through one task)
- SMJ      : SortMergeJoin in queries expected to broadcast every dim

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any non-whitelisted finding appears.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose semantics legitimately need a single partition or a
#: big-big join (reason documented inline)
WHITELIST: dict[str, set[str]] = {
    # global ORDER BY result surfaces (driver-facing ordered output)
    "a5_topk_parts": {"ONE_PART"},       # TakeOrdered merge — k rows
    "w1_topk_per_group": {"ONE_PART"},   # final ordered projection
    "o3_date_dim": {"ONE_PART"},         # 731-row generator
    "o4_recursive_month_spine": {"ONE_PART"},  # 24-row spine
    "a8_describe_orders": {"ONE_PART"},  # 1-row global aggregate
    "a3_global_summary": {"ONE_PART"},   # 1-row global aggregate
    "o11_universe_sample": {"ONE_PART"},  # the two 1-row zero-pair-loss
    #   observables added by ADVICE r11 (scan-only sampled-order count vs
    #   summed joined count) — a3's 2-phase global-agg shape, broadcast
    #   onto 5 segment rows
    "a19_sketch_rollup": {"ONE_PART"},   # 1-row union of ~80 monthly HLL blobs
    # big-big joins that are genuinely shuffle joins (both sides large)
    "dd_ngram_jaccard": {"SMJ"},         # inverted-index self-join
    "dd_minhash_lsh": {"SMJ"},           # band-bucket self-join
    "dd_simhash_pairs": {"SMJ"},         # band-bucket self-join
    "dd_dup_clusters": {"SMJ"},          # label-propagation joins
    "ts_tfidf_keywords": {"SMJ", "ONE_PART"},  # token df join (both sides
    #   row-scale) + the deliberate 1-row corpus-count aggregate that rides
    #   the plan as a broadcast instead of an eager driver count()
    "dd_semantic_dedup": {"SMJ"},        # label-propagation joins (pair graph)
    "tp_label_balance": {"ONE_PART"},    # 1-row min-class-count aggregate,
    #   broadcast back into the per-label filter (never a data funnel)
    "tp_dataset_card": {"ONE_PART"},     # 1-row corpus summary aggregate
    "q_range_partition_advisor": {"ONE_PART"},  # the 1-row percentile-cuts
    #   aggregate (a3's 2-phase global-agg shape), broadcast back over the
    #   scan as the bucket-assignment relation — never a data funnel (r13)
    "q_table_stats": {"ONE_PART"},       # five 1-row per-column profiles
    #   unioned (each a global aggregate, like a3/a8)
    "ts_ngram_lm": {"ONE_PART"},         # 40-row ranked projection
    "j8_asof_purchase_attribution": {"SMJ", "ONE_PART"},  # as-of union-window
    "j11_clickstream_interval_join": {"SMJ"},  # interval join
    "j12_lateral_topk_orders": {"SMJ"},  # per-customer lateral
    "st_sessionize": {"ONE_PART"},       # session window final merge
    "j4_outer_merge_daily_flow": {"SMJ"},  # FULL OUTER cannot broadcast either side
    "tp_corpus_curation": {"SMJ"},       # stats⋈langs both row-scale (doc_id)
    "fl_fact_star": {"ONE_PART"},        # deliberate 1-row route-count agg
    "f_udtf_shingles": {"PY_ROW"},       # the query EXISTS to exercise Python UDTFs
    "ts_heavy_hitters": {"ONE_PART"},    # global top-10 merge: mergeable
    #   sketch partials reduce to one fixed-size state, then 10 rows
    "tp_vocab_coverage": {"ONE_PART"},   # rank/cum-sum window over the
    #   TakeOrdered top-COV_TOPK rows only (k-row task, never a global sort)
    "tp_temperature_mix": {"ONE_PART"},  # 1-row normalizer aggregate over
    #   the tiny per-source count table, broadcast back
    "g1_bipartite_rank": {"SMJ"},        # lineitem⋈orders edge derivation —
    #   both sides row-scale, a genuine shuffle join (j4/j11 family)
    "tp_dsir_weights": {"ONE_PART"},     # 1-row corpus-totals aggregate,
    #   broadcast back into the per-token ratio (tfidf precedent)
    "a22_copurchase_lift": {"ONE_PART"},  # 1-row basket-count aggregate,
    #   broadcast into support/lift denominators
    "dd_cluster_keep_best": {"SMJ"},     # label-propagation joins over the
    #   pair graph (dd_dup_clusters family)
    "tp_mixture_epochs": {"ONE_PART"},   # 1-row sqrt-normalizer aggregate
    #   over the tiny per-source table (tp_temperature_mix family)
    "q_referential_integrity": {"ONE_PART"},  # three 1-row FK-check
    #   aggregates unioned (q_table_stats family)
    "o5_benford_audit": {"ONE_PART"},    # 1-row digit-total aggregate,
    #   broadcast into the frequency denominators
    "sim_ivf_recall_audit": {"SMJ"},     # audit join of two k×|queries|
    #   top-k result sets — statically unsized, AQE broadcasts at runtime
    "sim_pq_recall_audit": {"SMJ"},      # same audit-join shape as the
    #   IVF recall audit
    "w13_activity_bitmap": {"ONE_PART"},  # 1-row global min-week epoch,
    #   broadcast back into the bit-index expression
    "g2_triangle_count": {"SMJ"},        # wedge enumeration + closure
    #   semi-join over the directed edge set — both sides edge-scale, the
    #   canonical shuffle-join shape of distributed triangle counting
    "q_schema_drift": {"ONE_PART"},      # 1-row corpus-baseline aggregate,
    #   broadcast into the per-source drift ratios (tfidf precedent)
    "sim_cur_decomposition": {"ONE_PART"},  # 64-row dimension ranking +
    #   1-row total/prefix-array aggregate — never row-scale data
    "a26_chi2_independence": {"ONE_PART"},  # 1-row contingency-total
    #   aggregate broadcast into the expected-count denominators
    "tp_annotation_agreement": {"ONE_PART"},  # K²-cell confusion matrix
    #   reduced to 1-row totals/marginal folds — never row-scale
    "sim_power_iteration": {"ONE_PART"},  # the iterated vector is a 1-row
    #   64-double aggregate broadcast back each iteration — by design
    "a27_bootstrap_ci": {"ONE_PART"},    # 32 replicate means reduce to a
    #   1-row sorted array for the CI picks — never row-scale
    "dd_pipeline_verdict": {"SMJ"},      # composes the LSH band-bucket
    #   self-join (dd_minhash_lsh family) plus doc-keyed assembly joins —
    #   all sides row-scale, genuine shuffle joins
    "dd_source_dedup_report": {"SMJ"},   # rollup OF dd_pipeline_verdict —
    #   inherits its whitelisted LSH/assembly joins
    "sim_intrinsic_dimension": {"ONE_PART"},  # 64 variance cells reduce
    #   to one PR row — never row-scale
    "dd_threshold_sweep": {"ONE_PART"},  # 1-row corpus-count aggregate
    #   broadcast into the per-threshold dup-rate denominators
    "q_table_stats_approx": {"ONE_PART"},  # two 1-row profile aggregates
    #   (sketch pass + exact companions) crossJoined — q_table_stats family
    "a28_mutual_information": {"ONE_PART"},  # 1-row contingency-total
    #   aggregate broadcast into the PMI denominators (a26 family)
    "tp_ranker_auc": {"ONE_PART"},       # prefix-sum window over the
    #   score-DISTINCT aggregate (score-cardinality-sized) + 1-row AUC
    "ts_heaps_law": {"ONE_PART"},        # two 1-row conditional-sum folds
    #   (10 decile counters each) crossJoined — never row-scale
    "q_freshness_audit": {"ONE_PART"},   # 1-row high-water-mark aggregate
    #   broadcast into the staleness expressions
    "a29_nation_gini": {"ONE_PART"},     # rank/cum window over the 25-row
    #   nation aggregate + 1-row Gini totals
    "sim_index_drift": {"ONE_PART"},     # 1-row corpus-total aggregate
    #   broadcast into the needs_split comparison
    "tp_neyman_allocation": {"ONE_PART"},  # 1-row sequential denominator
    #   fold over the ~30-source aggregate (tp_temperature_mix family)
    "sim_lsh_recall_audit": {"SMJ"},     # audit join of three k×|queries|
    #   top-k result sets — sim_ivf/pq_recall_audit family
    "dd_lsh_tuning_curve": {"ONE_PART"},  # five 1-row per-config
    #   candidate-load aggregates unioned (bucket counting, never pairs)
    "x8_snapshot_diff": {"SMJ"},         # FULL OUTER key diff — neither
    #   snapshot side can broadcast (j4 family); only (key, fp) pairs move
    "x9_bucketed_join": {"SMJ"},         # the POINT of the query: a
    #   bucketed big-big sort-merge join with ZERO exchanges below it
    #   (plan-asserted in tests/test_round6_ops.py)
    "q_skew_report": {"ONE_PART"},       # cumulative window + 1-row
    #   percentile selection over the HISTOGRAM-sized distinct-frequency
    #   table (distinct per-key counts, never row-scale)
    "a31_ks_drift": {"ONE_PART"},        # bucket-offset window over the
    #   ~600-row bucket table + the 1-row KS argmax — the row-scale
    #   cumulative runs PARTITIONED by bucket (the two-phase scan)
    "dd_incremental_clusters": {"SMJ"},  # composes the LSH band-bucket
    #   self-join + two dup_clusters CC iterations (dd_dup_clusters
    #   family) — all sides row-scale, genuine shuffle joins
    "g4_label_propagation": {"SMJ"},     # neighbor-label join per LPA
    #   round — both sides edge-scale (g1_bipartite_rank family)
    "q_encoding_profile": {"ONE_PART"},  # four 1-row per-column
    #   concentration aggregates unioned (q_table_stats family)
    "a32_wasserstein_drift": {"ONE_PART"},  # a31's exact shape: bucket-
    #   offset window over the ~600-row bucket table + the 1-row W1 sum;
    #   the row-scale cumulative and lead() run PARTITIONED by bucket
    "a33_welch_t_drift": {"ONE_PART"},   # 1-row global moment aggregate
    #   (a3/a8 family)
    "a34_cramers_v": {"ONE_PART"},       # 15-cell collect + 1-row ordered
    #   chi-square fold (tp_dataset_card family — never row-scale)
    "tp_dedup_aware_mixture": {"ONE_PART"},  # 1-row source-ordered sqrt
    #   normalizer fold over the ~20-row per-source aggregate, broadcast
    #   back (tp_label_balance family)
    "w21_rolling_quantile": {"ONE_PART"},  # global ordered window over the
    #   DAY-cardinality pre-aggregate (~2.4K rows — q_skew_report family)
    "a35_quantile_drift": {"ONE_PART"},  # 1-row two-array percentile
    #   aggregate then a 9-row explode (a3/a8 family)
    "q_pk_uniqueness_audit": {"ONE_PART"},  # five 1-row per-table PK
    #   profiles unioned (q_table_stats family)
    "w22_period_over_period": {"ONE_PART"},  # lag window over the ~84-row
    #   MONTH-cardinality aggregate (w21/q_skew_report family)
    "tp_final_sample_weights": {"ONE_PART"},  # 1-row sqrt-normalizer fold
    #   (tp_temperature_mix family)
    "ts_boilerplate_lines": {"ONE_PART"},  # 1-row corpus-count aggregate
    #   broadcast into doc_share + TakeOrdered top-k merge
    "f_udtf_partitioned": {"PY_ROW", "ONE_PART"},  # the query EXISTS to
    #   exercise the TABLE-argument Python UDTF (f_udtf_shingles family);
    #   PARTITION BY source plans a hash exchange + per-partition UDTF
    "a37_anova_oneway": {"ONE_PART"},  # 1-row 5-group moment fold
    #   (a33/a34 family)
    "dd_corpus_snapshot_diff": {"SMJ"},  # FULL OUTER corpus-version key
    #   diff — neither snapshot side can broadcast (x8/j4 family); only
    #   (doc_id, md5) pairs move
    "dd_shingle_df_profile": {"ONE_PART"},  # 1-row shingle-total aggregate
    #   broadcast into the share denominators (tfidf precedent)
    "sim_distance_histogram": {"ONE_PART"},  # 1-row vector-count + 1-row
    #   pair-total aggregates broadcast into partner ids / shares
    "w24_mg_rolling_topk": {"ONE_PART"},  # same ~84-row month index window
    "x11_incremental_mart": {"ONE_PART"},  # 1-row cutoff max-aggregate,
    # broadcast to both branches (a3/x10 pattern)
    "w25_kmv_rolling_distinct": {"ONE_PART"},  # same ~80-row month index
    "w26_mart_rolling_distinct": {"ONE_PART"},  # same ~80-row month index
    #   (shared _kmv_rolling_report: global row_number over observed
    #   months — month-cardinality rows, w22/w23/w24 family)
    # window (w22/w23/w24 family); the sketch/blob path itself is keyed
    "dd_kmv_source_overlap": {"SMJ"},  # the EXACT-companion shingle
    # self-join (both sides row-scale, df-bounded by source count) — the
    # dd_ngram_jaccard shape; the KMV sketch path broadcasts everywhere
    "w23_sketch_rolling_quantile": {"ONE_PART"},  # global row_number over
    #   the ~84-row DISTINCT-month index (w22/q_skew_report family) —
    #   never row-scale; the data path shuffles KB sketch blobs
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from us_dot_flights_lakehouse_spark import queries as registry
    from us_dot_flights_lakehouse_spark.session import get_spark

    spark = get_spark("plan-audit")
    findings: list[tuple[str, str]] = []
    for name, fn in registry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            findings.append((name, f"BUILD_ERROR: {type(exc).__name__}"))
            continue
        flags = set()
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            flags.add("PY_ROW")
        if "CartesianProduct" in plan:
            flags.add("CARTESIAN")
        if "Exchange SinglePartition" in plan:
            flags.add("ONE_PART")
        if "SortMergeJoin" in plan:
            flags.add("SMJ")
        flags -= WHITELIST.get(name, set())
        for f in sorted(flags):
            findings.append((name, f))

    if findings:
        print(f"{len(findings)} findings:")
        for name, f in findings:
            print(f"  {f:10s} {name}")
    else:
        print("plan audit clean: no anti-patterns outside the whitelist")
    spark.stop()
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
