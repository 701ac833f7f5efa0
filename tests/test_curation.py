"""Unit tests for curation operators: sequence packing, training-mix
sampling, PII scrubbing, TF-IDF keywords, duplicate-cluster resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.llm import curation


def _docs(spark, rows, schema="doc_id long, source string, text string"):
    return spark.createDataFrame(rows, schema)


def test_pack_sequences_contiguous_chunking(spark):
    # four 3-token docs, budget 5: starts 0,3,6,9 -> seqs 0,0,1,1
    docs = _docs(
        spark,
        [(i, "s0", "alpha beta gamma") for i in range(4)],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_num"], r["offset_in_seq"])
        for r in curation.pack_sequences(docs, budget=5).collect()
    }
    assert got == {0: (3, 0, 0), 1: (3, 0, 3), 2: (3, 1, 1), 3: (3, 1, 4)}


def test_pack_sequences_partitions_by_shard(spark):
    docs = _docs(
        spark,
        [(1, "a", "x y"), (2, "b", "x y"), (3, "a", "x y")],
    )
    got = {
        r["doc_id"]: (r["seq_num"], r["offset_in_seq"])
        for r in curation.pack_sequences(docs, budget=3).collect()
    }
    # shard 'b' restarts at offset 0 — no cross-shard leakage
    assert got[2] == (0, 0)
    assert got[1] == (0, 0)
    assert got[3] == (0, 2)


def test_mix_keep_deterministic_and_stratified(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(2000)],
        "doc_id long, lang string",
    )
    keep = curation.mix_keep("doc_id", "lang", {"en": 100}, default_pct=0)
    out = docs.select("doc_id", "lang", keep.alias("k"))
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.sum(F.col("k").cast("int")).alias("n")).collect()
    }
    assert by_lang["en"] == 1000  # 100% kept
    assert by_lang["xx"] == 0  # default 0% kept
    # determinism: identical second evaluation
    again = docs.select(keep.alias("k")).collect()
    assert [r["k"] for r in out.select("k").collect()] == [r["k"] for r in again]


def test_mix_keep_rate_is_approximate_but_fixed(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(5000)], "doc_id long, lang string"
    )
    kept = docs.filter(curation.mix_keep("doc_id", "lang", {"en": 30})).count()
    assert 0.25 < kept / 5000 < 0.35  # hash-uniformity sanity band


def test_pii_scrub_all_kinds(spark):
    docs = _docs(
        spark,
        [
            (1, "s", "write to alice.smith+x@corp.example.org today"),
            (2, "s", "server at 192.168.0.17 answered"),
            (3, "s", "call +1 (555) 010-7788 now"),
            (4, "s", "nothing sensitive here"),
        ],
    )
    got = {r["doc_id"]: r for r in curation.pii_scrub(docs).collect()}
    assert "[EMAIL]" in got[1]["clean_text"] and "@" not in got[1]["clean_text"]
    assert got[1]["n_email"] == 1
    assert "[IP]" in got[2]["clean_text"]
    assert got[2]["n_ip"] == 1
    assert "[PHONE]" in got[3]["clean_text"]
    assert got[3]["n_phone"] == 1
    assert got[4]["clean_text"] == "nothing sensitive here"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)


def test_pii_scrub_ip_not_double_counted_as_phone(spark):
    docs = _docs(spark, [(1, "s", "ping 10.20.30.40 ok")])
    r = curation.pii_scrub(docs).collect()[0]
    assert r["n_ip"] == 1 and r["n_phone"] == 0


def test_tfidf_topk_ranks_rare_tokens_first(spark):
    docs = _docs(
        spark,
        [
            (1, "s", "common rare1 common"),
            (2, "s", "common rare2"),
            (3, "s", "common other"),
        ],
    )
    out = curation.tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append((r["rank"], r["token"]))
    # doc 1: 'rare1' (df=1) outranks 'common' (df=3) despite tf=2 for common
    ranks1 = dict(by_doc[1])
    assert ranks1[1] == "rare1"
    # deterministic integer scoring: idf_milli = n_docs*1000 // df
    r1 = next(r for r in out if r["id"] == 1 and r["token"] == "rare1")
    assert r1["idf_milli"] == 3000 and r1["score"] == 3000


def test_contamination_report_counts_probe_overlap(spark):
    docs = _docs(
        spark,
        [
            (1, "s", "alpha beta gamma delta"),  # shares 'alpha beta gamma' w/ probe
            (2, "s", "totally different words here"),
            (3, "s", "alpha beta gamma delta"),  # probe member
        ],
    )
    probe = docs.filter("doc_id = 3")
    got = {
        r["id"]: (r["n_shingles"], r["n_probe_hits"], r["contaminated"])
        for r in curation.contamination_report(docs, probe).collect()
    }
    assert got[3] == (2, 2, True)  # self-overlap: all shingles hit
    assert got[1] == (2, 2, True)  # exact text overlap with probe member
    assert got[2] == (2, 0, False)


def test_dup_clusters_transitive_components(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # chain 1-2-3, pair 5-6; 4 and 7 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in curation.dup_clusters(nodes, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dup_clusters_long_chain_converges(spark):
    # a 12-node path graph needs multiple propagation rounds
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_a long, doc_id_b long"
    )
    got = curation.dup_clusters(nodes, pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}


def test_dup_clusters_driver_gate_matches_distributed(spark):
    """r13: the cap-gated driver-side union of the pair graph (numpy
    pointer jumping) must produce EXACTLY the distributed min-label
    loop's labeling. Deterministic multi-component graph: a diameter-9
    path, a dense blob, an out-of-`nodes` edge endpoint (labels must
    still cover it, as the loop's edge_nodes does), and singletons."""
    nodes = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)]           # path 0..9
        + [(10, 11), (11, 50), (10, 50)],        # blob incl. id 50 ∉ nodes
        "doc_id_a long, doc_id_b long",
    )
    drv = {
        r["node"]: r["cluster_id"]
        for r in curation.dup_clusters(nodes, pairs).collect()
    }
    dist = {
        r["node"]: r["cluster_id"]
        for r in curation.dup_clusters(
            nodes, pairs, driver_cc_max=0
        ).collect()
    }
    assert drv == dist
    assert drv[9] == 0 and drv[50] == 10 and drv[11] == 10


def test_dup_clusters_two_star_equivalent_on_chain(spark):
    """large-star/small-star must produce the same labeling as min-label
    on the adversarial case it exists for: a long path graph (diameter =
    n-1), plus a separate blob and singletons."""
    n = 16
    nodes = spark.createDataFrame([(i,) for i in range(n + 4)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)]  # path 0-..-15
        + [(n, n + 1), (n + 1, n + 2), (n, n + 2)],  # triangle 16-17-18; 19 single
        "doc_id_a long, doc_id_b long",
    )
    base = {
        r["node"]: r["cluster_id"]
        for r in curation.dup_clusters(nodes, pairs, max_iter=30).collect()
    }
    star = {
        r["node"]: r["cluster_id"]
        for r in curation.dup_clusters(
            nodes, pairs, max_iter=10, variant="two_star"
        ).collect()
    }
    assert base == star
    assert star[n - 1] == 0 and star[n + 2] == n and star[n + 3] == n + 3


def test_incremental_dedup_verdict_semantics(spark):
    from us_dot_flights_lakehouse_spark.llm import dedup

    batch = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "b"), (13, "c")], "doc_id long, fp string"
    )
    hist = spark.createDataFrame([("a",), ("a",), ("z",)], "fp string")
    got = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in dedup.incremental_dedup_verdict(batch, hist).collect()
    }
    assert got == {
        10: (True, False, False),   # collides with published history
        11: (False, False, True),   # first of its fp in the batch
        12: (False, True, False),   # within-batch dup beyond the first
        13: (False, False, True),
    }


def test_incremental_dedup_no_forced_history_broadcast(spark):
    """The history side must NOT carry a broadcast hint: with the
    broadcast threshold off, the optimized plan may not contain a
    broadcast exchange (at 100 TB the history is billions of rows —
    a forced hint would OOM instead of letting AQE pick)."""
    from us_dot_flights_lakehouse_spark.llm import dedup

    batch = spark.range(0, 1000).selectExpr("id AS doc_id", "md5(string(id)) AS fp")
    hist = spark.range(0, 1000).selectExpr("md5(string(id * 7)) AS fp")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            dedup.incremental_dedup_verdict(batch, hist)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Broadcast" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_incremental_dedup_is_exchange_free(spark, tmp_path_factory):
    """Production layout: history fingerprints published bucketed on fp
    (publish_history_fingerprints) and the day's batch bucket-written the
    same way → the full verdict (history join, first-id election join)
    plans with ZERO Exchange nodes."""
    from us_dot_flights_lakehouse_spark.llm import dedup
    from us_dot_flights_lakehouse_spark.sources.writers import write_bucketed

    base = tmp_path_factory.mktemp("incr_bkt")
    hist = spark.range(0, 2000).selectExpr("md5(string(id)) AS fp")
    batch = spark.range(1500, 3000).selectExpr(
        "id AS doc_id", "md5(string(id)) AS fp"
    )
    dedup.publish_history_fingerprints(hist, "t_hist_fp", 8, path=str(base / "h"))
    write_bucketed(batch, "t_batch_fp", ["fp"], 8, path=str(base / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        verdict = dedup.incremental_dedup_verdict(
            spark.table("t_batch_fp"), spark.table("t_hist_fp")
        )
        rows = verdict.collect()
        assert len(rows) == 1500
        assert sum(r["dup_of_history"] for r in rows) == 500
        assert all(not r["dup_in_batch"] for r in rows)  # batch fps unique
        plan = verdict._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_hist_fp")
        spark.sql("DROP TABLE IF EXISTS t_batch_fp")


def test_incremental_minhash_verdict_planted(spark):
    """An exact re-crawl collides in ALL bands; a disjoint-vocabulary doc
    collides in none; verdict booleans follow the hit counts."""
    from us_dot_flights_lakehouse_spark.llm import dedup

    hist_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, hist_text), (2, "alpha beta gamma delta epsilon zeta eta theta")]
    hist = spark.createDataFrame(rows, "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (10, hist_text),  # exact re-crawl -> every band collides
            (11, "umber violet wisteria xanthic yellow zaffre umber violet"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in dedup.incremental_minhash_verdict(
            dedup.band_key_rows(batch), dedup.band_key_rows(hist)
        ).collect()
    }
    from us_dot_flights_lakehouse_spark.llm.dedup import MINHASH_BANDS

    assert out[10]["n_band_hits"] == MINHASH_BANDS
    assert out[10]["near_dup_of_history"] and not out[10]["keep"]
    assert out[11]["n_band_hits"] == 0
    assert not out[11]["near_dup_of_history"] and out[11]["keep"]


def test_bucketed_minhash_history_probe_join_is_exchange_free(
    spark, tmp_path_factory
):
    """Production layout: history band keys published bucketed
    (publish_history_band_keys) and the batch's band rows bucket-written
    the same way → the history distinct AND the probe join plan with no
    Exchange; the ONLY Exchange in the verdict is the final per-doc
    rollup (MINHASH_BANDS tagged rows per doc, map-side combined)."""
    from us_dot_flights_lakehouse_spark.llm import dedup
    from us_dot_flights_lakehouse_spark.sources.writers import write_bucketed

    base = tmp_path_factory.mktemp("mh_bkt")
    hist = spark.createDataFrame(
        [(i, f"history document number {i} with shared tail tokens") for i in range(20)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "history document number 3 with shared tail tokens"),
         (101, "completely unrelated fresh crawl content payload")],
        "doc_id long, text string",
    )
    dedup.publish_history_band_keys(hist, "t_hist_bands", 8, path=str(base / "h"))
    write_bucketed(
        dedup.band_key_rows(batch),
        "t_batch_bands",
        ["band_key"],
        8,
        sort_cols=["band_key"],
        path=str(base / "b"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        verdict = dedup.incremental_minhash_verdict(
            spark.table("t_batch_bands"), spark.table("t_hist_bands")
        )
        rows = {r["id"]: r for r in verdict.collect()}
        assert rows[100]["near_dup_of_history"] and not rows[100]["keep"]
        assert rows[101]["keep"]
        plan = verdict._jdf.queryExecution().executedPlan().toString()
        # AQE dumps final + initial plan sections; assert on the final one
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") == 1  # doc rollup only
        assert "Exchange hashpartitioning(band_key" not in final  # probe join free
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_hist_bands")
        spark.sql("DROP TABLE IF EXISTS t_batch_bands")


def test_line_dedup_rejects_encoding_violations(spark):
    """The doc_id*1e6+line_idx keeper encoding must raise on a negative
    doc_id instead of silently electing the wrong keeper."""
    import pytest

    from us_dot_flights_lakehouse_spark.llm import dedup

    bad = spark.createDataFrame([(-1, "x\ny")], "doc_id long, text string")
    with pytest.raises(Exception, match="line_dedup"):
        dedup.line_dedup(bad).collect()


def test_bloom_filter_contract(spark):
    """No false negatives ever; false-positive rate near the analytic
    bound; literal-expression and broadcast-pandas probes agree."""
    from us_dot_flights_lakehouse_spark.operators import bloom

    members = spark.range(0, 1000).selectExpr("md5(string(id)) AS fp")
    bitmap = bloom.build_bloom(members, "fp")  # m=2^16, k=5 -> fpr ~ 0.9%
    # every member answers True (Bloom's hard guarantee)
    hits = members.filter(bloom.might_contain(F.col("fp"), bitmap)).count()
    assert hits == 1000
    # non-members (disjoint hash universe) mostly answer False
    others = spark.range(100_000, 110_000).selectExpr("md5(string(id)) AS fp")
    fp_count = others.filter(bloom.might_contain(F.col("fp"), bitmap)).count()
    assert fp_count / 10_000 < 0.03
    # the Arrow-batched broadcast probe computes the identical verdict
    both = others.unionAll(members)
    expr_side = both.withColumn(
        "m", bloom.might_contain(F.col("fp"), bitmap)
    ).orderBy("fp")
    bc_side = bloom.might_contain_broadcast(both, F.col("fp"), bitmap).orderBy("fp")
    assert [r["m"] for r in expr_side.collect()] == [
        r["_bloom_maybe"] for r in bc_side.collect()
    ]


def test_bloom_incremental_dedup_matches_plain(spark):
    """The Bloom-prefiltered verdict is row-identical to the plain one on
    a corpus with history dups, batch dups, and new docs."""
    from us_dot_flights_lakehouse_spark.llm import dedup

    hist = spark.range(0, 500).selectExpr("md5(string(id)) AS fp")
    batch = spark.createDataFrame(
        [(i, i % 7 == 0) for i in range(1000, 1300)], "doc_id long, is_dup boolean"
    ).selectExpr(
        "doc_id",
        # every 7th doc collides with history fp (id mod 500); every 11th
        # duplicates the previous batch row's fingerprint
        "CASE WHEN is_dup THEN md5(string(doc_id % 500)) "
        "     WHEN doc_id % 11 = 0 THEN md5('batchdup' || string(doc_id - doc_id % 11)) "
        "     ELSE md5('new' || string(doc_id)) END AS fp",
    )
    plain = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in dedup.incremental_dedup_verdict(batch, hist).collect()
    }
    bloomed = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in dedup.incremental_dedup_verdict_bloom(batch, hist).collect()
    }
    assert plain == bloomed
    assert any(v[0] for v in plain.values())  # history dups present


def test_bloom_auto_sizing_tracks_history_cardinality():
    """Unsized filters grow with the build side: m ≈ next power of two
    ≥ 10·n, floored at the 2^16 default, UNCAPPED (ADVICE r5: a silent
    cap re-creates the fpr ≈ 1 saturation the auto-sizing fixed; past
    the 2^22 literal limit the verdict switches probe paths instead)."""
    from us_dot_flights_lakehouse_spark.operators import bloom

    assert bloom.auto_m_bits(0) == 1 << 16
    assert bloom.auto_m_bits(1000) == 1 << 16       # 10k bits < floor
    assert bloom.auto_m_bits(6_000) == 1 << 16      # 60k ≤ 2^16
    assert bloom.auto_m_bits(7_000) == 1 << 17      # 70k > 2^16
    assert bloom.auto_m_bits(100_000) == 1 << 20
    assert bloom.auto_m_bits(10**9) == 1 << 34      # uncapped: 10^10 bits
    assert bloom.auto_m_bits(10**9) > bloom.BLOOM_MAX_LITERAL_BITS
    assert all(bloom.auto_m_bits(n) % 64 == 0 for n in (0, 1, 5, 10**7))


def test_bloom_verdict_broadcast_probe_path(spark):
    """Past the literal limit the verdict must route through the
    broadcast-bitmap probe and still match the plain verdict exactly
    (ADVICE r5: silent capping un-prunes; explicit oversize must work)."""
    from us_dot_flights_lakehouse_spark.llm import dedup

    batch = spark.createDataFrame(
        [(i, f"fp{i % 7}") for i in range(20)], "doc_id int, fp string"
    )
    hist = spark.createDataFrame([("fp1",), ("fp3",)], "fp string")
    plain = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in dedup.incremental_dedup_verdict(batch, hist).collect()
    }
    from us_dot_flights_lakehouse_spark.operators import bloom

    via_broadcast = {
        r["doc_id"]: (r["dup_of_history"], r["dup_in_batch"], r["keep"])
        for r in dedup.incremental_dedup_verdict_bloom(
            batch, hist, m_bits=bloom.BLOOM_MAX_LITERAL_BITS * 2
        ).collect()
    }
    assert plain == via_broadcast


def test_label_balance_clamps_to_smallest_class(spark):
    from us_dot_flights_lakehouse_spark.llm.curation import label_balance

    rows = [(i, "a") for i in range(5)] + [(10 + i, "b") for i in range(3)] + [
        (20 + i, "c") for i in range(2)
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string")
    out = label_balance(df).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], []).append(r["vec_id"])
    assert {k: len(v) for k, v in by_label.items()} == {"a": 2, "b": 2, "c": 2}
    # deterministic: a second run keeps the identical membership
    again = {(r["vec_id"], r["label"]) for r in label_balance(df).collect()}
    assert again == {(r["vec_id"], r["label"]) for r in out}


def test_pack_bestfit_ffd_semantics(spark):
    """FFD packing: longest-first placement, first fitting bin wins,
    oversized items open their own flagged bin, bins never over budget
    except for oversized singletons."""
    from us_dot_flights_lakehouse_spark.llm.curation import pack_bestfit

    rows = [("s", i, n) for i, n in enumerate([5, 4, 3, 2, 9])]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_bestfit(df, budget=6).collect()}
    # order: 9,5,4,3,2 -> 9 opens bin1 (overflow), 5 bin2, 4 bin3,
    # 3 fits neither (5+3>6, 4+3>6) -> bin4, 2 fits bin2 (5+2>6? =7>6 no),
    # bin3: 4+2=6 -> bin3
    assert out[4]["bin_id"] == 1 and out[4]["overflow"]
    assert out[0]["bin_id"] == 2 and not out[0]["overflow"]
    assert out[1]["bin_id"] == 3
    assert out[2]["bin_id"] == 4
    assert out[3]["bin_id"] == 3
    # bin fills respect the budget for non-oversized bins
    fills = {}
    for r in out.values():
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(f <= 6 for b, f in fills.items() if b != 1)
