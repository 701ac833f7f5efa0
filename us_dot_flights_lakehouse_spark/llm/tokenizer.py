"""Distributed BPE tokenizer training (Sennrich et al. 2016): word-level
frequency table, adjacent symbol-pair counting, and the greedy merge loop.

The scale shape is the classic one: the corpus is huge but the *vocabulary*
is zipf-bounded, so everything after the one word-count aggregation runs on
the (word, freq) table — typically millions of rows regardless of corpus
size. Each merge round is one vocabulary-sized pair-count aggregation plus
a single-row argmax collect; the re-segmentation is an expression-only
array fold (no Python in the hot path anywhere).

Word-internal merges only (no end-of-word marker) — the marker adds a
sentinel symbol, not new machinery, and the synthetic corpus has no
morphology for it to help with.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.functions.text import tokenize


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus. The single corpus-sized shuffle in
    the trainer — a hash aggregate with map-side partial combine, output
    vocabulary-bounded."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


_PAIR_T = "array<struct<left_sym:string,right_sym:string>>"


def adjacent_pairs(symbols: Column) -> Column:
    """Adjacent (left_sym, right_sym) pairs of a symbol array — zip of the
    array against itself shifted by one; empty below 2 symbols."""
    n = F.size(symbols)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(symbols, 1, n - 1),
            F.slice(symbols, 2, n - 1),
            lambda a, b: F.struct(a.alias("left_sym"), b.alias("right_sym")),
        ),
    ).otherwise(F.array().cast(_PAIR_T))


def chars(word: Column) -> Column:
    """Single-character symbol array of a word."""
    return F.split(word, "")


def merge_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-weighted adjacent character-pair counts — BPE iteration 0's
    candidate table. Returns (left_sym, right_sym, pair_count).

    Scale: corpus-sized shuffle for word counts, then a vocabulary-sized
    explode + hash aggregate (pairs per word = chars-1; alphabet²-bounded
    output). The corpus text itself is touched exactly once."""
    words = word_frequencies(docs, text_col)
    pairs = words.select(
        "freq", F.explode(adjacent_pairs(chars(F.col("word")))).alias("p")
    )
    return pairs.groupBy(
        F.col("p.left_sym").alias("left_sym"),
        F.col("p.right_sym").alias("right_sym"),
    ).agg(F.sum("freq").cast("bigint").alias("pair_count"))


def _merge_fold(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge to a symbol array:
    fold that replaces the tail symbol with the merged token whenever
    (tail, current) == (left, right). Non-overlapping by construction —
    'aaaa' under (a,a) becomes [aa, aa], exactly reference BPE."""
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def vocab_ids(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Frequency-ranked vocabulary: (word, freq, token_id) with token_id
    assigned by (freq desc, word asc) — rank 0 is the most common word,
    ties broken lexicographically so the id table is deterministic.

    The ranking runs through ``operators.physical.ordered_dense_ids``
    (range-partitioned sort + per-partition offsets — distributed
    zipWithIndex) rather than a ``row_number() OVER (ORDER BY ...)``
    window, which would funnel the whole vocabulary through one task; a
    web-scale vocab is millions of rows and deserves a parallel rank.
    Ids are a pure function of the total order, so consumers' oracles
    are unaffected by the physical strategy."""
    from us_dot_flights_lakehouse_spark.operators.physical import (
        ordered_dense_ids,
    )

    ranked = ordered_dense_ids(
        word_frequencies(docs, text_col),
        [F.desc("freq"), F.asc("word")],
        id_name="token_id",
    )
    return ranked.select(
        "word", "freq", F.col("token_id").cast("int").alias("token_id")
    )


def encode_token_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document's token stream as its vocabulary id sequence —
    the text → training-tensor step (compose with ``curation.
    pack_sequences`` for the full pipeline). Returns
    (id, n_tokens, token_ids array<int>); out-of-vocabulary tokens encode
    as -1 (the caller's UNK policy).

    Scale: posexplode to (doc, pos, word), hash-join against the vocab
    (AQE broadcasts a small vocab, shuffle-joins a huge one), then ONE
    groupBy(doc) re-assembly where sort_array over (pos, id) structs
    restores token order without a window. Corpus tokens pass through
    exactly one shuffle pair (join + reassembly)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokenize(text_col)).alias("pos", "word"),
    )
    joined = toks.join(vocab.select("word", "token_id"), "word", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("pos").alias("pos"),
                            F.coalesce("token_id", F.lit(-1)).alias("tid"),
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("token_ids"),
        )
        .withColumnRenamed("id", id_col)
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges over the corpus. Returns the
    ordered merge list [(left_sym, right_sym, pair_count)].

    Ties break deterministically: count desc, then (left_sym, right_sym)
    ascending — mirrored by the reference implementation in the unit test.

    Scale: the corpus is aggregated to (word, freq) ONCE; every round after
    that is a vocabulary-sized pair count (orderBy().limit(1) compiles to a
    single-pass TakeOrdered reduce, no sort shuffle), one 1-row collect,
    and an expression-only re-segmentation. localCheckpoint each round
    keeps lineage flat over long merge schedules (same discipline as
    ``curation.dup_clusters``)."""
    vocab = (
        word_frequencies(docs, text_col)
        .select("freq", chars(F.col("word")).alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            vocab.select("freq", F.explode(adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(
                F.col("p.left_sym").alias("left_sym"),
                F.col("p.right_sym").alias("right_sym"),
            )
            .agg(F.sum("freq").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, count = top[0][0], top[0][1], int(top[0][2])
        merges.append((left, right, count))
        vocab = vocab.select(
            "freq", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges
