"""Training-data pipeline queries: dedup / similarity / text analysis over
the ``documents`` and ``embeddings`` tables.

Oracles for MinHash/SimHash are *generated from the same constants* the
Spark operators use (llm/dedup.py), so the two sides cannot drift. The
shared 28-bit md5 hash contract is described in functions/text.py.

Thresholds are calibrated to the synthetic corpus (all-unique docs, max
3-gram Jaccard ≈ 0.037, max pairwise cosine ≈ 0.51) so results are
non-empty and the full candidate-generation + verification machinery is
exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
import pandas as pd

from us_dot_flights_lakehouse_spark.llm import (
    curation,
    dedup,
    multimodal,
    similarity,
    textstats,
    tokenizer,
)
from us_dot_flights_lakehouse_spark.llm.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_K,
    MINHASH_PRIME,
    SIMHASH_BANDS,
    SIMHASH_BITS,
)
from us_dot_flights_lakehouse_spark.functions.text import (
    hash28,
    shingles,
    tokenize,
)
from us_dot_flights_lakehouse_spark.sources.readers import read_corpus, read_table

# corpus-calibrated thresholds (see module docstring)
JACCARD_THRESHOLD = 0.02
COSINE_THRESHOLD = 0.45
SIMHASH_MAX_HAMMING = 4
TOPK_K = 5
N_QUERY_VECS = 8


def _duck_doubles(vals) -> str:
    """DuckDB array<double> literal via per-element string parse: a bare
    numeric literal types as DECIMAL and double-rounds en route to
    DOUBLE (ULP drift vs the Spark-side `1.23D` literals); CAST from the
    shortest-repr string is correctly rounded — bit-identical."""
    return "[" + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) + "]"



# shared SQL fragments ------------------------------------------------------

_TOKENS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
#: distinct 3-token shingles of the token array t (1-based list indexing)
_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 1, 1)),"
    " i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)
_HASH28 = "('0x' || substr(md5({x}), 1, 7))::BIGINT"


def _sig_mins_sql() -> str:
    return ",\n    ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )


def _band_keys_sql() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    keys = []
    for band in range(MINHASH_BANDS):
        cols = ", ".join(f"mh{band * rows + r}" for r in range(rows))
        keys.append(f"({band}, concat_ws('|', {cols}))")
    return ", ".join(keys)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # read_table: one regex+md5 per row is map-side-cheap, and the
    # repartition's full-text shuffle cost 3x the whole query (0.3s vs
    # 1.0s at sf0.1) — read_corpus's fan-out is for the shingling family
    docs = read_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(docs)


DD_EXACT_ORACLE = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 20% deterministic sample bounds the inverted-index join at bench scale
    docs = read_corpus(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return dedup.ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)


DD_NGRAM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents WHERE doc_id % 5 = 0)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY 1),
com AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT ia AS doc_id_a, ib AS doc_id_b,
       CAST(c AS DOUBLE) / CAST(x.n_sh + y.n_sh - c AS DOUBLE) AS jaccard
FROM com JOIN cnt x ON ia = x.doc_id JOIN cnt y ON ib = y.doc_id
WHERE CAST(c AS DOUBLE) / CAST(x.n_sh + y.n_sh - c AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


CONTAINMENT_THRESHOLD = 0.08


CONTAINMENT_MAX_DF = 50


def dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: containment near-dup pairs — c / min(|A|, |B|) over shingle
    sets, the asymmetric detector for subset/prefix duplicates that
    symmetric Jaccard misses (llm/dedup.py::containment_pairs). Same 20%
    deterministic sample and inverted-index bound as dd_ngram_jaccard,
    PLUS the stop-shingle cap (document frequency > {CONTAINMENT_MAX_DF}
    drops the shingle): a shingle in f docs emits f² candidate rows, and
    the r5 stress measured the uncapped path at 88× work for 10× rows —
    the cap is the documented semantics, mirrored in the oracle, not a
    sampling shortcut."""
    docs = read_corpus(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return dedup.containment_pairs(
        docs,
        threshold=CONTAINMENT_THRESHOLD,
        max_shingle_freq=CONTAINMENT_MAX_DF,
    )


DD_CONTAIN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents WHERE doc_id % 5 = 0)
), s0 AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hot AS (
  SELECT sh FROM s0 GROUP BY sh HAVING COUNT(*) > {CONTAINMENT_MAX_DF}
),
s AS (SELECT doc_id, sh FROM s0 ANTI JOIN hot USING (sh)),
cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM s GROUP BY 1),
com AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT ia AS doc_id_a, ib AS doc_id_b,
       CAST(c AS DOUBLE) / CAST(least(x.n_sh, y.n_sh) AS DOUBLE) AS containment
FROM com JOIN cnt x ON ia = x.doc_id JOIN cnt y ON ib = y.doc_id
WHERE CAST(c AS DOUBLE) / CAST(least(x.n_sh, y.n_sh) AS DOUBLE)
      >= {CONTAINMENT_THRESHOLD}
"""


def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)


DD_MINHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hashed AS (SELECT doc_id, {_HASH28.format(x='sh')} AS h FROM s),
sig AS (
  SELECT doc_id,
    {_sig_mins_sql()}
  FROM hashed GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.band_id, b.band_key
  FROM sig, (VALUES {_band_keys_sql()}) AS b(band_id, band_key)
), cand AS (
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT ia AS doc_id_a, ib AS doc_id_b,
       CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
         / CAST(len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs)) AS DOUBLE) AS jaccard
FROM cand JOIN d da ON cand.ia = da.doc_id JOIN d db ON cand.ib = db.doc_id
WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        / CAST(len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs)) AS DOUBLE)
      >= {JACCARD_THRESHOLD}
"""


def dd_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return dedup.simhash_values(docs).select(
        F.col("id").alias("doc_id"), "simhash"
    )


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    value = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
), hashed AS (SELECT doc_id, {_HASH28.format(x='tok')} AS h FROM toks),
sig AS (
  SELECT doc_id,
    {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, {value} AS simhash FROM sig
"""


def dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=SIMHASH_MAX_HAMMING)


def _simhash_pairs_oracle() -> str:
    bits_per_band = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << bits_per_band) - 1
    bands = ", ".join(
        f"({b}, (simhash >> {b * bits_per_band}) & {mask})" for b in range(SIMHASH_BANDS)
    )
    return f"""
WITH sig AS ({_simhash_oracle().strip()}),
bands AS (
  SELECT doc_id, simhash, b.band_id, b.band_val
  FROM sig, LATERAL (SELECT * FROM (VALUES {bands}) v(band_id, band_val)) b
), cand AS (
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_val = y.band_val AND x.doc_id < y.doc_id
)
SELECT ia AS doc_id_a, ib AS doc_id_b, hamming
FROM cand WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_corpus(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(emb, threshold=COSINE_THRESHOLD)


_VEC_NORM = "sqrt(list_sum(list_transform(v, x -> x * x)))"

DD_EMB_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)
      >= {COSINE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.cosine_topk(emb, qs, k=TOPK_K)


SIM_TOPK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: maximum inner-product search (MIPS) — top-k by RAW dot
    product, not cosine: the retrieval objective for models trained with
    un-normalized scores (recommendation towers, some dual encoders),
    where vector magnitude IS signal. Same broadcast-queries x one-scan
    shape as cosine_topk; only the score changes."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    probes = corpus.filter(F.col("id") < N_QUERY_VECS).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .filter(F.col("qid") != F.col("id"))
        .select("qid", "id", dot.alias("ip"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("ip"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOPK_K)
        .select(
            F.col("qid").alias("query_id"), "rank", F.col("id").alias("neighbor_id")
        )
    )


SIM_MIPS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) AS ip
  FROM e q JOIN e c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY ip DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (llm/similarity.py): per anchor,
    the top-k most-similar vectors with a different label — one broadcast
    × corpus-scan pass, label filter fused into the scan stage."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.hard_negatives(emb, qs, k=TOPK_K)


SIM_HARDNEG_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, label, v, {_VEC_NORM} AS nrm FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON q.vec_id != c.vec_id AND q.label != c.label
  WHERE q.vec_id < {N_QUERY_VECS}
)
SELECT query_id, rank, neighbor_id, neighbor_label FROM (
  SELECT query_id, neighbor_id, neighbor_label,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


def tp_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: class-balance downsampling over the embeddings table — every
    label clamped to the smallest class's size, membership by the
    deterministic hash28 order (llm/curation.py::label_balance)."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return curation.label_balance(emb)


TP_BALANCE_ORACLE = """
WITH ranked AS (
  SELECT vec_id, label,
         CAST(row_number() OVER (
           PARTITION BY label
           ORDER BY ('0x' || substr(md5('bal:' || CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT ASC,
                    vec_id ASC
         ) AS INTEGER) AS rank_in_label
  FROM embeddings
), m AS (
  SELECT min(n) AS min_n FROM (
    SELECT count(*) AS n FROM embeddings GROUP BY label
  )
)
SELECT vec_id, label, rank_in_label FROM ranked, m
WHERE rank_in_label <= m.min_n
"""


IVF_NLIST = 16
IVF_NPROBE = 4
IVF_SEED = 42


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer) approximate top-k. Oracle-able:
    the quantizer trains driver-side with seeded numpy Lloyd's on a
    deterministic sample, so ``_ivf_oracle`` re-derives the SAME
    centroids from the parquet (shared similarity.train_centroids code)
    and embeds them as DuckDB double-list literals — assignment, probe
    ranking, and cosine scoring are all sequential folds on both sides."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ivf_cosine_topk(
        emb, qs, k=TOPK_K, nlist=IVF_NLIST, nprobe=IVF_NPROBE, seed=IVF_SEED
    )


def _ivf_oracle() -> str:
    """Literal-centroid DuckDB oracle for sim_ivf_topk (the plane-literal
    technique from SIM_LSH_ORACLE, but data-dependent: centroids are
    re-trained from the parquet at oracle-build time via the shared numpy
    code path, then emitted as shortest-round-trip double literals).
    Resolved lazily by queries.oracle_sql(); the sf dir comes from
    $SPARK_GRAFT_ORACLE_SF_DIR (driver checks run at sf0.01)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    cents = similarity.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", nlist=IVF_NLIST, seed=IVF_SEED
    )
    rows = []
    for j, c in enumerate(cents.tolist()):
        rows.append(f"SELECT {j} AS cell_id, {_duck_doubles(c)} AS c")
    cents_sql = "\n  UNION ALL ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e),
cents AS (
  {cents_sql}
), assigned AS (
  SELECT vec_id, v, nrm, cell_id FROM (
    SELECT n.vec_id, n.v, n.nrm, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> (n.v[i] - c.c[i]) * (n.v[i] - c.c[i]))) ASC,
             c.cell_id ASC) AS rn
    FROM n CROSS JOIN cents c
  ) WHERE rn = 1
), probe AS (
  SELECT vec_id AS qid, v AS qv, nrm AS qnrm, cell_id FROM (
    SELECT n.vec_id, n.v, n.nrm, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
             list_sum(list_transform(range(1, 65), i -> n.v[i] * c.c[i]))
               / (n.nrm * sqrt(list_sum(list_transform(c.c, x -> x * x)))) DESC,
             c.cell_id ASC) AS cr
    FROM n CROSS JOIN cents c
    WHERE n.vec_id < {N_QUERY_VECS}
  ) WHERE cr <= {IVF_NPROBE}
), scored AS (
  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
         CAST(a.cell_id AS INTEGER) AS cell_id,
         list_sum(list_transform(range(1, 65), i -> p.qv[i] * a.v[i])) / (p.qnrm * a.nrm) AS cos
  FROM probe p JOIN assigned a ON p.cell_id = a.cell_id AND p.qid != a.vec_id
)
SELECT query_id, rank, neighbor_id, cell_id FROM (
  SELECT query_id, neighbor_id, cell_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


PQ_SEED = 42
PQ_DIM = 64


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k. Oracle-able the same way as IVF:
    per-subspace codebooks train driver-side with seeded numpy Lloyd's
    on the deterministic sample, so ``_pq_oracle`` re-derives the SAME
    codebooks from the parquet (shared similarity.train_pq_codebooks)
    and embeds them as DuckDB double-list literals — encoding argmin,
    reconstruction, and the left-associated subspace distance sum are
    sequential folds on both sides."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.pq_cosine_topk(emb, qs, k=TOPK_K, dim=PQ_DIM, seed=PQ_SEED)


def _pq_oracle() -> str:
    """Literal-codebook DuckDB oracle for sim_pq_topk (the literal-
    centroid technique from _ivf_oracle, per subspace): codebooks are
    re-trained from the parquet at oracle-build time via the shared
    numpy path, then emitted as DOUBLE[] literals keyed (sub, code).
    Encoding = per-(vector, subspace) argmin; scoring joins the m chosen
    codewords wide and sums the per-subspace folds textually left-to-
    right, matching the Spark Column ``+`` chain bit-for-bit."""
    import os

    from us_dot_flights_lakehouse_spark.llm.similarity import PQ_KSUB, PQ_M

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    books = similarity.pq_codebooks_from_parquet(
        f"{sf_dir}/embeddings.parquet", dim=PQ_DIM, seed=PQ_SEED
    )
    dsub = PQ_DIM // PQ_M
    rows = []
    for j, book in enumerate(books):
        for c, cent in enumerate(book.tolist()):
            lit = _duck_doubles(cent)
            rows.append(
                f"SELECT {j} AS sub, {c} AS code, {lit} AS c"
            )
    cents_sql = "\n  UNION ALL ".join(rows)
    code_cols = ", ".join(
        f"MAX(CASE WHEN sub = {j} THEN code END) AS code{j}" for j in range(PQ_M)
    )
    cw_joins = "\n  ".join(
        f"JOIN cents c{j} ON c{j}.sub = {j} AND c{j}.code = w.code{j}"
        for j in range(PQ_M)
    )
    sub_dists = [
        f"list_sum(list_transform(range(1, {dsub + 1}), "
        f"i -> (q.v[{j * dsub} + i] - c{j}.c[i]) * (q.v[{j * dsub} + i] - c{j}.c[i])))"
        for j in range(PQ_M)
    ]
    adc = " + ".join(sub_dists)
    return f"""
WITH e0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), e AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS v
  FROM e0
),
cents AS (
  {cents_sql}
), assigned AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
             list_sum(list_transform(range(1, {dsub + 1}),
               i -> (e.v[c.sub * {dsub} + i] - c.c[i]) * (e.v[c.sub * {dsub} + i] - c.c[i]))) ASC,
             c.code ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
), wide AS (
  SELECT vec_id, {code_cols} FROM assigned GROUP BY vec_id
), scored AS (
  SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         {adc} AS adc
  FROM e q
  CROSS JOIN wide w
  {cw_joins}
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id != w.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
"""


RP_OUT_DIM = 16
RP_FIRST_PLANE = 1000


def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> 16 dims, exploded to one row per
    output component so the hash compares scalar doubles (not list
    formatting). Planes come from the deterministic md5 family, emitted
    as SQL literals by the oracle — the plane-literal technique from
    sim_lsh_topk applied to dimensionality reduction."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    proj = similarity.random_project(
        emb, out_dim=RP_OUT_DIM, dim=64, first_plane=RP_FIRST_PLANE
    )
    return proj.select(
        F.col("id").alias("vec_id"),
        F.posexplode("proj").alias("k", "proj"),
    )


def _rp_oracle() -> str:
    from us_dot_flights_lakehouse_spark.llm.similarity import _plane

    rows = []
    for k in range(RP_OUT_DIM):
        rows.append(f"SELECT {k} AS k, {_duck_doubles(_plane(RP_FIRST_PLANE + k, 64))} AS p")
    planes_sql = "\n  UNION ALL ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), planes AS (
  {planes_sql}
)
SELECT e.vec_id, CAST(pl.k AS INTEGER) AS k,
       list_sum(list_transform(range(1, 65), i -> pl.p[i] * e.v[i])) AS proj
FROM e CROSS JOIN planes pl
"""


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate (LSH-bucketed) top-k. Oracle-able after all: the
    hyperplane family is deterministic md5 (similarity._plane), so the
    oracle embeds the 8 plane vectors as DuckDB double-list literals and
    replicates sign-bit bucketing + exact in-bucket cosine rank. Both
    engines fold the projection left-to-right over doubles (list_sum vs
    F.aggregate — bit-identical, proven by SIM_TOPK_ORACLE), so the sign
    decisions agree exactly."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.lsh_cosine_topk(emb, qs, k=TOPK_K, dim=64)


def _lsh_planes_sql(
    dim: int = 64, n_planes: int = similarity.LSH_PLANES, n_tables: int = 1
) -> str:
    """The deterministic hyperplane family as a DuckDB inline relation:
    one row per plane with its hash table id, bit weight, and double[]
    literal (table t uses family planes [t*n_planes, (t+1)*n_planes) —
    the lsh_bucket(first_plane=...) contract). Python's repr() is
    shortest-round-trip, so DuckDB parses the exact doubles Spark uses."""
    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            j = t * n_planes + p
            lit = _duck_doubles(similarity._plane(j, dim))
            rows.append(
                f"SELECT {t} AS t, {2 ** p} AS w, {lit} AS plane"
            )
    return "\n  UNION ALL ".join(rows)


SIM_LSH_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e),
planes AS (
  {{planes}}
), b AS (
  SELECT n.vec_id, n.v, n.nrm,
         CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65), i -> n.v[i] * p.plane[i])) > 0
                       THEN p.w ELSE 0 END) AS INTEGER) AS bucket
  FROM n CROSS JOIN planes p
  GROUP BY n.vec_id, n.v, n.nrm
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
)
SELECT query_id, rank, neighbor_id, bucket FROM (
  SELECT query_id, neighbor_id, bucket,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
""".format(planes=_lsh_planes_sql())


LSH_MP_PROBES = 4


def sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: base bucket + the 3 lowest-margin bit-flip
    buckets per query (Lv et al. single-bit perturbations). Same bucketed
    corpus layout as sim_lsh_topk; recall rises with no index rebuild.
    Oracle replicates the probe-set construction with the same literal
    planes: projections, margin ranking (abs(proj), bit-weight ties),
    XOR flips — all sequential-fold doubles on both engines."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.lsh_cosine_topk_multiprobe(
        emb, qs, k=TOPK_K, dim=64, n_probes=LSH_MP_PROBES
    )


SIM_LSH_MP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e),
planes AS (
  {{planes}}
), b AS (
  SELECT n.vec_id, n.v, n.nrm,
         CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65), i -> n.v[i] * p.plane[i])) > 0
                       THEN p.w ELSE 0 END) AS INTEGER) AS bucket
  FROM n CROSS JOIN planes p
  GROUP BY n.vec_id, n.v, n.nrm
), projq AS (
  SELECT n.vec_id, p.w,
         list_sum(list_transform(range(1, 65), i -> n.v[i] * p.plane[i])) AS proj
  FROM n CROSS JOIN planes p
  WHERE n.vec_id < {N_QUERY_VECS}
), flips AS (
  SELECT vec_id, w,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY abs(proj) ASC, w ASC) AS mr
  FROM projq
), probes AS (
  SELECT vec_id, bucket AS pb FROM b WHERE vec_id < {N_QUERY_VECS}
  UNION ALL
  SELECT f.vec_id, CAST(xor(q.bucket, f.w) AS INTEGER) AS pb
  FROM flips f JOIN b q ON f.vec_id = q.vec_id
  WHERE f.mr <= {LSH_MP_PROBES - 1}
), scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, c.bucket,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
  FROM probes p
  JOIN b q ON p.vec_id = q.vec_id
  JOIN b c ON c.bucket = p.pb AND p.vec_id != c.vec_id
)
SELECT query_id, rank, neighbor_id, bucket FROM (
  SELECT query_id, neighbor_id, bucket,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOPK_K}
""".format(planes=_lsh_planes_sql())


def sim_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: LSH recall audit — completes the recall-audit family (IVF and
    PQ already have one): per query, how many exact brute-force
    top-{TOPK_K} neighbors the single-bucket LSH and the
    {LSH_MP_PROBES}-probe multi-probe variant each recovered. The table
    quantifies exactly what multi-probing buys (recall lift at zero
    index-rebuild cost) — the measurement that justifies probe-count
    tuning in production.

    Scale: three broadcast-probe retrievals over one corpus scan; the
    audit joins touch k rows per query."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = similarity.cosine_topk(emb, qs, k=TOPK_K).select(
        "query_id", "neighbor_id"
    )
    base = similarity.lsh_cosine_topk(emb, qs, k=TOPK_K, dim=64).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit_b")
    )
    mp = similarity.lsh_cosine_topk_multiprobe(
        emb, qs, k=TOPK_K, dim=64, n_probes=LSH_MP_PROBES
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit_m"))
    joined = exact.join(base, ["query_id", "neighbor_id"], "left").join(
        mp, ["query_id", "neighbor_id"], "left"
    )
    nb = F.sum(F.coalesce(F.col("hit_b"), F.lit(0)).cast("bigint")).cast(
        "bigint"
    )
    nm = F.sum(F.coalesce(F.col("hit_m"), F.lit(0)).cast("bigint")).cast(
        "bigint"
    )
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        nb.alias("n_base"),
        nm.alias("n_multiprobe"),
        (nb.cast("double") / F.count("*").cast("double")).alias("recall_base"),
        (nm.cast("double") / F.count("*").cast("double")).alias(
            "recall_multiprobe"
        ),
    )


def _lsh_recall_oracle() -> str:
    return f"""
WITH exact_k AS ({SIM_TOPK_ORACLE}),
base_k AS ({SIM_LSH_ORACLE}),
mp_k AS ({SIM_LSH_MP_ORACLE}),
joined AS (
  SELECT e.query_id, e.neighbor_id,
         CASE WHEN b.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit_b,
         CASE WHEN m.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit_m
  FROM exact_k e
  LEFT JOIN base_k b
    ON e.query_id = b.query_id AND e.neighbor_id = b.neighbor_id
  LEFT JOIN mp_k m
    ON e.query_id = m.query_id AND e.neighbor_id = m.neighbor_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(hit_b) AS BIGINT) AS n_base,
       CAST(sum(hit_m) AS BIGINT) AS n_multiprobe,
       CAST(sum(hit_b) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_base,
       CAST(sum(hit_m) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS recall_multiprobe
FROM joined GROUP BY query_id
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def ts_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.text_stats(docs)


TS_STATS_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
    CAST(length(text) AS INTEGER) AS n_chars,
    CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct({_TOKENS})) AS INTEGER) AS n_unique_tokens,
    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS INTEGER) AS n_nonspace_chars,
    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_punct,
    CAST(len(list_filter({_TOKENS}, t -> t IN ('the','and','of','to','in','is','it','you','that','for'))) AS INTEGER) AS n_stopwords,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT *,
  CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS token_diversity,
  CAST(n_nonspace_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
  CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
  (CASE WHEN n_tokens >= 20 AND n_tokens <= 80 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
   + CASE WHEN CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.3 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
   + CASE WHEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) < 0.1 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
  ) AS quality_score
FROM base
"""


def ts_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.lang_id(docs)


def _lang_oracle() -> str:
    from us_dot_flights_lakehouse_spark.llm.textstats import LANG_LEXICONS

    counts = ",\n    ".join(
        "CAST(len(list_filter({t}, t -> t IN ({ws}))) AS INTEGER) AS c_{lang}".format(
            t=_TOKENS, ws=", ".join(f"'{w}'" for w in lex), lang=lang
        )
        for lang, lex in LANG_LEXICONS.items()
    )
    return f"""
WITH scored AS (
  SELECT doc_id,
    {counts}
  FROM documents
)
SELECT *,
  CASE
    WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
    WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
    WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
    WHEN c_de > 0 THEN 'de'
    ELSE 'und'
  END AS lang_pred
FROM scored
"""


# ---------------------------------------------------------------------------
# Composite: end-to-end corpus curation
# ---------------------------------------------------------------------------

QUALITY_CUTOFF = 0.7


def tp_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE lazy plan: language-ID →
    quality gate → exact-dedup keeper selection → curated corpus with
    per-language stats. Composition stays a single Catalyst plan — the
    lang/quality/fingerprint expressions all fuse into the scan projection,
    and the only shuffles are the dedup groupBy and the final rollup."""
    docs = read_corpus(spark, sf_dir, "documents")
    stats = textstats.text_stats(docs)  # has quality_score + fingerprint
    langs = textstats.lang_id(docs).select("doc_id", "lang_pred")
    scored = stats.join(langs, "doc_id").filter(
        F.col("quality_score") >= QUALITY_CUTOFF
    )
    keepers = (
        scored.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"))
        .select("keeper_doc_id")
    )
    curated = scored.join(
        keepers, scored["doc_id"] == keepers["keeper_doc_id"], "left_semi"
    )
    return curated.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
    )


def _curation_oracle() -> str:
    # rebuild the per-doc stats the Spark side computes, then apply the
    # same gate + dedup + rollup (fragments shared with ts_* oracles)
    return f"""
WITH base AS (
  SELECT doc_id,
    CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct({_TOKENS})) AS INTEGER) AS n_unique_tokens,
    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INTEGER) AS n_punct,
    CAST(length(text) AS INTEGER) AS n_chars,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
    CAST(len(list_filter({_TOKENS}, t -> t IN ('the','and','of','to','in','is','it','you','that','for'))) AS INTEGER) AS c_en,
    CAST(len(list_filter({_TOKENS}, t -> t IN ('el','la','de','que','y','en','un','es','se','no'))) AS INTEGER) AS c_es,
    CAST(len(list_filter({_TOKENS}, t -> t IN ('le','la','de','et','les','des','un','une','du','est'))) AS INTEGER) AS c_fr,
    CAST(len(list_filter({_TOKENS}, t -> t IN ('der','die','und','das','den','von','zu','mit','sich','auf'))) AS INTEGER) AS c_de
  FROM documents
), scored AS (
  SELECT *,
    (CASE WHEN n_tokens >= 20 AND n_tokens <= 80 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.3 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) < 0.1 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    ) AS quality_score,
    CASE
      WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
      WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
      WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
      WHEN c_de > 0 THEN 'de'
      ELSE 'und'
    END AS lang_pred
  FROM base
), gated AS (
  SELECT * FROM scored WHERE quality_score >= {QUALITY_CUTOFF}
), keepers AS (
  SELECT MIN(doc_id) AS keeper_doc_id FROM gated GROUP BY fingerprint
)
SELECT lang_pred,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM gated WHERE doc_id IN (SELECT keeper_doc_id FROM keepers)
GROUP BY lang_pred
"""


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------

#: doc_id % 5 -> synthetic magic prefix (hex) and the media type it decodes to
_MM_MAGIC = (
    ("89504E47", "image/png"),
    ("FFD8FFE0", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),
    ("1A45DFA3", "video/webm"),
)


def _synthetic_payload() -> "F.Column":
    """Deterministic binary payload: a real media magic prefix (by
    doc_id % 5) followed by the UTF-8 text bytes — exercises the binary
    column path without shipping codecs."""
    magic = F.lit(_MM_MAGIC[-1][0])
    for i, (hexmagic, _) in enumerate(_MM_MAGIC[:-1]):
        magic = F.when(F.col("doc_id") % 5 == i, hexmagic).otherwise(magic)
    return F.concat(F.unhex(magic), F.encode(F.col("text"), "UTF-8"))


def mm_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: typed-metadata manifest over an opaque binary media column —
    magic-byte type sniffing (pure Column CASE, JVM-side) + payload size.
    The oracle recomputes the type from the same hex prefix in SQL."""
    docs = read_corpus(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_payload().alias("payload")
    )
    manifest = multimodal.with_media_metadata(docs)
    return manifest.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


def _mm_manifest_oracle() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{mtype}'" for i, (_, mtype) in enumerate(_MM_MAGIC)
    )
    return f"""
SELECT doc_id,
       CASE doc_id % 5 {cases} END AS media_type,
       CAST(4 + octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: Arrow-batched per-partition binary feature extraction
    (mapInPandas) — the real multimodal plumbing path. Oracle-checked on
    the exact integer features (byte count, mean byte — the corpus is
    ASCII so SQL can recompute them character-wise); byte_entropy is
    covered by unit tests (float log2 summation order is not
    cross-engine-stable)."""
    docs = read_corpus(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = multimodal.byte_features(docs, id_col="doc_id", bin_col="payload")
    return feats.select(
        F.col("id").alias("doc_id"), "n_bytes", "mean_byte"
    )


MM_BYTES_ORACLE = """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       CAST(SUM(ord(ch)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_byte
FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
GROUP BY doc_id
"""


def mm_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: header-level image dimension decode — synthesizes structurally
    valid PNG / JPEG(JFIF+SOF0) / GIF headers with dimensions derived from
    doc_id, then recovers them with the codec-free byte-arithmetic parser
    (``multimodal.decode_image_headers``). The oracle recomputes the
    expected dims arithmetically, so a parser offset bug hash-fails."""
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    w = (F.col("doc_id") % 1024 + 16).cast("int")
    h = ((F.col("doc_id") * 7) % 1024 + 16).cast("int")
    be32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    be16 = lambda c: F.lpad(F.hex(c), 4, "0")  # noqa: E731
    le16 = lambda c: F.concat(  # noqa: E731
        F.substring(be16(c), 3, 2), F.substring(be16(c), 1, 2)
    )
    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"), be32(w), be32(h), F.lit("0806000000")
    )
    jpeg = F.concat(
        F.lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
        be16(h),
        be16(w),
        F.lit("03012200021101031101"),
    )
    gif = F.concat(F.lit("474946383961"), le16(w), le16(h), F.lit("F70000"))
    payload = F.unhex(
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, jpeg)
        .otherwise(gif)
    )
    imgs = docs.select("doc_id", payload.alias("payload"))
    dims = multimodal.decode_image_headers(imgs, id_col="doc_id")
    return dims.select(
        F.col("id").alias("doc_id"), "media_type", "width", "height"
    )


MM_DIMS_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'image/jpeg'
                       ELSE 'image/gif' END AS media_type,
       CAST(doc_id % 1024 + 16 AS INTEGER) AS width,
       CAST((doc_id * 7) % 1024 + 16 AS INTEGER) AS height
FROM documents
"""


def mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL pixel-level decode end-to-end — synthesizes an actual 8x8
    grayscale PNG per document (pixel i = (7*doc_id + i) % 256, encoded
    with the stdlib-zlib PNG writer), decodes it back to pixels with the
    codec-free ``multimodal.decode_image`` operator (zlib inflate + numpy
    unfiltering), and aggregates per-image pixel statistics. The oracle
    recomputes the stats from the closed form, so a bug anywhere in the
    encode → chunk-walk → inflate → unfilter → stats chain hash-fails.
    Mean divides by 64 (a power of two), so the double is exact in both
    engines."""
    import numpy as np

    # read_table, not read_corpus: the pixel kernels are microseconds per
    # row, so the 32-way repartition costs more in per-partition Python
    # runner round-trips (3 chained mapInPandas stages) than it buys
    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        for pdf in batches:
            payloads = [
                png_encode(
                    ((7 * int(d) + np.arange(64)) % 256)
                    .astype(np.uint8)
                    .reshape(8, 8),
                    "L",
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_image(imgs)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, mode, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["mode"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8)
                rows.append(
                    (
                        i,
                        int(w),
                        int(h),
                        mode,
                        float(int(a.sum()) / 64),
                        int(a.min()),
                        int(a.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mode",
                    "mean_px",
                    "min_px",
                    "max_px",
                ],
            )

    return decoded.mapInPandas(
        stats,
        schema=(
            "doc_id long, width int, height int, mode string, "
            "mean_px double, min_px int, max_px int"
        ),
    )


MM_PIXEL_ORACLE = """
WITH px AS (
  SELECT doc_id, list_transform(range(0, 64), i -> (7 * doc_id + i) % 256) AS p
  FROM documents
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       'L' AS mode,
       list_sum(p) / 64.0 AS mean_px,
       CAST(list_aggregate(p, 'min') AS INTEGER) AS min_px,
       CAST(list_aggregate(p, 'max') AS INTEGER) AS max_px
FROM px
"""


def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: image resize pipeline end-to-end — synthesizes a 16x16
    grayscale PNG per document (pixel i = (7*doc_id + i) % 256), decodes
    it (real zlib+unfilter path), then CHAINS two resizes: 2x box
    downsample (integer block mean, the thumbnail path) to 8x8 and a
    nearest-neighbor downsample to 4x4 — the composition proves resize
    output re-enters the decoded-image schema. The oracle recomputes the
    final 16 pixels arithmetically (each box mean from its four mod-256
    source values — modular wrap breaks naive linearity, so a stride or
    offset bug anywhere in the chain hash-fails)."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        for pdf in batches:
            payloads = [
                png_encode(
                    ((7 * int(d) + np.arange(256)) % 256)
                    .astype(np.uint8)
                    .reshape(16, 16),
                    "L",
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    small = multimodal.resize_image(
        multimodal.resize_image(multimodal.decode_image(imgs), 8, 8, "box"),
        4,
        4,
        "nearest",
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8).astype(np.int64)
                rows.append((i, int(w), int(h), int(a.sum()), int(a.min()), int(a.max())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_px", "min_px", "max_px"],
            )

    return small.mapInPandas(
        stats,
        schema="doc_id long, width int, height int, sum_px bigint, min_px bigint, max_px bigint",
    )


def mm_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: geometric augmentation chain — 8x8 synth PNG (pixel i =
    (7*doc_id + i) % 256) decoded, then flip_lr ∘ rot90 (which composes
    to a transpose: out(y,x) = orig(x,y)). The output checksum is
    POSITION-WEIGHTED (sum (j+1) * pixel[j]), so any orientation mistake
    — wrong flip axis, clockwise instead of CCW, missing contiguous
    copy — changes the hash even though the multiset of pixels never
    does."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        for pdf in batches:
            payloads = [
                png_encode(
                    ((7 * int(d) + np.arange(64)) % 256)
                    .astype(np.uint8)
                    .reshape(8, 8),
                    "L",
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    out = multimodal.transform_image(
        multimodal.transform_image(multimodal.decode_image(imgs), "flip_lr"),
        "rot90",
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8).astype(np.int64)
                weighted = int((a * (np.arange(a.size) + 1)).sum())
                rows.append((i, int(w), int(h), weighted))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "weighted_sum"]
            )

    return out.mapInPandas(
        stats, schema="doc_id long, width int, height int, weighted_sum bigint"
    )


# flip_lr then rot90(CCW) on a square image is the transpose:
# out(y, x) = orig(x, y) = (7*doc_id + 8*x + y) % 256
MM_AUGMENT_ORACLE = """
WITH px AS (
  SELECT doc_id,
    list_transform(range(0, 64),
                   j -> (7 * doc_id + 8 * (j % 8) + (j // 8)) % 256) AS p
  FROM documents
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(list_sum(list_transform(range(0, 64), j -> p[j + 1] * (j + 1)))
            AS BIGINT) AS weighted_sum
FROM px
"""


def mm_image_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: image cropping — same 16x16 synth PNG as mm_image_resize,
    decoded then center-window-cropped to the 8x8 region at (x0=4, y0=2)
    via ``multimodal.crop_image`` (pure slicing, exact). The oracle
    states each cropped pixel arithmetically: crop(y, x) =
    (7*doc_id + 16*(y+2) + (x+4)) % 256, so an offset/stride bug in the
    slicing hash-fails."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        for pdf in batches:
            payloads = [
                png_encode(
                    ((7 * int(d) + np.arange(256)) % 256)
                    .astype(np.uint8)
                    .reshape(16, 16),
                    "L",
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    cropped = multimodal.crop_image(multimodal.decode_image(imgs), 4, 2, 8, 8)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8).astype(np.int64)
                rows.append(
                    (i, int(w), int(h), int(a.sum()), int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_px", "min_px", "max_px"],
            )

    return cropped.mapInPandas(
        stats,
        schema=(
            "doc_id long, width int, height int, sum_px bigint, "
            "min_px bigint, max_px bigint"
        ),
    )


MM_CROP_ORACLE = """
WITH px AS (
  SELECT doc_id,
    list_transform(range(0, 64),
                   j -> (7 * doc_id + 16 * (j // 8) + (j % 8) + 36) % 256) AS p
  FROM documents
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       CAST(list_sum(p) AS BIGINT) AS sum_px,
       CAST(list_aggregate(p, 'min') AS BIGINT) AS min_px,
       CAST(list_aggregate(p, 'max') AS BIGINT) AS max_px
FROM px
"""


# final 4x4 pixel (y=j//4, x=j%4) <- box mean at 8x8 position (2y, 2x)
# <- 2x2 source block with top-left (4y, 4x) of the 16x16 synth image:
# base = 7*doc_id + 16*(4y) + 4x; mean of the four mod-256 values.
MM_RESIZE_ORACLE = """
WITH px AS (
  SELECT doc_id,
    list_transform(range(0, 16), j -> (
      ((7 * doc_id + 64 * (j // 4) + 4 * (j % 4)) % 256
       + (7 * doc_id + 64 * (j // 4) + 4 * (j % 4) + 1) % 256
       + (7 * doc_id + 64 * (j // 4) + 4 * (j % 4) + 16) % 256
       + (7 * doc_id + 64 * (j // 4) + 4 * (j % 4) + 17) % 256) // 4
    )) AS p
  FROM documents
)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(list_sum(p) AS BIGINT) AS sum_px,
       CAST(list_aggregate(p, 'min') AS BIGINT) AS min_px,
       CAST(list_aggregate(p, 'max') AS BIGINT) AS max_px
FROM px
"""


def mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL baseline-JPEG decode end-to-end — synthesizes a 16x16
    grayscale JPEG per document (four 8x8 constant blocks, block b =
    2*((7*doc_id + 37*b) % 128)) with the pure-numpy encoder, decodes it
    back through ``decode_image``'s jpeg path (huffman entropy decode →
    dequant → IDCT), and aggregates pixel stats. Even-valued constant
    blocks quantize EXACTLY under the Annex K table (DC = (c-128)/2, all
    ACs zero), so the decode is bit-lossless and the oracle recomputes
    the stats from the closed form — any bug in either direction of the
    huffman/quant/DCT chain hash-fails. Mean divides by 256 (power of
    two): exact double both engines.

    read_corpus, not read_table: the JPEG codec kernel is ~1 ms/row —
    unlike mm_pixel_stats' microsecond PNG kernels, the 32-way
    repartition buys back far more than the Python-runner round-trips
    cost (measured 1.8 -> 1.0 s at sf0.1)."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.jpeg import jpeg_encode_gray

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                img = np.zeros((16, 16), np.uint8)
                for b in range(4):
                    by, bx = divmod(b, 2)
                    img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        2 * ((7 * int(d) + 37 * b) % 128)
                    )
                payloads.append(jpeg_encode_gray(img))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_image(imgs)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, mode, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["mode"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8)
                rows.append(
                    (
                        i,
                        int(w),
                        int(h),
                        mode,
                        float(int(a.sum()) / 256),
                        int(a.min()),
                        int(a.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mode",
                    "mean_px",
                    "min_px",
                    "max_px",
                ],
            )

    return decoded.mapInPandas(
        stats,
        schema=(
            "doc_id long, width int, height int, mode string, "
            "mean_px double, min_px int, max_px int"
        ),
    )


MM_JPEG_ORACLE = """
WITH blocks AS (
  SELECT doc_id,
         list_transform(range(0, 4), b -> 2 * ((7 * doc_id + 37 * b) % 128)) AS c
  FROM documents
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       'L' AS mode,
       list_sum(c) * 64 / 256.0 AS mean_px,
       CAST(list_aggregate(c, 'min') AS INTEGER) AS min_px,
       CAST(list_aggregate(c, 'max') AS INTEGER) AS max_px
FROM blocks
"""


def mm_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL video frame sampling end-to-end — synthesizes a 6-frame
    4x4 uncompressed AVI per document (gray pixel g = (11*doc_id + 17*f
    + 5*i) % 256 on all three channels, 25 fps), samples every 80 ms
    (stride 2 → frames 0/2/4) through ``multimodal.sample_frames``'s
    RIFF-walk + DIB decode, and aggregates per-frame stats. The oracle
    recomputes from the closed form, so the encode → RIFF walk → row
    unpad/flip/BGR swap → sample-stride chain is hash-checked. Mean
    divides by 48 = 3*16 with equal channels → sum/48 is exact."""
    import numpy as np

    # read_table for the same reason as mm_pixel_stats: tiny per-row kernels
    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import avi_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                g = (
                    11 * int(d)
                    + 17 * np.arange(6)[:, None]
                    + 5 * np.arange(16)[None, :]
                ) % 256
                frames = np.repeat(
                    g.astype(np.uint8).reshape(6, 4, 4, 1), 3, axis=3
                )
                payloads.append(avi_encode(frames, us_per_frame=40_000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")
    sampled = multimodal.sample_frames(vids, every_ms=80)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, f, ts, w, h, px in zip(
                pdf["id"], pdf["frame_idx"], pdf["ts_ms"], pdf["width"],
                pdf["height"], pdf["pixels"],
            ):
                a = np.frombuffer(px, np.uint8)
                rows.append(
                    (i, int(f), int(ts), int(w), int(h),
                     float(int(a.sum()) / a.size), int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "ts_ms", "width", "height",
                         "mean_px", "min_px", "max_px"],
            )

    return sampled.mapInPandas(
        stats,
        schema=(
            "doc_id long, frame_idx int, ts_ms long, width int, height int, "
            "mean_px double, min_px int, max_px int"
        ),
    )


MM_FRAME_ORACLE = """
WITH fr AS (SELECT unnest([0, 2, 4]) AS f),
px AS (
  SELECT doc_id, f,
         list_transform(range(0, 16), i -> (11 * doc_id + 17 * f + 5 * i) % 256) AS p
  FROM documents CROSS JOIN fr
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * 40 AS BIGINT) AS ts_ms,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       list_sum(p) / 16.0 AS mean_px,
       CAST(list_aggregate(p, 'min') AS INTEGER) AS min_px,
       CAST(list_aggregate(p, 'max') AS INTEGER) AS max_px
FROM px
"""


def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: audio resampling — decode the synthesized 16-bit PCM WAV
    (same (doc_id*31 + i*7919) % 4001 - 2000 sample formula as
    mm_audio_stats), then decimate 2x with pair-mean averaging (the
    anti-aliasing box filter; integer floor-division keeps every output
    sample exact, the same discipline as the image box resize). The
    oracle recomputes the resampled stream's stats from the closed form,
    so the decode → pair → floordiv chain is hash-checked.

    Scale: per-row Arrow kernels, zero shuffle — resampling runs at scan
    speed, which is what makes decode-resample-train pipelines feasible
    on petabyte audio corpora."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        for pdf in batches:
            payloads = [
                wav_encode(
                    ((int(d) * 31 + np.arange(256) * 7919) % 4001 - 2000).astype(
                        np.int16
                    ),
                    8000,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def resample(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["samples"]):
                v = np.frombuffer(buf, "<i2").astype(np.int64)
                # pair-mean decimation with FLOOR division (numpy //);
                # note DuckDB's // truncates toward zero instead, so the
                # oracle floors explicitly
                out = (v[0::2] + v[1::2]) // 2
                rows.append(
                    (
                        i,
                        int(out.size),
                        4000,
                        int(np.abs(out).sum()),
                        int(out.min()),
                        int(out.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate_hz",
                    "sum_abs", "min_s", "max_s",
                ],
            )

    return decoded.mapInPandas(
        resample,
        schema=(
            "doc_id long, n_samples int, sample_rate_hz int, "
            "sum_abs bigint, min_s bigint, max_s bigint"
        ),
    )


MM_RESAMPLE_ORACLE = """
WITH s AS (
  SELECT doc_id,
         -- numpy's // FLOORS; DuckDB's // truncates toward zero, so the
         -- oracle floors explicitly (pair sums are small: double-exact)
         list_transform(range(0, 128), j ->
           CAST(floor(
             (((doc_id * 31 + (2*j) * 7919) % 4001 - 2000)
              + ((doc_id * 31 + (2*j+1) * 7919) % 4001 - 2000)) / 2.0
           ) AS BIGINT)) AS v
  FROM documents
)
SELECT doc_id,
       CAST(128 AS INTEGER) AS n_samples,
       CAST(4000 AS INTEGER) AS sample_rate_hz,
       CAST(list_sum(list_transform(v, x -> abs(x))) AS BIGINT) AS sum_abs,
       CAST(list_aggregate(v, 'min') AS BIGINT) AS min_s,
       CAST(list_aggregate(v, 'max') AS BIGINT) AS max_s
FROM s
"""


def mm_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: inter-frame motion metric — same synthesized AVI and 80 ms
    sampling as ``mm_frame_stats``, with the decode and the
    consecutive-sample |pixel delta| sums FUSED into one Arrow kernel
    (``multimodal.frame_motion``): a video's frames all live inside its
    one blob, so the metric needs no regroup — zero shuffle, no pixel
    bytes leave the task (VERDICT r4 item 5 replaced the
    sample_frames → groupBy-applyInPandas pipeline that exchanged every
    decoded frame). The oracle recomputes every |pixel(f+2) - pixel(f)|
    from the synth closed form — mod-256 wraparound included, so an
    order-or-offset bug in the sampling hash-fails.

    read_corpus, not read_table: the synth+decode is ~ms of Python per
    row; a single-split scan would serialize it on one core."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import avi_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                g = (
                    11 * int(d)
                    + 17 * np.arange(6)[:, None]
                    + 5 * np.arange(16)[None, :]
                ) % 256
                frames = np.repeat(
                    g.astype(np.uint8).reshape(6, 4, 4, 1), 3, axis=3
                )
                payloads.append(avi_encode(frames, us_per_frame=40_000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")
    return multimodal.frame_motion(vids, every_ms=80).select(
        F.col("id").alias("doc_id"), "n_sampled", "motion_total", "motion_mean"
    )


MM_MOTION_ORACLE = """
WITH d AS (
  SELECT doc_id,
    list_sum(list_transform(range(0, 16), i ->
      abs((11 * doc_id + 17 * 2 + 5 * i) % 256 - (11 * doc_id + 5 * i) % 256)
      + abs((11 * doc_id + 17 * 4 + 5 * i) % 256 - (11 * doc_id + 17 * 2 + 5 * i) % 256)
    )) * 3 AS motion_total
  FROM documents
)
SELECT doc_id,
       CAST(3 AS INTEGER) AS n_sampled,
       CAST(motion_total AS BIGINT) AS motion_total,
       CAST(motion_total AS DOUBLE) / (2 * 48) AS motion_mean
FROM d
"""


SCENE_CUT_THRESHOLD = 1000


def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: shot-boundary (scene-cut) detection — per consecutive
    sampled-frame pair, the total absolute pixel delta and an
    ``is_cut`` verdict (``multimodal.frame_cuts``, the per-pair sibling
    of the fused motion kernel): the clip-splitting signal a video
    pipeline runs before captioning or frame dedup. The synthesized
    6-frame AVI plants ONE scene change at frame (doc_id % 4 + 1): scene
    1 shifts the deterministic gradient by +100 gray levels, all values
    kept < 256 so NO mod-256 wraparound muddies the margin — within-
    scene pairs total 48·9 = 432, the boundary pair 48·109 = 5232, and
    the {SCENE_CUT_THRESHOLD} threshold separates them cleanly. The
    oracle re-derives every pair's delta from the closed form, so a
    sampling-order or offset bug hash-fails.

    Scale: zero shuffle — synth, decode, diffs and thresholding all
    inside one Arrow-batched mapInPandas pass (frame_motion's
    contract)."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import avi_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                cut = int(d) % 4 + 1
                f = np.arange(6)[:, None]
                g = (
                    2 * (int(d) % 8)
                    + 9 * f
                    + 3 * np.arange(16)[None, :]
                    + 100 * (f >= cut)
                )
                frames = np.repeat(
                    g.astype(np.uint8).reshape(6, 4, 4, 1), 3, axis=3
                )
                payloads.append(avi_encode(frames, us_per_frame=40_000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")
    return multimodal.frame_cuts(
        vids, every_ms=40, threshold=SCENE_CUT_THRESHOLD
    ).select(F.col("id").alias("doc_id"), "pair_idx", "diff_total", "is_cut")


MM_SCENE_CUTS_ORACLE = f"""
SELECT doc_id,
       CAST(p AS INTEGER) AS pair_idx,
       CAST(48 * 9 + CASE WHEN p = doc_id % 4 THEN 48 * 100 ELSE 0 END
            AS BIGINT) AS diff_total,
       (48 * 9 + CASE WHEN p = doc_id % 4 THEN 48 * 100 ELSE 0 END)
         > {SCENE_CUT_THRESHOLD} AS is_cut
FROM documents, (SELECT unnest(range(0, 5)) AS p)
"""


def _frame_dedup_pixels(residue: int, frame: int):
    """The deterministic frame pixels shared by mm_frame_dedup's Spark
    synth and its oracle builder — ONE definition so the md5 literals
    can never drift from the kernel."""
    import numpy as np

    g = (7 * residue + 17 * frame + 5 * np.arange(16)) % 256
    return np.repeat(g.astype(np.uint8).reshape(4, 4, 1), 3, axis=2)


def mm_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: cross-video FRAME-level dedup — sampled frames fingerprinted
    by md5 over their raw pixel bytes and clustered corpus-wide: the
    boilerplate-intro / static-logo detector a video pipeline runs
    before captioning (doc-level video dedup misses a shared 5-second
    intro; frame-level catches it). Videos are synthesized so content
    depends only on doc_id mod 16 — every frame recurs across ~n/16
    documents — and the oracle embeds the 48 ground-truth digests
    (computed in Python from the SAME pixel definition), so a decode,
    sampling-order, or byte-layout bug hash-fails. Output: one row per
    distinct frame with its copy count and (min doc, sample) keeper.

    Scale: synth+decode+digest fused in one mapInPandas pass (zero pixel
    bytes shuffle — only 32-char digests reach the groupBy); the rollup
    keys on the digest."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import avi_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                frames = np.stack(
                    [_frame_dedup_pixels(int(d) % 16, f) for f in range(6)]
                )
                payloads.append(avi_encode(frames, us_per_frame=40_000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")

    def digest(batches):
        import hashlib

        from us_dot_flights_lakehouse_spark.llm.multimodal import (
            _sampled_frames,
        )

        for pdf in batches:
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                for s, (*_meta, px) in enumerate(_sampled_frames(blob, 80)):
                    rows.append(
                        (i, s, hashlib.md5(px.tobytes()).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["id", "sample_idx", "frame_md5"])

    frames = vids.mapInPandas(
        digest, schema="id long, sample_idx int, frame_md5 string"
    )
    return frames.groupBy("frame_md5").agg(
        F.count("*").cast("bigint").alias("n_copies"),
        F.min("id").cast("bigint").alias("keeper_doc_id"),
    )


def _frame_dedup_oracle() -> str:
    import hashlib

    rows = []
    for r in range(16):
        for s, f in enumerate((0, 2, 4)):  # 80 ms stride over 40 ms frames
            md5 = hashlib.md5(_frame_dedup_pixels(r, f).tobytes()).hexdigest()
            rows.append(f"({r}, {s}, '{md5}')")
    return f"""
WITH lut(r, s, frame_md5) AS (VALUES {", ".join(rows)}),
frames AS (
  SELECT d.doc_id, l.frame_md5
  FROM documents d JOIN lut l ON l.r = d.doc_id % 16
)
SELECT frame_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM frames GROUP BY 1
"""


def mm_mjpeg_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL compressed-codec frame sampling — synthesizes a 6-frame
    8x8 MJPEG AVI per document ('00dc' chunks, each a baseline JPEG;
    frame f is the constant even gray g = 2*((5*doc_id + 29*f) % 128),
    25 fps), samples every 80 ms (stride 2 → frames 0/2/4) through
    ``sample_frames``'s jpeg path, and aggregates per-frame stats.
    DC-only even-valued frames decode bit-losslessly, so the oracle is
    closed form and the whole RIFF walk → huffman → dequant → IDCT
    chain hash-fails on any defect. Lifts the '00dc is always gated'
    limitation for the dominant MJPEG case.

    read_corpus, not read_table: 6 JPEG encodes + 3 decodes ≈ 2.3 ms of
    Python per row — the single-split scan serializes that on one core
    (measured 4.5 -> 1.3 s at sf0.1 with the 32-way repartition)."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import avi_encode_mjpeg

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                g = 2 * ((5 * int(d) + 29 * np.arange(6)) % 128)
                frames = np.repeat(
                    g.astype(np.uint8)[:, None, None], 64, axis=1
                ).reshape(6, 8, 8)
                payloads.append(avi_encode_mjpeg(frames, us_per_frame=40_000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")
    sampled = multimodal.sample_frames(vids, every_ms=80)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, f, ts, w, h, mode, px in zip(
                pdf["id"], pdf["frame_idx"], pdf["ts_ms"], pdf["width"],
                pdf["height"], pdf["mode"], pdf["pixels"],
            ):
                a = np.frombuffer(px, np.uint8)
                rows.append(
                    (i, int(f), int(ts), int(w), int(h), mode,
                     float(int(a.sum()) / a.size), int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "ts_ms", "width", "height",
                         "mode", "mean_px", "min_px", "max_px"],
            )

    return sampled.mapInPandas(
        stats,
        schema=(
            "doc_id long, frame_idx int, ts_ms long, width int, height int, "
            "mode string, mean_px double, min_px int, max_px int"
        ),
    )


MM_MJPEG_ORACLE = """
WITH fr AS (SELECT unnest([0, 2, 4]) AS f),
g AS (
  SELECT doc_id, f, 2 * ((5 * doc_id + 29 * f) % 128) AS v
  FROM documents CROSS JOIN fr
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * 40 AS BIGINT) AS ts_ms,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       'L' AS mode,
       CAST(v AS DOUBLE) AS mean_px,
       CAST(v AS INTEGER) AS min_px,
       CAST(v AS INTEGER) AS max_px
FROM g
"""


INCR_HISTORY_CUTOFF = 250


def tp_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: INCREMENTAL dedup — the shape a production pipeline actually
    runs: yesterday's corpus is already published (here: doc_id <
    cutoff), today's batch must drop (a) anything colliding with the
    published fingerprint set and (b) within-batch duplicates beyond the
    first. Returns every new-batch doc with its verdict + reason so the
    drop is auditable.

    Scale: the history side reduces to DISTINCT fingerprints and carries
    NO broadcast hint — AQE broadcasts a small history at runtime and
    shuffle-joins a billion-row one (a forced hint would OOM there); the
    production layout buckets history and batch on the fingerprint
    (dedup.publish_history_fingerprints), making the whole verdict
    exchange-free. The within-batch election is one groupBy. Nothing
    rescans the historical corpus text."""
    docs = read_table(spark, sf_dir, "documents")
    from us_dot_flights_lakehouse_spark.functions.text import normalized_fingerprint

    fp = normalized_fingerprint("text").alias("fp")
    history_fps = (
        docs.filter(F.col("doc_id") < INCR_HISTORY_CUTOFF).select(fp).distinct()
    )
    batch = docs.filter(F.col("doc_id") >= INCR_HISTORY_CUTOFF).select("doc_id", fp)
    return dedup.incremental_dedup_verdict(batch, history_fps)


TP_INCR_ORACLE = f"""
WITH fps AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
), hist AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id < {INCR_HISTORY_CUTOFF}
), batch AS (
  SELECT doc_id, fp FROM fps WHERE doc_id >= {INCR_HISTORY_CUTOFF}
), firsts AS (
  SELECT fp, MIN(doc_id) AS first_id FROM batch GROUP BY fp
)
SELECT b.doc_id,
       (h.fp IS NOT NULL) AS dup_of_history,
       b.doc_id != f.first_id AS dup_in_batch,
       (h.fp IS NULL AND b.doc_id = f.first_id) AS keep
FROM batch b
LEFT JOIN hist h ON b.fp = h.fp
JOIN firsts f ON b.fp = f.fp
"""


def tp_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup with a Bloom-filter runtime prefilter
    (operators/bloom.py): definitely-new docs skip the history join
    entirely; only the maybe-set pays it. Shares
    ``tp_incremental_dedup``'s oracle verbatim — the driver's hash match
    IS the proof that the pruning is semantics-preserving."""
    docs = read_table(spark, sf_dir, "documents")
    from us_dot_flights_lakehouse_spark.functions.text import normalized_fingerprint

    fp = normalized_fingerprint("text").alias("fp")
    history_fps = (
        docs.filter(F.col("doc_id") < INCR_HISTORY_CUTOFF).select(fp).distinct()
    )
    batch = docs.filter(F.col("doc_id") >= INCR_HISTORY_CUTOFF).select("doc_id", fp)
    return dedup.incremental_dedup_verdict_bloom(batch, history_fps)


def dd_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: fuzzy incremental dedup — today's batch probed for
    NEAR-duplicates of the published corpus via MinHash band-key
    collisions (llm/dedup.py::incremental_minhash_verdict).
    ``tp_incremental_dedup`` drops exact re-crawls; this is its LSH
    sibling for boilerplate rewrites and near-copies that survive the
    fingerprint check. One row per batch doc with the band-hit count and
    the keep verdict.

    Scale: in production the history side is ``publish_history_band_keys``
    — a bucketed, distinct band-key table that joins exchange-free; here
    both sides derive from the documents table inside one plan (history =
    doc_id < cutoff) so the oracle can replay the whole computation. The
    corpus TEXT is scanned once for signatures at publish time, never at
    probe time."""
    docs = read_corpus(spark, sf_dir, "documents")
    hist_bands = dedup.band_key_rows(
        docs.filter(F.col("doc_id") < INCR_HISTORY_CUTOFF)
    )
    batch_bands = dedup.band_key_rows(
        docs.filter(F.col("doc_id") >= INCR_HISTORY_CUTOFF)
    )
    return dedup.incremental_minhash_verdict(batch_bands, hist_bands).select(
        F.col("id").alias("doc_id"), "n_band_hits", "near_dup_of_history", "keep"
    )


DD_INCR_MINHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {{_SHINGLES}} AS shs
  FROM (SELECT doc_id, {{_TOKENS}} AS t FROM documents)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hashed AS (SELECT doc_id, {{_HASH28}} AS h FROM s),
sig AS (
  SELECT doc_id,
    {{sig_mins}}
  FROM hashed GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.band_id, b.band_key
  FROM sig, (VALUES {{band_keys}}) AS b(band_id, band_key)
), hist AS (
  SELECT DISTINCT band_id, band_key FROM bands
  WHERE doc_id < {INCR_HISTORY_CUTOFF}
), batch AS (
  SELECT doc_id, band_id, band_key FROM bands
  WHERE doc_id >= {INCR_HISTORY_CUTOFF}
)
SELECT b.doc_id,
       CAST(COUNT(h.band_key) AS INTEGER) AS n_band_hits,
       COUNT(h.band_key) >= 1 AS near_dup_of_history,
       COUNT(h.band_key) = 0 AS keep
FROM batch b
LEFT JOIN hist h ON b.band_id = h.band_id AND b.band_key = h.band_key
GROUP BY b.doc_id
"""


def _dd_incr_minhash_oracle() -> str:
    return DD_INCR_MINHASH_ORACLE.format(
        _SHINGLES=_SHINGLES,
        _TOKENS=_TOKENS,
        _HASH28=_HASH28.format(x="sh"),
        sig_mins=_sig_mins_sql(),
        band_keys=_band_keys_sql(),
    )


#: Jaccard grid for the S-curve rows
LSH_TUNE_GRID = (0.1, 0.3, 0.5, 0.7, 0.9)


def _lsh_tune_configs() -> list[tuple[int, int]]:
    """(bands, rows_per_band) factorizations of the MINHASH_K=16 signature."""
    return [(b, MINHASH_K // b) for b in (1, 2, 4, 8, 16)]


def dd_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: LSH parameter planner — for every (bands b, rows r)
    factorization of the {MINHASH_K}-perm signature, the detection
    S-curve P(candidate | jaccard=j) = 1−(1−jʳ)ᵇ on a j grid, the
    approximate threshold (1/b)^(1/r), AND the MEASURED candidate-pair
    load that config would generate on THIS corpus (Σ c·(c−1)/2 over its
    band buckets, from the real MinHash signatures — the join cost a
    banding choice commits you to). The table answers "which (b, r) do I
    ship" with both the theory curve and the empirical price.

    Determinism: S-curve and threshold values are config-only —
    PRECOMPUTED in Python and emitted as literals on BOTH engines (no
    cross-engine pow()); the data-dependent columns are exact BIGINT
    bucket combinatorics plus one double division.

    Scale: signatures once (the corpus-heavy step, shared shape with
    dd_minhash_lsh), then ONE explode of all configs' band keys (31
    rows/doc) into a single two-level aggregate — bucket counting only,
    NO candidate self-join is materialized, no per-config job fan-out
    (the 5-separate-aggregates draft paid 5 job round-trips), and even
    the corpus size rides the same aggregate (n = Σ bucket counts of any
    one band slice — every doc lands in exactly one bucket per band), so
    the whole query is ONE linear plan over one signature pass."""
    docs = read_corpus(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs)

    all_keys = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.lit(band).cast("int").alias("band_id"),
                dedup._band_key("mh", band, r).alias("band_key"),
            )
            for b, r in _lsh_tune_configs()
            for band in range(b)
        ]
    )
    bands = sigs.select(F.explode(all_keys).alias("k")).select("k.*")
    per_config = (
        bands.groupBy("bands", "rows_per_band", "band_id", "band_key")
        .agg(F.count("*").alias("c"))
        .groupBy("bands", "rows_per_band")
        .agg(
            # c(c-1) is even, so DIV 2 is exact — stays BIGINT end to end
            F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
            .cast("bigint")
            .alias("candidate_pairs"),
            F.sum(F.when(F.col("band_id") == 0, F.col("c")))
            .cast("bigint")
            .alias("n_sigs"),
        )
    )

    grid_rows = []
    for b, r in _lsh_tune_configs():
        thr = (1.0 / b) ** (1.0 / r)
        for j in LSH_TUNE_GRID:
            grid_rows.append((b, r, float(thr), float(j), 1.0 - (1.0 - j**r) ** b))
    grid = spark.createDataFrame(
        grid_rows,
        "bands int, rows_per_band int, threshold_approx double, "
        "jaccard double, p_detect double",
    )
    return (
        grid.join(F.broadcast(per_config), ["bands", "rows_per_band"])
        .select(
            "bands",
            "rows_per_band",
            "threshold_approx",
            "jaccard",
            "p_detect",
            "candidate_pairs",
            (
                F.col("candidate_pairs").cast("double")
                / F.expr("CAST(n_sigs * (n_sigs - 1) DIV 2 AS DOUBLE)")
            ).alias("selectivity"),
        )
    )


def _lsh_tuning_oracle() -> str:
    grid_vals = []
    for b, r in _lsh_tune_configs():
        thr = (1.0 / b) ** (1.0 / r)
        for j in LSH_TUNE_GRID:
            p = 1.0 - (1.0 - j**r) ** b
            grid_vals.append(
                f"({b}, {r}, CAST('{thr!r}' AS DOUBLE), "
                f"CAST('{float(j)!r}' AS DOUBLE), CAST('{p!r}' AS DOUBLE))"
            )
    cfg_ctes = []
    for b, r in _lsh_tune_configs():
        keys = ", ".join(
            "({}, concat_ws('|', {}))".format(
                band, ", ".join(f"mh{band * r + i}" for i in range(r))
            )
            for band in range(b)
        )
        cfg_ctes.append(
            f"""
SELECT {b} AS bands, {r} AS rows_per_band,
       CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT) AS candidate_pairs
FROM (
  SELECT band_id, band_key, count(*) AS c
  FROM (SELECT b.band_id, b.band_key
        FROM sig, (VALUES {keys}) AS b(band_id, band_key))
  GROUP BY 1, 2
)"""
        )
    measured = "\nUNION ALL\n".join(cfg_ctes)
    return f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hashed AS (SELECT doc_id, {_HASH28.format(x='sh')} AS h FROM s),
sig AS (
  SELECT doc_id,
    {_sig_mins_sql()}
  FROM hashed GROUP BY doc_id
), np AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM sig
), measured AS ({measured}),
grid(bands, rows_per_band, threshold_approx, jaccard, p_detect) AS (
  VALUES {", ".join(grid_vals)}
)
SELECT g.bands, g.rows_per_band, g.threshold_approx, g.jaccard, g.p_detect,
       m.candidate_pairs,
       CAST(m.candidate_pairs AS DOUBLE)
         / CAST(n * (n - 1) // 2 AS DOUBLE) AS selectivity
FROM grid g
JOIN measured m
  ON g.bands = m.bands AND g.rows_per_band = m.rows_per_band
CROSS JOIN np
"""


TTR_WINDOW = 20  #: tokens per type-token-ratio window


def ts_ttr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: windowed lexical diversity (MATTR-style moving-average
    type-token ratio) — plain TTR collapses with document length, so the
    standard fix averages TTR over fixed {TTR_WINDOW}-token windows:
    the vocabulary-richness quality signal that separates fluent prose
    from keyword-stuffed or template text (complements entropy/Gini/
    readability gates). Per doc: token count, full-doc TTR, number of
    full windows, and the windowed-mean TTR (NULL when the doc is
    shorter than one window).

    Determinism: every window's TTR is distinct-count/window-size from
    exact ints; the mean folds the window ratios SEQUENTIALLY in window
    order inside one array expression — no parallel double sum. Zero
    shuffle: all math is per-row array lambdas over the token array.

    Scale: scan-local (the textstats family contract); window count per
    row is len/{TTR_WINDOW} array slices, linear in document size."""
    docs = read_corpus(spark, sf_dir, "documents")
    toks = tokenize("text")
    n = F.size(toks)
    n_win = F.floor(n / F.lit(TTR_WINDOW)).cast("int")
    win_ttrs = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda w: F.size(
            F.array_distinct(F.slice(toks, w * TTR_WINDOW + 1, TTR_WINDOW))
        ).cast("double")
        / F.lit(float(TTR_WINDOW)),
    )
    mattr = F.when(
        n_win > 0,
        F.aggregate(win_ttrs, F.lit(0.0), lambda acc, x: acc + x)
        / n_win.cast("double"),
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
        ).alias("ttr_full"),
        n_win.alias("n_windows"),
        mattr.alias("mattr"),
    )


TS_TTR_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), d AS (
  SELECT doc_id, t, len(t) AS n, CAST(len(t) // {TTR_WINDOW} AS INTEGER) AS n_win
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS DOUBLE) / CAST(n AS DOUBLE) AS ttr_full,
       n_win AS n_windows,
       CASE WHEN n_win > 0 THEN
         list_sum(list_transform(range(0, n_win),
           w -> CAST(len(list_distinct(t[w * {TTR_WINDOW} + 1 : w * {TTR_WINDOW} + {TTR_WINDOW}])) AS DOUBLE)
                / {float(TTR_WINDOW)!r}))
         / CAST(n_win AS DOUBLE)
       END AS mattr
FROM d
"""


def tp_ranker_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: ROC-AUC of a quality ranker against binary labels via the
    Mann-Whitney rank-sum — the eval every data-selection pipeline runs
    before trusting a scorer to gate training data (here: does raw token
    count separate English docs from the rest?). Ties get AVERAGE ranks,
    the textbook treatment, and the whole statistic is computed in exact
    BIGINT arithmetic: per distinct score s, the tied group's summed
    average rank is pos_s·(2·cum_before_s + n_s + 1)/2, so
    2·Σranks⁺ = Σ pos_s·(2·cum_before + n_s + 1) stays integral;
    AUC = (2Σranks⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) is ONE double division at
    the end — bit-deterministic on any engine or partitioning.

    Scale: one groupBy on the score (cardinality = distinct token
    counts, tiny), one ordered prefix-sum window over that aggregate
    (score-cardinality-sized, NOT corpus-sized — the single-partition
    window is bounded by construction), one 1-row reduce."""
    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.size(tokenize("text")).cast("bigint").alias("score"),
        (F.col("lang") == "en").cast("bigint").alias("pos"),
    )
    by_score = scored.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.sum("pos").cast("bigint").alias("pos_s"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.withColumn(
        "cum_before", F.coalesce(F.sum("n_s").over(w), F.lit(0)).cast("bigint")
    )
    agg = ranked.agg(
        F.sum("pos_s").cast("bigint").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("pos_s")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos_s") * (2 * F.col("cum_before") + F.col("n_s") + 1)
        )
        .cast("bigint")
        .alias("sum2_ranks_pos"),
    )
    auc = (
        F.col("sum2_ranks_pos").cast("double")
        - F.col("n_pos").cast("double") * (F.col("n_pos").cast("double") + 1.0)
    ) / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
    return agg.select("n_pos", "n_neg", "sum2_ranks_pos", auc.alias("auc"))


TP_AUC_ORACLE = f"""
WITH scored AS (
  SELECT CAST(len({_TOKENS}) AS BIGINT) AS score,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS pos
  FROM documents
), by_score AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(pos) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1
), ranked AS (
  SELECT *, CAST(coalesce(sum(n_s) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS cum_before
  FROM by_score
), agg AS (
  SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         CAST(sum(n_s - pos_s) AS BIGINT) AS n_neg,
         CAST(sum(pos_s * (2 * cum_before + n_s + 1)) AS BIGINT)
           AS sum2_ranks_pos
  FROM ranked
)
SELECT n_pos, n_neg, sum2_ranks_pos,
       (CAST(sum2_ranks_pos AS DOUBLE)
          - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0))
       / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
FROM agg
"""


HEAPS_DECILES = 10


def ts_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: vocabulary growth curve (Heaps' law V ≈ K·Tᵝ) over ingest-order
    prefixes — the corpus fingerprint that tells a pipeline whether new
    data still brings new vocabulary (β falling toward 0 = the crawl is
    saturating; near-constant β ≈ 0.5 = healthy heavy-tail growth). For
    each doc-id decile cutoff: cumulative token count T, cumulative
    vocabulary V (distinct tokens whose FIRST occurrence is within the
    prefix), and the local growth exponent β = Δln V / Δln T between
    consecutive deciles (NULL for the first decile and wherever T stalls).

    Everything is exact integers until the per-row ln ratio: V comes
    from a min-doc-id-per-token aggregate (first occurrence), prefix
    sums are {HEAPS_DECILES} conditional sums in ONE pass each (no
    per-decile rescans), cutoffs are integer arithmetic on max(doc_id).

    Scale: two corpus-wide aggregates (token explode → first-occurrence
    groupBy; conditional-sum folds) + a {HEAPS_DECILES}-row self-join.
    Nothing is decile-rescanned; the explode is the cost and it is paid
    once."""
    docs = read_corpus(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    mx = docs.agg(F.max("doc_id").cast("bigint").alias("mx"))

    def cut(d: int):
        return F.expr(f"CAST(mx * {d} DIV {HEAPS_DECILES} AS BIGINT)")

    tok_sums = tok.crossJoin(F.broadcast(mx)).agg(
        *[
            F.sum((F.col("doc_id") <= cut(d)).cast("bigint"))
            .cast("bigint")
            .alias(f"t{d}")
            for d in range(1, HEAPS_DECILES + 1)
        ]
    )
    first_occ = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    voc_sums = first_occ.crossJoin(F.broadcast(mx)).agg(
        *[
            F.sum((F.col("first_doc") <= cut(d)).cast("bigint"))
            .cast("bigint")
            .alias(f"v{d}")
            for d in range(1, HEAPS_DECILES + 1)
        ]
    )
    stack = ", ".join(
        f"{d}, t{d}, v{d}" for d in range(1, HEAPS_DECILES + 1)
    )
    curve = (
        tok_sums.crossJoin(voc_sums)
        .selectExpr(
            f"stack({HEAPS_DECILES}, {stack}) AS "
            "(decile, cum_tokens, vocab)"
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "cum_tokens",
            "vocab",
        )
    )
    prev = curve.select(
        (F.col("decile") + 1).alias("decile"),
        F.col("cum_tokens").alias("t_prev"),
        F.col("vocab").alias("v_prev"),
    )
    beta = F.when(
        (F.col("t_prev").isNotNull())
        & (F.col("cum_tokens") > F.col("t_prev"))
        & (F.col("v_prev") > 0),
        (
            F.log(F.col("vocab").cast("double"))
            - F.log(F.col("v_prev").cast("double"))
        )
        / (
            F.log(F.col("cum_tokens").cast("double"))
            - F.log(F.col("t_prev").cast("double"))
        ),
    )
    return (
        curve.join(F.broadcast(prev), "decile", "left")
        .select("decile", "cum_tokens", "vocab", beta.alias("heaps_beta"))
    )


TS_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
), mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS mx FROM documents),
deciles AS (SELECT unnest(range(1, {HEAPS_DECILES + 1})) AS decile),
cuts AS (
  SELECT CAST(decile AS INTEGER) AS decile,
         CAST(mx * decile // {HEAPS_DECILES} AS BIGINT) AS cut
  FROM deciles, mx
), first_occ AS (
  SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY 1
), curve AS (
  SELECT c.decile,
         (SELECT CAST(count(*) AS BIGINT) FROM tok WHERE doc_id <= c.cut)
           AS cum_tokens,
         (SELECT CAST(count(*) AS BIGINT) FROM first_occ
          WHERE first_doc <= c.cut) AS vocab
  FROM cuts c
)
SELECT a.decile, a.cum_tokens, a.vocab,
       CASE WHEN b.cum_tokens IS NOT NULL AND a.cum_tokens > b.cum_tokens
                 AND b.vocab > 0
            THEN (ln(CAST(a.vocab AS DOUBLE)) - ln(CAST(b.vocab AS DOUBLE)))
                 / (ln(CAST(a.cum_tokens AS DOUBLE))
                    - ln(CAST(b.cum_tokens AS DOUBLE)))
       END AS heaps_beta
FROM curve a LEFT JOIN curve b ON a.decile = b.decile + 1
"""


def dd_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: INCREMENTAL near-dup cluster maintenance — the nightly step
    after ``dd_incremental_minhash``'s verdict: attach the new batch's
    docs to the PUBLISHED history clusters without relabeling history or
    re-running global connected components. History labels are frozen
    (computed here in-plan over history-only pairs so the oracle can
    replay them; in production they are the published cluster table);
    batch docs get components over batch-batch verified pairs only, and
    each component adopts the SMALLEST linked history cluster label
    (cluster continuity) or its own min batch id when it touches
    nothing. A component touching ≥2 history clusters is the classic
    incremental-CC merge candidate — surfaced per doc as
    ``n_history_clusters_touched`` so a periodic full re-cluster can fix
    exactly those, instead of everything.

    Scale: ONE LSH pass over the corpus split three ways (hist-hist /
    cross / batch-batch); the iteration in dup_clusters runs only on the
    BATCH subgraph — the whole point: nightly cost is batch-sized, not
    corpus-sized."""
    docs = read_corpus(spark, sf_dir, "documents")
    cut = INCR_HISTORY_CUTOFF
    # materialize the verified pair set ONCE: four filtered views (hist/
    # batch/two cross orientations) would each re-run the whole LSH
    # candidate+verify pipeline off the lazy plan (measured 33 s -> 9 s)
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=JACCARD_THRESHOLD
    ).localCheckpoint()
    a, b = F.col("doc_id_a"), F.col("doc_id_b")
    pairs_hh = pairs.filter((a < cut) & (b < cut))
    pairs_bb = pairs.filter((a >= cut) & (b >= cut))
    # cross links in both orientations -> (batch_id, hist_id)
    cross = pairs.filter((a < cut) & (b >= cut)).select(
        b.alias("batch_id"), a.alias("hist_id")
    ).unionAll(
        pairs.filter((a >= cut) & (b < cut)).select(
            a.alias("batch_id"), b.alias("hist_id")
        )
    )
    hist_ids = docs.filter(F.col("doc_id") < cut).select("doc_id")
    batch_ids = docs.filter(F.col("doc_id") >= cut).select("doc_id")
    hist_labels = curation.dup_clusters(hist_ids, pairs_hh).select(
        F.col("node").alias("hist_id"), F.col("cluster_id").alias("hist_lbl")
    )
    batch_cc = curation.dup_clusters(batch_ids, pairs_bb).select(
        F.col("node").alias("doc_id"), F.col("cluster_id").alias("comp")
    )
    linked = (
        cross.join(hist_labels, "hist_id")
        .join(batch_cc.withColumnRenamed("doc_id", "batch_id"), "batch_id")
        .groupBy("comp")
        .agg(
            F.min("hist_lbl").cast("bigint").alias("min_hist_lbl"),
            F.count_distinct("hist_lbl").cast("bigint").alias("n_hist"),
        )
    )
    return (
        batch_cc.join(F.broadcast(linked), "comp", "left")
        .select(
            "doc_id",
            F.coalesce("min_hist_lbl", F.col("comp")).cast("bigint").alias(
                "cluster_label"
            ),
            F.col("min_hist_lbl").isNotNull().alias("attached_to_history"),
            F.coalesce("n_hist", F.lit(0)).cast("bigint").alias(
                "n_history_clusters_touched"
            ),
        )
    )


DD_INCR_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({{minhash_pairs}}),
hist_edges AS (
  SELECT doc_id_a AS x, doc_id_b AS y FROM pairs
  WHERE doc_id_a < {INCR_HISTORY_CUTOFF} AND doc_id_b < {INCR_HISTORY_CUTOFF}
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
  WHERE doc_id_a < {INCR_HISTORY_CUTOFF} AND doc_id_b < {INCR_HISTORY_CUTOFF}
),
hist_reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  WHERE doc_id < {INCR_HISTORY_CUTOFF}
  UNION
  SELECT r.src, e.y FROM hist_reach r JOIN hist_edges e ON r.dst = e.x
),
hist_labels AS (
  SELECT src AS hist_id, MIN(dst) AS hist_lbl FROM hist_reach GROUP BY src
),
batch_edges AS (
  SELECT doc_id_a AS x, doc_id_b AS y FROM pairs
  WHERE doc_id_a >= {INCR_HISTORY_CUTOFF} AND doc_id_b >= {INCR_HISTORY_CUTOFF}
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
  WHERE doc_id_a >= {INCR_HISTORY_CUTOFF} AND doc_id_b >= {INCR_HISTORY_CUTOFF}
),
batch_reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  WHERE doc_id >= {INCR_HISTORY_CUTOFF}
  UNION
  SELECT r.src, e.y FROM batch_reach r JOIN batch_edges e ON r.dst = e.x
),
batch_cc AS (
  SELECT src AS doc_id, MIN(dst) AS comp FROM batch_reach GROUP BY src
),
cross_links AS (
  SELECT doc_id_b AS batch_id, doc_id_a AS hist_id FROM pairs
  WHERE doc_id_a < {INCR_HISTORY_CUTOFF} AND doc_id_b >= {INCR_HISTORY_CUTOFF}
  UNION ALL
  SELECT doc_id_a, doc_id_b FROM pairs
  WHERE doc_id_a >= {INCR_HISTORY_CUTOFF} AND doc_id_b < {INCR_HISTORY_CUTOFF}
),
linked AS (
  SELECT bc.comp,
         CAST(MIN(hl.hist_lbl) AS BIGINT) AS min_hist_lbl,
         CAST(COUNT(DISTINCT hl.hist_lbl) AS BIGINT) AS n_hist
  FROM cross_links c
  JOIN hist_labels hl ON c.hist_id = hl.hist_id
  JOIN batch_cc bc ON c.batch_id = bc.doc_id
  GROUP BY bc.comp
)
SELECT b.doc_id,
       CAST(COALESCE(l.min_hist_lbl, b.comp) AS BIGINT) AS cluster_label,
       l.min_hist_lbl IS NOT NULL AS attached_to_history,
       CAST(COALESCE(l.n_hist, 0) AS BIGINT) AS n_history_clusters_touched
FROM batch_cc b LEFT JOIN linked l ON b.comp = l.comp
"""


HH_TOPK = 10


def ts_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: corpus-wide frequent-token detection — the heavy-hitters
    sketch (Spark 4 ``approx_top_k``) next to its exact companion. At
    100 TB the sketch is the only affordable path (fixed-size state,
    single pass, mergeable across partitions: boilerplate tokens /
    template n-grams surface without a full token groupBy); here the
    exact top-k ranking is the oracle-checked output and a boolean
    asserts the sketch reproduced each top token's count (maxItemsTracked
    far exceeds this corpus's vocabulary, so the sketch is provably
    exact on it — the assertion pins that contract)."""
    docs = read_corpus(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("n"))
    ranked = (
        exact.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("tok"))
            ),
        )
        .filter(F.col("rank") <= HH_TOPK)
    )
    sketch = (
        toks.agg(F.expr("approx_top_k(tok, 100, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("tok"), F.col("e.count").alias("n_sketch"))
    )
    return ranked.join(F.broadcast(sketch), "tok", "left").select(
        "rank",
        "tok",
        "n",
        (F.col("n_sketch") == F.col("n")).alias("sketch_ok"),
    )


TS_HH_ORACLE = """
WITH tok AS (SELECT unnest({toks}) AS tok FROM documents),
c AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
r AS (SELECT tok, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS INTEGER) AS rank
      FROM c)
SELECT rank, tok, n, TRUE AS sketch_ok FROM r WHERE rank <= {HH_TOPK}
""".format(toks=_TOKENS, HH_TOPK=HH_TOPK)


def src_wds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC: WebDataset tar-shard format end-to-end on the Python
    DataSource API (sources/wds.py) — export the documents table to tar
    shards (one per partition, WebDataset ``key.member`` naming,
    deterministic bytes), read the shards back (one input partition per
    shard), and project per-member byte lengths. The oracle recomputes
    key/byte-length from the table, so a fault anywhere in the tar
    write → tar scan chain (truncation, naming, payload corruption)
    hash-fails."""
    import tempfile

    from us_dot_flights_lakehouse_spark.sources import wds

    wds.register(spark)
    docs = read_table(spark, sf_dir, "documents")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = f"{tempfile.gettempdir()}/us_dot_wds_{sf_tag}_v1"
    (
        docs.select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
            F.lit("txt").alias("member"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
        .repartition(4)
        .write.format("webdataset")
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("webdataset").load(out)
    return back.select(
        F.col("key").cast("long").alias("doc_id"),
        "member",
        F.length("payload").cast("int").alias("n_bytes"),
    )


SRC_WDS_ORACLE = """
SELECT doc_id, 'txt' AS member,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
FROM documents
"""


def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC: JSON-lines round-trip — export the documents table as JSONL
    (sources/writers.py::write_jsonl), scan it back with the mandatory
    contract schema (readers.py::read_jsonl; no inference pass), and
    project doc metadata + an md5 over the text. The md5 makes the oracle
    sensitive to ANY fidelity loss in JSON escaping/encoding, not just
    lengths."""
    import tempfile

    from us_dot_flights_lakehouse_spark.sources.readers import read_jsonl
    from us_dot_flights_lakehouse_spark.sources.writers import write_jsonl

    docs = read_table(spark, sf_dir, "documents")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = f"{tempfile.gettempdir()}/us_dot_jsonl_{sf_tag}_v1"
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, docs.schema)
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


SRC_JSONL_ORACLE = """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM documents
"""


def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC: ORC round-trip through the built-in native columnar
    reader/writer — same fidelity contract as the JSONL round-trip, plus
    the read-back projection exercises ORC column pruning (only doc_id +
    text + metadata columns are decoded)."""
    import tempfile

    from us_dot_flights_lakehouse_spark.sources.readers import read_orc
    from us_dot_flights_lakehouse_spark.sources.writers import write_orc

    docs = read_table(spark, sf_dir, "documents")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = f"{tempfile.gettempdir()}/us_dot_orc_{sf_tag}_v1"
    write_orc(docs, out)
    back = read_orc(spark, out)
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


SRC_ORC_ORACLE = SRC_JSONL_ORACLE


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression: symmetric int8 scalar quantization with
    per-vector scale + exact reconstruction-error accounting. All
    expression-level (transform/floor/fold) — deterministic across
    engines because floor replaces round and the error sum is a
    sequential left fold."""
    from us_dot_flights_lakehouse_spark.functions.vectors import (
        dequantize_l2_error,
        quantize_int8,
        to_double_array,
    )

    emb = read_corpus(spark, sf_dir, "embeddings")
    v = to_double_array("embedding")
    scale, codes = quantize_int8(v)
    return emb.select(
        "vec_id",
        scale.alias("q_scale"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, c: acc + c.cast("long")
        ).alias("sum_codes"),
        dequantize_l2_error(v, codes, scale).alias("l2_err"),
    )


SIM_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), s AS (
  SELECT vec_id, v,
         127.0 / list_max(list_transform(v, x -> abs(x))) AS q_scale
  FROM e
), q AS (
  SELECT vec_id, v, q_scale,
         list_transform(v, x -> greatest(-127, least(127, CAST(floor(x * q_scale) AS INTEGER)))) AS codes
  FROM s
)
SELECT vec_id, q_scale,
       CAST(list_sum(codes) AS BIGINT) AS sum_codes,
       list_reduce(
         list_transform(list_zip(v, codes),
                        p -> (p[1] - CAST(p[2] AS DOUBLE) / q_scale)
                             * (p[1] - CAST(p[2] AS DOUBLE) / q_scale)),
         (acc, x) -> acc + x) AS l2_err
FROM q
"""


# ---------------------------------------------------------------------------
# Curation: packing / training mix / PII / keywords / cluster resolution
# ---------------------------------------------------------------------------

SEQ_BUDGET = 512
#: training-mix sampling percentages by language (default for the rest)
MIX_RATES = {"en": 80, "es": 60, "fr": 60, "de": 40}
MIX_DEFAULT = 25
TFIDF_K = 3


def tp_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    return curation.pack_sequences(docs, budget=SEQ_BUDGET)


_BPE = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')"

TP_PACK_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({_BPE}) AS BIGINT) AS n_tokens FROM documents
), c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens AS tok_start
  FROM base
)
SELECT doc_id, source, n_tokens,
       CAST(floor(tok_start / {SEQ_BUDGET}) AS BIGINT) AS seq_num,
       CAST(tok_start % {SEQ_BUDGET} AS BIGINT) AS offset_in_seq
FROM c
"""


def tp_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-gated stratified sample -> per-language mix
    report (docs kept, tokens kept vs available)."""
    docs = read_corpus(spark, sf_dir, "documents")
    keep = curation.mix_keep("doc_id", "lang", MIX_RATES, MIX_DEFAULT)
    base = docs.select(
        "lang",
        keep.alias("keep"),
        F.size(textstats.bpe_ish_tokens("text")).cast("bigint").alias("n_bpe"),
    )
    return base.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum(F.when(F.col("keep"), F.col("n_bpe")).otherwise(0))
        .cast("bigint")
        .alias("sampled_tokens"),
    )


def _mix_rate_sql() -> str:
    whens = " ".join(f"WHEN '{lang}' THEN {pct}" for lang, pct in MIX_RATES.items())
    return f"CASE lang {whens} ELSE {MIX_DEFAULT} END"


TP_MIX_ORACLE = f"""
WITH base AS (
  SELECT lang,
         (('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100)
           < {_mix_rate_sql()} AS keep,
         CAST(len({_BPE}) AS BIGINT) AS n_bpe
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN keep THEN n_bpe ELSE 0 END) AS BIGINT) AS sampled_tokens
FROM base GROUP BY lang
"""


def ts_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus with synthesized deterministic PII
    spans (the testdata itself is clean): emails/IPs/phone-shaped runs are
    appended by doc_id residue, then scrubbed and counted."""
    docs = read_corpus(spark, sf_dir, "documents")
    residue = F.col("doc_id") % 4
    pii = (
        F.when(residue == 0, F.concat(F.lit(" mail user"), F.col("doc_id").cast("string"), F.lit("@example.com")))
        .when(residue == 1, F.concat(F.lit(" call +1 (555) 010-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
        .when(residue == 2, F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")))
        .otherwise(F.lit(""))
    )
    seeded = docs.select("doc_id", F.concat(F.col("text"), pii).alias("text"))
    return curation.pii_scrub(seeded)


def _pii_oracle() -> str:
    seeded = """
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
           WHEN 1 THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           WHEN 2 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
           ELSE '' END AS text
  FROM documents
"""
    t0 = "text"
    counts, cur = [], t0
    # DuckDB single-quoted strings are NOT backslash-escaped: pass the
    # regex through verbatim (only SQL-quote escaping)
    for name, pat, repl in curation.PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        counts.append(f"CAST(len(regexp_extract_all({cur}, '{pat_sql}')) AS BIGINT) AS n_{name}")
        cur = f"regexp_replace({cur}, '{pat_sql}', '{repl}', 'g')"
    return f"""
WITH seeded AS ({seeded})
SELECT doc_id, {cur} AS clean_text, {", ".join(counts)}
FROM seeded
"""


def ts_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_corpus(spark, sf_dir, "documents")
    out = curation.tfidf_topk(docs, k=TFIDF_K)
    return out.withColumnRenamed("id", "doc_id")


TS_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
), t2 AS (SELECT * FROM toks WHERE token <> ''),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM t2 GROUP BY 1, 2),
df_ AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM t2 GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token, tf,
         CAST((n_docs * 1000) // doc_freq AS BIGINT) AS idf_milli,
         CAST(tf * ((n_docs * 1000) // doc_freq) AS BIGINT) AS score
  FROM tf JOIN df_ USING (token), n
)
SELECT doc_id, token, tf, idf_milli, score, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
  FROM scored
) WHERE rank <= {TFIDF_K}
"""


def tp_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every doc whose doc_id % 25 == 0 plays
    the 'benchmark set'; the report counts per-doc 3-gram shingle overlap
    with that probe (probe members self-report full contamination)."""
    docs = read_corpus(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 25 == 0)
    return curation.contamination_report(docs, probe).withColumnRenamed(
        "id", "doc_id"
    )


TP_CONTAM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), ds AS (SELECT doc_id, unnest(shs) AS sh FROM d),
ps AS (SELECT DISTINCT unnest(shs) AS sh FROM d WHERE doc_id % 25 = 0),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_probe_hits
  FROM ds JOIN ps USING (sh) GROUP BY 1
)
SELECT d.doc_id,
       CAST(len(shs) AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_probe_hits, 0) AS BIGINT) AS n_probe_hits,
       COALESCE(h.n_probe_hits, 0) > 0 AS contaminated
FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def dd_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs resolved to connected components; every doc gets
    a cluster_id (min doc_id in its component; singletons keep their own).
    Oracle: recursive-CTE transitive closure over the same pair SQL."""
    docs = read_corpus(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
    labels = curation.dup_clusters(docs.select("doc_id"), pairs)
    return labels.withColumnRenamed("node", "doc_id")


DD_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({DD_MINHASH_ORACLE}),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
"""


LINE_CHUNK_WORDS = 8


def dd_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line-level dedup end-to-end. The synthetic corpus
    is single-line, so the query first re-chunks each document into
    deterministic 8-word lines (pure expressions), then runs
    ``dedup.line_dedup``: every repeated line survives only at its first
    (doc, line) occurrence corpus-wide and documents are reassembled
    without the dropped copies — the boilerplate-stripping pass that
    document-level dedup can't express. The corpus's planted near-dup
    documents share word runs, so the dedup genuinely fires."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(LINE_CHUNK_WORDS))
    chunked = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(toks, i * LINE_CHUNK_WORDS + 1, LINE_CHUNK_WORDS), " "
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return dedup.line_dedup(chunked).withColumnRenamed("id", "doc_id")


DD_LINE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), chunked AS (
  SELECT doc_id,
         list_transform(
           range(0, CAST(ceil(len(t) / {LINE_CHUNK_WORDS}.0) AS BIGINT)),
           i -> array_to_string(
                  list_slice(t, i * {LINE_CHUNK_WORDS} + 1, i * {LINE_CHUNK_WORDS} + {LINE_CHUNK_WORDS}),
                  ' ')
         ) AS lines
  FROM d
), l AS (
  SELECT doc_id,
         unnest(lines) AS line,
         unnest(range(0, len(lines))) AS line_idx
  FROM chunked
), occ AS (
  SELECT doc_id, line_idx, line,
         md5(trim(lower(line))) AS h,
         doc_id * 1000000 + line_idx AS pos,
         trim(line) = '' AS blank
  FROM l
), first AS (
  SELECT h, MIN(pos) AS first_pos FROM occ WHERE NOT blank GROUP BY h
), flagged AS (
  SELECT o.doc_id, o.line_idx, o.line,
         (o.blank OR o.pos = f.first_pos) AS kept
  FROM occ o LEFT JOIN first f ON o.h = f.h
)
SELECT doc_id,
       CAST(COUNT(*) AS INTEGER) AS n_lines,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
       coalesce(string_agg(CASE WHEN kept THEN line END, chr(10) ORDER BY line_idx), '') AS text_deduped
FROM flagged GROUP BY doc_id
"""


#: multi-table LSH layout for semantic dedup: 8 tables x 8 planes.
#: At cos>=0.95 recall is 1-(1-p^8)^8 ~ 0.99 (p = 1-arccos(0.95)/pi)
#: while random pairs survive a table w.p. ~2^-8 -> ~3% of n^2 FLOPs.
SEMANTIC_LSH_TABLES = 8
SEMANTIC_LSH_PLANES = 8


def dd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication end-to-end: LSH-pruned
    embedding-cosine near-dup pairs → connected components → keep the
    minimum vec_id per semantic cluster. Returns
    (vec_id, cluster_id, is_keeper) for every vector — downstream filters
    ``is_keeper`` to drop semantic duplicates while keeping the selection
    auditable.

    Scale: the pair stage prunes candidates through 8 independent LSH
    tables and verifies ONLY candidates with exact cosine
    (llm/dedup.py::embedding_neardup_pairs_lsh) — FLOPs and shuffle are
    candidate-bound (~3% of all-pairs at this layout), not O(n²) like the
    exact block cogroup that ``dd_embedding_neardup`` keeps for
    exhaustive-recall runs. The component stage iterates only the pair
    graph, and the keeper flag is a column comparison. The oracle
    replicates the SAME pruning (plane literals in SQL), so recall loss
    is part of the checked semantics, not silent error. Recall profile
    at this layout: ~100% on true duplicates (near-identical vectors
    agree on every sign bit — the SemDeDup target; unit-tested on
    planted dups), partial on borderline 63-degree pairs (for those,
    ``dd_embedding_neardup``'s exact kernel is the tool)."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_neardup_pairs_lsh(
        emb,
        threshold=COSINE_THRESHOLD,
        dim=64,
        n_tables=SEMANTIC_LSH_TABLES,
        n_planes=SEMANTIC_LSH_PLANES,
    )
    labels = curation.dup_clusters(
        emb.select("vec_id"),
        pairs,
        id_col="vec_id",
        a_col="vec_id_a",
        b_col="vec_id_b",
    )
    return labels.select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )


DD_SEMANTIC_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, v, {_VEC_NORM} AS nrm FROM e),
planes AS (
  {{planes}}
), bkt AS (
  SELECT n.vec_id, p.t,
         CAST(SUM(CASE WHEN list_sum(list_transform(range(1, 65), i -> n.v[i] * p.plane[i])) > 0
                       THEN p.w ELSE 0 END) AS INTEGER) AS bucket
  FROM n CROSS JOIN planes p
  GROUP BY n.vec_id, p.t
), cand AS (
  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
  FROM bkt x JOIN bkt y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
), pairs AS (
  SELECT c.a_id AS vec_id_a, c.b_id AS vec_id_b
  FROM cand c JOIN n na ON c.a_id = na.vec_id JOIN n nb ON c.b_id = nb.vec_id
  WHERE list_sum(list_transform(range(1, 65), i -> na.v[i] * nb.v[i])) / (na.nrm * nb.nrm)
        >= {COSINE_THRESHOLD}
),
edges AS (
  SELECT vec_id_a AS a, vec_id_b AS b FROM pairs
  UNION ALL
  SELECT vec_id_b, vec_id_a FROM pairs
),
reach AS (
  SELECT vec_id AS src, vec_id AS dst FROM embeddings
  UNION
  SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a
)
SELECT src AS vec_id, MIN(dst) AS cluster_id, src = MIN(dst) AS is_keeper
FROM reach GROUP BY src
""".format(
    planes=_lsh_planes_sql(
        n_planes=SEMANTIC_LSH_PLANES, n_tables=SEMANTIC_LSH_TABLES
    )
)


N_SHARDS = 16


def tp_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment (training layout):
    hash-placed shard, hash-ordered position within shard — one shuffle,
    parallelism = shard count, reproducible across engines."""
    docs = read_corpus(spark, sf_dir, "documents")
    return curation.shard_assign(docs, N_SHARDS)


TP_SHARD_ORACLE = f"""
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC)
            AS BIGINT) AS pos_in_shard
FROM (
  SELECT doc_id,
         CAST({_HASH28.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS}
              AS INTEGER) AS shard,
         {_HASH28.format(x="'shard:' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
"""


def ts_bigram_commonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative bigram commonality (boilerplate/template signal):
    per-doc average corpus frequency of its word bigrams, integer-exact.
    Docs with fewer than 2 words have no bigrams and emit no row."""
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.bigram_commonality(docs)


TS_BIGRAM_ORACLE = f"""
WITH g AS (
  SELECT doc_id AS id,
         unnest(CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                ELSE [] END) AS bg
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), c AS (SELECT bg, COUNT(*) AS corpus_freq FROM g GROUP BY 1)
SELECT id, COUNT(*) AS n_bigrams,
       CAST(SUM(corpus_freq) AS BIGINT) AS total_freq,
       CAST(SUM(corpus_freq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_bigram_freq
FROM g JOIN c USING (bg) GROUP BY id
"""


# ---------------------------------------------------------------------------
# Quality-filter rules, chunking, source caps, audio metadata
# ---------------------------------------------------------------------------


def ts_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule-based quality filtering: per-doc heuristic
    signals (word count, mean word length, alphabetic-word fraction,
    duplicate-bigram fraction, distinct stopwords, ellipsis fraction) and
    the conjunctive keep verdict. All scan-local expressions."""
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.quality_filters(docs)


def _quality_filters_oracle() -> str:
    en = ", ".join(f"'{w}'" for w in textstats.LANG_LEXICONS["en"])
    return f"""
WITH t AS (
  SELECT doc_id, text, {_TOKENS} AS toks FROM documents
), b AS (
  SELECT doc_id,
    CAST(len(toks) AS INTEGER) AS n_words,
    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS INTEGER) AS n_nonspace_chars,
    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS INTEGER) AS n_alpha_words,
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         ELSE [] END AS bigrams,
    CAST(len(list_distinct(list_filter(toks, x -> x IN ({en})))) AS INTEGER) AS n_distinct_stopwords,
    CAST(len(list_filter(toks, x -> x = '...' OR x = '…')) AS INTEGER) AS n_ellipsis_words
  FROM t
), c AS (
  SELECT doc_id, n_words, n_nonspace_chars, n_alpha_words,
    CAST(len(bigrams) AS INTEGER) AS n_bigrams,
    CAST(len(list_distinct(bigrams)) AS INTEGER) AS n_distinct_bigrams,
    n_distinct_stopwords, n_ellipsis_words
  FROM b
)
SELECT doc_id, n_words, n_nonspace_chars, n_alpha_words, n_bigrams,
       n_distinct_bigrams, n_distinct_stopwords, n_ellipsis_words,
       CAST(n_nonspace_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS alpha_word_frac,
       CASE WHEN n_bigrams > 0
            THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
       CAST(n_ellipsis_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS ellipsis_word_frac,
       (n_words >= {textstats.QF_MIN_WORDS} AND n_words <= {textstats.QF_MAX_WORDS}
        AND CAST(n_nonspace_chars AS DOUBLE) / CAST(n_words AS DOUBLE) >= {textstats.QF_MIN_MEAN_WORD_LEN}
        AND CAST(n_nonspace_chars AS DOUBLE) / CAST(n_words AS DOUBLE) <= {textstats.QF_MAX_MEAN_WORD_LEN}
        AND CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= {textstats.QF_MIN_ALPHA_WORD_FRAC}
        AND (CASE WHEN n_bigrams > 0
             THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END) <= {textstats.QF_MAX_DUP_BIGRAM_FRAC}
        AND n_distinct_stopwords >= {textstats.QF_MIN_DISTINCT_STOPWORDS}) AS keep
FROM c
"""


def ts_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: HTML → text extraction — wraps each document's text in a
    realistic page shell (head with script+style, title heading, body
    paragraph, comment, and an entity-bearing footer paragraph), then
    recovers the text with ``textstats.html_to_text``. The oracle states
    the closed-form expected string, so tag-stripping, script/style
    removal, comment removal, entity decoding (incl. the &amp;lt;
    double-escape case), and whitespace collapse must all be right to
    hash-match."""
    docs = read_corpus(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            "<html><head><script>var x = '<p>trap</p>';</script>"
            "<style>p { color: red; }</style></head><body><h1>T"
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n  <p>"),
        F.col("text"),
        F.lit(
            "</p><!-- hidden <b>comment</b> -->"
            "<p>x &amp; y &lt;z&gt; &quot;q&quot; &#39;a&#39; &amp;lt;raw&amp;gt;</p>"
            "</body></html>"
        ),
    )
    return docs.select(
        "doc_id",
        textstats.html_to_text(page).alias("extracted"),
    ).select(
        "doc_id",
        F.md5("extracted").alias("extracted_md5"),
        F.length("extracted").cast("int").alias("n_extracted_chars"),
    )


TS_HTML_ORACLE = """
WITH expected AS (
  SELECT doc_id,
         'T' || CAST(doc_id AS VARCHAR) || ' ' || text ||
         ' x & y <z> "q" ''a'' &lt;raw&gt;' AS extracted
  FROM documents
)
SELECT doc_id,
       md5(extracted) AS extracted_md5,
       CAST(length(extracted) AS INTEGER) AS n_extracted_chars
FROM expected
"""


CURRICULUM_STAGES = 4


def tp_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: curriculum assignment — rank each source's documents by the
    heuristic quality score and deal them into {CURRICULUM_STAGES} ntile
    stages (stage 1 = highest quality; training schedules feed stages in
    order). Per-source windows keep parallelism at source cardinality —
    no global sort; (score desc, doc_id) is a total order so tiles are
    deterministic."""
    docs = read_corpus(spark, sf_dir, "documents")
    scored = textstats.text_stats(docs).select("doc_id", "quality_score")
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = scored.join(src, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return joined.select(
        "doc_id",
        "source",
        "quality_score",
        F.ntile(CURRICULUM_STAGES).over(w).cast("int").alias("stage"),
    )


TP_CURRICULUM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
    (CASE WHEN len({_TOKENS}) >= 20 AND len({_TOKENS}) <= 80
          THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(len(list_distinct({_TOKENS})) AS DOUBLE)
                 / CAST(len({_TOKENS}) AS DOUBLE) >= 0.3
            THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) < 0.1
            THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    ) AS quality_score
  FROM documents
)
SELECT doc_id, source, quality_score,
       CAST(ntile({CURRICULUM_STAGES}) OVER (
         PARTITION BY source ORDER BY quality_score DESC, doc_id ASC
       ) AS INTEGER) AS stage
FROM scored
"""


def tp_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: the dataset-card summary block — one row of corpus-level facts
    a training-data release documents: doc/token/char totals, source and
    language cardinalities, exact-duplicate rate (via the normalized
    fingerprint), and mean tokens per doc. One global aggregate; the
    count(DISTINCT) trio plans as a single Expand + two-phase aggregate."""
    from us_dot_flights_lakehouse_spark.functions.text import (
        normalized_fingerprint,
    )

    docs = read_corpus(spark, sf_dir, "documents")
    n = F.count("*").cast("bigint")
    return docs.agg(
        n.alias("n_docs"),
        F.sum(F.size(tokenize("text"))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct(normalized_fingerprint("text"))
        .cast("bigint")
        .alias("n_unique_docs"),
    ).select(
        "*",
        (
            F.lit(1.0)
            - F.col("n_unique_docs").cast("double") / F.col("n_docs").cast("double")
        ).alias("dup_rate"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_doc_tokens"
        ),
    )


TP_CARD_ORACLE = f"""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKENS})) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
              AS BIGINT) AS n_unique_docs
  FROM documents
)
SELECT *,
       1.0 - CAST(n_unique_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_doc_tokens
FROM base
"""


LM_TOPK = 40


def ts_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: bigram language-model table — conditional next-word
    probabilities P(w2 | w1) = c(w1 w2) / c(w1 as a bigram head), for the
    top-{LM_TOPK} bigrams by count (ties lexicographic). Probabilities
    are single divisions of exact integer counts — bit-stable
    cross-engine, unlike the log-prob form (libm log differs in final
    ulps across platforms; same policy as ts_bigram_commonality).

    Scale: one corpus bigram aggregate (vocabulary²-bounded,
    zipf-concentrated) + a head-count reaggregation of THAT table —
    corpus text touched once."""
    from us_dot_flights_lakehouse_spark.functions.text import word_bigrams

    docs = read_corpus(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(word_bigrams(tokenize("text"))).alias("bg")
    ).select(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    counts = grams.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    heads = counts.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    order = [F.desc("c12"), F.asc("w1"), F.asc("w2")]
    top = counts.join(heads, "w1").orderBy(*order).limit(LM_TOPK)
    w = Window.orderBy(*order)
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "w1",
        "w2",
        "c12",
        "c1",
        (F.col("c12").cast("double") / F.col("c1").cast("double")).alias("p_next"),
    )


TS_LM_ORACLE = f"""
WITH t AS (
  SELECT {_TOKENS} AS toks FROM documents
), grams AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM grams GROUP BY 1, 2
), heads AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM counts GROUP BY 1
)
SELECT rank, w1, w2, c12, c1,
       CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p_next
FROM (
  SELECT c.w1, c.w2, c.c12, h.c1,
         CAST(row_number() OVER (ORDER BY c.c12 DESC, c.w1 ASC, c.w2 ASC)
              AS INTEGER) AS rank
  FROM counts c JOIN heads h ON c.w1 = h.w1
) WHERE rank <= {LM_TOPK}
"""


RAG_PLANES = 6  # 64 LSH buckets over the 64-dim hashed-feature space
RAG_K = 3
RAG_QUERY_DOCS = 4


def tp_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: the RAG indexing pipeline end-to-end as ONE lazy plan —
    chunk (overlapping char windows) → embed (hashing-trick vector,
    no model dependency, deterministic) → index (sign-LSH bucket)
    → retrieve (probe docs' chunks find their top-k nearest foreign
    chunks inside their bucket, cosine-ranked). Composes four
    already-oracle'd operators; the oracle replays the whole chain, so a
    drift anywhere (chunk boundaries, hash stream, plane signs, rank
    ties) hash-fails.

    Scale: chunking and embedding are scan-local; the index is one
    bucket hash-partition; retrieval joins only within buckets
    (candidate-bound, the LSH contract). Chunk ids pack as
    doc_id * 1000 + chunk_idx (chunks-per-doc < 1000 asserted by the
    chunker's geometry here)."""
    from us_dot_flights_lakehouse_spark.functions.text import hash28

    docs = read_corpus(spark, sf_dir, "documents")
    chunks = curation.chunk_documents(docs, CHUNK_CHARS, CHUNK_OVERLAP).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("cid"),
        "doc_id",
        "chunk_text",
    )
    # hashing-trick chunk vectors via the single-pass explode→groupBy path
    # (VERDICT r4 item 4's shape: the old per-row _fh_vec re-folded the
    # token array once per output dimension — O(dim × n_tokens)
    # interpreted-lambda work). Values are IDENTICAL (same two md5
    # streams), so the DuckDB oracle's _fh_vec_sql replica is untouched.
    # One exchange: pre-partitioning by cid satisfies both groupings.
    ctoks = chunks.select(
        "cid", "doc_id", F.explode(tokenize("chunk_text")).alias("tok")
    ).repartition(spark.sparkContext.defaultParallelism, "cid")
    pairs = ctoks.select(
        "cid",
        "doc_id",
        F.pmod(hash28(F.concat(F.lit("fh:"), F.col("tok"))), F.lit(FH_DIM))
        .cast("int")
        .alias("b"),
        (
            F.lit(1)
            - F.lit(2)
            * F.pmod(hash28(F.concat(F.lit("fs:"), F.col("tok"))), F.lit(2)).cast(
                "int"
            )
        ).alias("s"),
    )
    densem = (
        pairs.groupBy("cid", "doc_id", "b")
        .agg(F.sum("s").cast("int").alias("bv"))
        .groupBy("cid", "doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "bv"))).alias("m"))
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(FH_DIM - 1)),
        lambda j: F.coalesce(F.element_at(F.col("m"), j), F.lit(0)).cast("double"),
    )
    emb = densem.select("cid", "doc_id", vec.alias("v")).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )
    indexed = emb.withColumn(
        "bucket", similarity.lsh_bucket(F.col("v"), dim=FH_DIM, n_planes=RAG_PLANES)
    ).filter(F.col("nrm") > 0)
    probes = indexed.filter(F.col("doc_id") < RAG_QUERY_DOCS).select(
        F.col("cid").alias("qcid"),
        F.col("doc_id").alias("qdoc"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        probes.join(indexed, "bucket")
        .filter(F.col("qdoc") != F.col("doc_id"))
        .select(
            "qcid",
            "cid",
            "bucket",
            (dot / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("qcid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= RAG_K)
        .select(
            F.col("qcid").alias("query_chunk"),
            "rank",
            F.col("cid").alias("neighbor_chunk"),
            "bucket",
        )
    )


def _rag_oracle() -> str:
    stride = CHUNK_CHARS - CHUNK_OVERLAP
    return f"""
WITH chunks AS (
  SELECT doc_id * 1000 + CAST((s - 1) // {stride} AS BIGINT) AS cid,
         doc_id,
         substring(text, CAST(s AS INTEGER), {CHUNK_CHARS}) AS chunk_text
  FROM documents,
       unnest(range(1, greatest(1, length(text) - {CHUNK_OVERLAP}) + 1, {stride}))
         AS u(s)
), emb AS (
  SELECT cid, doc_id,
         list_transform({_fh_vec_sql("chunk_text")}, x -> CAST(x AS DOUBLE)) AS v
  FROM chunks
), n AS (
  SELECT cid, doc_id, v, {_VEC_NORM} AS nrm FROM emb
), planes AS (
  {{planes}}
), b AS (
  SELECT n.cid, n.doc_id, n.v, n.nrm,
         CAST(SUM(CASE WHEN
                 list_sum(list_transform(range(1, {FH_DIM} + 1),
                          i -> n.v[i] * p.plane[i])) > 0
               THEN p.w ELSE 0 END) AS INTEGER) AS bucket
  FROM n CROSS JOIN planes p
  WHERE n.nrm > 0
  GROUP BY n.cid, n.doc_id, n.v, n.nrm
), scored AS (
  SELECT q.cid AS qcid, c.cid AS cid, c.bucket,
         list_sum(list_transform(range(1, {FH_DIM} + 1),
                  i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm) AS cos
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.doc_id != c.doc_id
  WHERE q.doc_id < {RAG_QUERY_DOCS}
)
SELECT query_chunk, rank, neighbor_chunk, bucket FROM (
  SELECT qcid AS query_chunk, cid AS neighbor_chunk, bucket,
         CAST(ROW_NUMBER() OVER (PARTITION BY qcid
                                 ORDER BY cos DESC, cid ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {RAG_K}
""".format(planes=_lsh_planes_sql(dim=FH_DIM, n_planes=RAG_PLANES))


CM_DEPTH = 4
CM_WIDTH = 256
CM_PROBE_TOKENS = ("table", "query", "row", "spark", "the", "zebra")


def ts_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: count-min sketch (Cormode-Muthukrishnan) built as a plain
    aggregation — token counts fold into a {CM_DEPTH}x{CM_WIDTH} table
    (row d buckets by hash28('cm<d>:'||token) % width); a point estimate
    is the MIN over the d cells a token hashes to. The table is just a
    grouped count, so it is mergeable across partitions/days by
    construction — the property that makes CM the streaming/telemetry
    workhorse. The query probes a fixed token set and emits the estimate
    next to the exact count plus the two CM invariants (estimate >=
    exact always; bounded overestimate), so the driver hash-checks the
    sketch math, not just its shape.

    Scale: one corpus-token aggregate into at most depth*width cells —
    fixed-size state regardless of vocabulary, exactly like the
    ``approx_top_k`` heavy-hitters path but with a queryable table."""
    from us_dot_flights_lakehouse_spark.functions.text import hash28

    docs = read_corpus(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize("text")).alias("tok"))
    # sketch rows d=0..depth-1: (d, bucket) -> count
    cells = None
    for d in range(CM_DEPTH):
        row = toks.groupBy(
            F.lit(d).alias("d"),
            F.pmod(hash28(F.concat(F.lit(f"cm{d}:"), F.col("tok"))), F.lit(CM_WIDTH))
            .cast("int")
            .alias("bucket"),
        ).agg(F.count("*").cast("bigint").alias("c"))
        cells = row if cells is None else cells.unionByName(row)
    probes = spark.createDataFrame(
        [(t,) for t in CM_PROBE_TOKENS], "tok string"
    ).select(
        "tok",
        *[
            F.pmod(
                hash28(F.concat(F.lit(f"cm{d}:"), F.col("tok"))), F.lit(CM_WIDTH)
            )
            .cast("int")
            .alias(f"b{d}")
            for d in range(CM_DEPTH)
        ],
    )
    est = probes
    for d in range(CM_DEPTH):
        side = cells.filter(F.col("d") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("c").alias(f"c{d}")
        )
        est = est.join(F.broadcast(side), f"b{d}", "left")
    exact = toks.groupBy(F.col("tok")).agg(F.count("*").cast("bigint").alias("exact"))
    estimate = F.least(*[F.coalesce(F.col(f"c{d}"), F.lit(0)) for d in range(CM_DEPTH)])
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok",
            estimate.alias("cm_estimate"),
            F.coalesce("exact", F.lit(0)).alias("exact_count"),
        )
        .select(
            "tok",
            "cm_estimate",
            "exact_count",
            (F.col("cm_estimate") >= F.col("exact_count")).alias("never_undercounts"),
        )
    )


def _cm_oracle() -> str:
    h = lambda d: (  # noqa: E731
        f"CAST(('0x' || substr(md5('cm{d}:' || tok), 1, 7))::BIGINT "
        f"% {CM_WIDTH} AS INTEGER)"
    )
    probe_vals = ", ".join(f"('{t}')" for t in CM_PROBE_TOKENS)
    ests = ", ".join(
        f"COALESCE((SELECT CAST(count(*) AS BIGINT) FROM toks t "
        f"WHERE {h(d).replace('tok', 't.tok')} = {h(d).replace('tok', 'p.tok')}), 0)"
        for d in range(CM_DEPTH)
    )
    return f"""
WITH toks AS (
  SELECT unnest({_TOKENS}) AS tok FROM documents
), p AS (
  SELECT * FROM (VALUES {probe_vals}) AS v(tok)
), est AS (
  SELECT p.tok, least({ests}) AS cm_estimate
  FROM p
), exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count FROM toks GROUP BY tok
)
SELECT e.tok, e.cm_estimate,
       COALESCE(x.exact_count, 0) AS exact_count,
       e.cm_estimate >= COALESCE(x.exact_count, 0) AS never_undercounts
FROM est e LEFT JOIN exact x ON e.tok = x.tok
"""


def ts_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: cross-source vocabulary overlap — Jaccard similarity between
    every pair of sources' distinct token sets (the corpus-audit view
    that surfaces near-duplicate crawl feeds before any doc-level dedup
    runs). Inverted-index self-join on token (never source x source x
    vocab), so work is bounded by tokens shared between sources.

    Scale: vocab distinct + one token-keyed self-join + a pair-count
    aggregate — all vocabulary-sized, corpus touched once."""
    docs = read_corpus(spark, sf_dir, "documents")
    vocab = docs.select(
        "source", F.explode(tokenize("text")).alias("tok")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = vocab.select(F.col("source").alias("source_a"), "tok")
    b = vocab.select(F.col("source").alias("source_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"source": "source_a", "n": "n_a"}), "source_a")
        .join(sizes.withColumnsRenamed({"source": "source_b", "n": "n_b"}), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


TS_SRC_SIM_ORACLE = f"""
WITH vocab AS (
  SELECT DISTINCT source, unnest({_TOKENS}) AS tok FROM documents
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM vocab GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
       CAST(i.n_common AS DOUBLE) / CAST(sa.n + sb.n - i.n_common AS DOUBLE)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.source_a = sa.source
JOIN sizes sb ON i.source_b = sb.source
"""


FH_DIM = 64


def _fh_vec_sql(text_expr: str) -> str:
    """DuckDB replica of the two-md5-stream hashing-trick vector over an
    arbitrary text expression (the tp_rag_pipeline chunk embedding; the
    Spark side computes the same values via explode→groupBy)."""
    toks = f"regexp_split_to_array(trim(lower({text_expr})), '\\s+')"
    pairs = (
        f"list_transform({toks}, x -> struct_pack("
        f"b := CAST(('0x' || substr(md5('fh:' || x), 1, 7))::BIGINT % {FH_DIM} AS INTEGER), "
        f"s := CAST(1 - 2 * (('0x' || substr(md5('fs:' || x), 1, 7))::BIGINT % 2) AS INTEGER)))"
    )
    return (
        f"list_transform(range(0, {FH_DIM}), j -> CAST(COALESCE(list_sum("
        f"list_transform(list_filter({pairs}, e -> e.b = j), e -> e.s)), 0) AS INTEGER))"
    )


def sim_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: the hashing trick (Weinberger et al. 2009 / Vowpal Wabbit) —
    each document's tokens hash into a fixed {FH_DIM}-dim signed-count
    vector: ONE 32-bit md5 prefix per token supplies both streams —
    bucket = h % dim, sign from the next bit up (independent of the
    bucket bits; the sign stream keeps the estimator unbiased under
    collisions). Single pass over the tokens: explode → (bucket, sign)
    → groupBy(doc, bucket) partial-aggregated sums → one map-assembly
    per doc (VERDICT r4 item 4 replaced the O(dim × n_tokens)
    per-dimension re-fold), and ONE exchange total: the pairs hash-
    partition by doc_id, which satisfies BOTH downstream groupings
    ((doc, bucket) ⊇ doc), so neither aggregate re-shuffles. The vector
    serializes to a CSV string in the final select — the driver's
    canonicalizer requires scalar cells (see queries/relational.py's
    harness note) — with full fidelity: every component, in order,
    exact integers. The fixed dimensionality regardless of vocabulary
    is the point at 100 TB: no vocab table, bounded state (≤{FH_DIM}
    rows/doc after the map-side combine), stream-friendly."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    # 32-bit value from the md5 prefix: low log2(dim) bits -> bucket, the
    # bit above them -> sign (one hash per token, not two)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh:"), F.col("tok"))), 1, 8), 16, 10
    ).cast("long")
    pairs = toks.select(
        "doc_id",
        F.pmod(h, F.lit(FH_DIM)).cast("int").alias("b"),
        (
            F.lit(1)
            - F.lit(2) * F.pmod(F.floor(h / FH_DIM), F.lit(2)).cast("int")
        ).alias("s"),
    ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
    per_bucket = pairs.groupBy("doc_id", "b").agg(
        F.sum("s").cast("int").alias("v"), F.count("*").alias("c")
    )
    dense = per_bucket.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m"),
        F.sum("c").cast("int").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(FH_DIM - 1)),
        lambda j: F.coalesce(F.element_at(F.col("m"), j), F.lit(0)).cast("string"),
    )
    return dense.select(
        "doc_id",
        F.concat_ws(",", vec).alias("fvec_csv"),
        "n_tokens",
    )


SIM_FH_ORACLE = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5('fh:' || tok), 1, 8))::BIGINT AS hv FROM t
), bs AS (
  SELECT doc_id,
    CAST(hv % {FH_DIM} AS INTEGER) AS b,
    CAST(1 - 2 * ((hv // {FH_DIM}) % 2) AS INTEGER) AS s
  FROM h
), pb AS (
  SELECT doc_id, b, CAST(sum(s) AS INTEGER) AS v, count(*) AS c
  FROM bs GROUP BY doc_id, b
), dense AS (
  SELECT d.doc_id, r.j, COALESCE(pb.v, 0) AS v
  FROM (SELECT DISTINCT doc_id FROM bs) d
  CROSS JOIN range(0, {FH_DIM}) r(j)
  LEFT JOIN pb ON pb.doc_id = d.doc_id AND pb.b = r.j
), nt AS (
  SELECT doc_id, CAST(sum(c) AS INTEGER) AS n_tokens FROM pb GROUP BY doc_id
)
SELECT dense.doc_id,
       string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS fvec_csv,
       any_value(nt.n_tokens) AS n_tokens
FROM dense JOIN nt ON dense.doc_id = nt.doc_id
GROUP BY dense.doc_id
"""


def _clf_milli_weights() -> list[int]:
    """Deterministic milli-weights in [-1000, 1000] for the linear
    quality classifier — one per hashed-feature bucket, derived from
    md5 so both engines receive identical literals."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for j in range(FH_DIM)
    ]


def ts_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: in-plan LINEAR MODEL INFERENCE — a fasttext-style quality
    classifier scored at scan speed with zero Python and zero vocab
    table: each token contributes sign·w[bucket] through the SAME
    hashing-trick feature map as ``sim_feature_hash``, so the margin is
    w·x for the exact vector that query materializes. This is the shape
    model-based filtering takes at 100 TB: weights are trained offline
    (tiny), shipped as literals, and inference is a pure columnar
    expression — no UDF, no broadcast model object, no shuffle beyond
    the per-doc sum.

    Determinism: weights are integer MILLI-weights (literals derived
    from md5, identical on both engines), so the accumulation
    Σ sign·m[bucket] is exact BIGINT; the margin divides once by
    1000·n_tokens. A float dot product would be partition-order
    dependent — the integer path is not.

    Output per doc: n_tokens, margin_milli (exact), score, keep."""
    docs = read_table(spark, sf_dir, "documents")
    weights = _clf_milli_weights()
    toks = docs.select("doc_id", F.explode(tokenize("text")).alias("tok"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh:"), F.col("tok"))), 1, 8), 16, 10
    ).cast("long")
    warr = F.array(*[F.lit(m) for m in weights])
    contrib = (
        F.lit(1) - F.lit(2) * F.pmod(F.floor(h / FH_DIM), F.lit(2)).cast("int")
    ) * F.element_at(warr, F.pmod(h, F.lit(FH_DIM)).cast("int") + 1)
    agg = toks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(contrib).cast("bigint").alias("margin_milli"),
    )
    score = F.col("margin_milli").cast("double") / (
        1000.0 * F.col("n_tokens").cast("double")
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "margin_milli",
        score.alias("score"),
        (score > 0.0).alias("keep"),
    )


def _quality_clf_oracle() -> str:
    weights = _clf_milli_weights()
    wlist = "[" + ", ".join(str(m) for m in weights) + "]"
    return f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5('fh:' || tok), 1, 8))::BIGINT AS hv FROM t
), c AS (
  SELECT doc_id,
         CAST((1 - 2 * ((hv // {FH_DIM}) % 2))
              * ({wlist}[CAST(hv % {FH_DIM} AS INTEGER) + 1]) AS BIGINT)
           AS contrib
  FROM h
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(contrib) AS BIGINT) AS margin_milli
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_tokens, margin_milli,
       CAST(margin_milli AS DOUBLE) / (1000.0 * CAST(n_tokens AS DOUBLE))
         AS score,
       CAST(margin_milli AS DOUBLE) / (1000.0 * CAST(n_tokens AS DOUBLE)) > 0.0
         AS keep
FROM agg
"""


def ts_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: URL component extraction with the built-in ``parse_url``
    (host / path / query / single query-param) — the crawl-metadata step
    before per-domain caps (``tp_source_caps`` keys on the host). URLs
    are synthesized from the document row so the oracle can state each
    component in closed form — a quoting or delimiter bug in the
    extraction hash-fails."""
    docs = read_corpus(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )


TS_URL_ORACLE = """
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       'lang=' || lang || '&page=' || CAST(doc_id % 7 AS VARCHAR) AS query,
       CAST(doc_id % 7 AS VARCHAR) AS page_param
FROM documents
"""


def ts_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: NFC unicode canonicalization (llm/textstats.py) — md5 of the
    normalized text so the oracle (DuckDB ``nfc_normalize``) checks full
    fidelity, not just lengths. The synthetic corpus is ASCII (changed =
    false everywhere); the composed/decomposed cases are unit-tested."""
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.unicode_normalize(docs).select(
        "doc_id",
        F.md5("norm_text").alias("norm_md5"),
        "changed",
        "len_delta",
    )


TS_UNICODE_ORACLE = """
SELECT doc_id,
       md5(nfc_normalize(text)) AS norm_md5,
       nfc_normalize(text) != text AS changed,
       CAST(length(nfc_normalize(text)) - length(text) AS INTEGER) AS len_delta
FROM documents
"""


def ts_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition family (Rae et al. 2021 table A1): fraction of
    characters covered by the most frequent word {2,3,4}-gram and inside
    duplicated {5,10}-grams, plus the conjunctive ``rep_keep`` verdict.
    Complements ``ts_quality_filters`` (word-shape signals).  Pure per-row
    array lambdas — zero shuffles."""
    docs = read_corpus(spark, sf_dir, "documents")
    return textstats.repetition_stats(docs)


def _repetition_oracle() -> str:
    gram_defs, metric_defs, keeps, metric_names = [], [], [], []
    for n in sorted(set(textstats.REP_TOP_MAX) | set(textstats.REP_DUP_MAX)):
        gram_defs.append(
            f"CASE WHEN n_words >= {n} THEN "
            f"list_transform(range(1, n_words - {n} + 2), "
            f"p -> array_to_string(toks[p : p + {n - 1}], ' ')) "
            f"ELSE CAST([] AS VARCHAR[]) END AS grams_{n}"
        )
    for n, thr in textstats.REP_TOP_MAX.items():
        cover = (
            f"list_transform(list_distinct(grams_{n}), "
            f"g -> len(list_filter(grams_{n}, x -> x = g)) * (length(g) - {n - 1}))"
        )
        frac = (
            f"CASE WHEN token_chars > 0 AND len(grams_{n}) > 0 "
            f"THEN least(CAST(1.0 AS DOUBLE), "
            f"CAST(list_max({cover}) AS DOUBLE) / CAST(token_chars AS DOUBLE)) "
            f"ELSE CAST(0.0 AS DOUBLE) END"
        )
        metric_defs.append(f"{frac} AS top_{n}gram_frac")
        metric_names.append(f"top_{n}gram_frac")
        keeps.append(f"top_{n}gram_frac <= {thr}")
    for n, thr in textstats.REP_DUP_MAX.items():
        dup = (
            f"COALESCE(list_sum(list_transform(list_distinct(grams_{n}), "
            f"g -> CASE WHEN len(list_filter(grams_{n}, x -> x = g)) >= 2 "
            f"THEN len(list_filter(grams_{n}, x -> x = g)) * (length(g) - {n - 1}) "
            f"ELSE 0 END)), 0)"
        )
        frac = (
            f"CASE WHEN token_chars > 0 "
            f"THEN least(CAST(1.0 AS DOUBLE), "
            f"CAST({dup} AS DOUBLE) / CAST(token_chars AS DOUBLE)) "
            f"ELSE CAST(0.0 AS DOUBLE) END"
        )
        metric_defs.append(f"{frac} AS dup_{n}gram_frac")
        metric_names.append(f"dup_{n}gram_frac")
        keeps.append(f"dup_{n}gram_frac <= {thr}")
    return f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS toks FROM documents
), sized AS (
  SELECT doc_id, toks,
    CAST(len(toks) AS INTEGER) AS n_words,
    CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS INTEGER)
      AS token_chars
  FROM t
), grams AS (
  SELECT doc_id, n_words, token_chars, {", ".join(gram_defs)} FROM sized
), metrics AS (
  SELECT doc_id, n_words, token_chars, {", ".join(metric_defs)} FROM grams
)
SELECT doc_id, n_words, token_chars, {", ".join(metric_names)},
       ({" AND ".join(keeps)}) AS rep_keep
FROM metrics
"""


BPE_TOPK = 50


def tp_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training iteration 0 (Sennrich et al. 2016): corpus-weighted
    adjacent character-pair counts over the (word, freq) vocabulary table,
    ranked; the argmax row is the first merge. The corpus text is touched
    once (word-count aggregate); everything after is vocabulary-sized.
    The full greedy merge loop is ``llm/tokenizer.py::bpe_train``
    (driver-iterative, unit-tested against a reference implementation)."""
    docs = read_corpus(spark, sf_dir, "documents")
    order = [F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")]
    top = (
        tokenizer.merge_pair_counts(docs)
        .orderBy(*order)  # TakeOrdered reduce, no sort shuffle
        .limit(BPE_TOPK)
    )
    w = Window.orderBy(*order)  # ranks 50 rows on one task, post-limit
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "left_sym",
        "right_sym",
        "pair_count",
    )


TP_BPE_ORACLE = f"""
WITH words AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
  GROUP BY w
), pairlists AS (
  SELECT freq,
    CASE WHEN length(word) >= 2
         THEN list_transform(range(1, length(word)),
                             i -> [substr(word, CAST(i AS INTEGER), 1),
                                   substr(word, CAST(i AS INTEGER) + 1, 1)])
         ELSE CAST([] AS VARCHAR[][]) END AS ps
  FROM words
), exploded AS (
  SELECT freq, unnest(ps) AS p FROM pairlists
), counts AS (
  SELECT p[1] AS left_sym, p[2] AS right_sym,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM exploded GROUP BY p[1], p[2]
)
SELECT rank, left_sym, right_sym, pair_count FROM (
  SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, left_sym ASC,
                                 right_sym ASC) AS INTEGER) AS rank,
         left_sym, right_sym, pair_count
  FROM counts
) WHERE rank <= {BPE_TOPK}
"""


def tp_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: text → training-tensor encoding — build the frequency-ranked
    vocabulary (llm/tokenizer.py::vocab_ids) and encode every document's
    token stream as its id sequence (posexplode → vocab join → ordered
    reassembly via sort_array, no window). Composes with
    tp_sequence_packing for the full tokenize→ids→pack path. The id
    sequence serializes to a CSV string in the final select (the
    driver's canonicalizer requires scalar cells — VERDICT r4 item 1)
    with full fidelity: every id, in token order."""
    docs = read_corpus(spark, sf_dir, "documents")
    vocab = tokenizer.vocab_ids(docs)
    enc = tokenizer.encode_token_ids(docs, vocab)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(
            ",", F.transform("token_ids", lambda t: t.cast("string"))
        ).alias("token_ids_csv"),
    )


TP_TOKEN_IDS_ORACLE = f"""
WITH words AS (
  SELECT w AS word, count(*) AS freq
  FROM (SELECT unnest({_TOKENS}) AS w FROM documents) GROUP BY w
), vocab AS (
  SELECT word,
         CAST(row_number() OVER (ORDER BY freq DESC, word ASC) - 1 AS INTEGER)
           AS token_id
  FROM words
), ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) + 1),
                               i -> struct_pack(pos := i - 1, word := t[i]))) AS u
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), toks AS (
  SELECT doc_id, u.pos AS pos, u.word AS word FROM ex
)
SELECT t.doc_id,
       CAST(count(*) AS INTEGER) AS n_tokens,
       string_agg(CAST(COALESCE(v.token_id, -1) AS VARCHAR), ','
                  ORDER BY t.pos) AS token_ids_csv
FROM toks t LEFT JOIN vocab v USING (word)
GROUP BY t.doc_id
"""


CHUNK_CHARS = 120
CHUNK_OVERLAP = 30


def tp_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping character chunking (sequence + posexplode +
    substring, zero UDF). Chunk starts advance by chunk-overlap."""
    docs = read_corpus(spark, sf_dir, "documents")
    return curation.chunk_documents(docs, CHUNK_CHARS, CHUNK_OVERLAP)


TP_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST((s - 1) // {CHUNK_CHARS - CHUNK_OVERLAP} AS INTEGER) AS chunk_idx,
       CAST(s AS INTEGER) AS chunk_start,
       substring(text, CAST(s AS INTEGER), {CHUNK_CHARS}) AS chunk_text,
       CAST(length(substring(text, CAST(s AS INTEGER), {CHUNK_CHARS})) AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(1, length(text) - {CHUNK_OVERLAP}),
                                {CHUNK_CHARS - CHUNK_OVERLAP})) AS s
  FROM documents
)
"""


SOURCE_CAP = 10


def tp_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (corpus balancing): deterministic
    hash-ordered row_number per source, keep the first SOURCE_CAP."""
    docs = read_corpus(spark, sf_dir, "documents")
    return curation.source_caps(docs, SOURCE_CAP)


TP_SOURCE_CAPS_ORACLE = f"""
SELECT doc_id, source, slot, slot <= {SOURCE_CAP} AS kept
FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT ASC,
                    doc_id ASC
         ) AS INTEGER) AS slot
  FROM documents
)
"""


def mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: WAV/RIFF audio metadata from header byte arithmetic — NO codec:
    synthesizes canonical 44-byte PCM WAV headers with rate/channels/bits
    derived from doc_id, then recovers them (plus integer frame count and
    duration_ms) with ``multimodal.wav_meta`` Column expressions. The
    oracle recomputes every field arithmetically, so any little-endian
    offset bug hash-fails."""
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    channels = (F.col("doc_id") % 2 + 1).cast("long")
    rate = (F.col("doc_id") % 5 * 4000 + 8000).cast("long")
    bits = (F.col("doc_id") % 3 * 8 + 8).cast("long")
    block_align = channels * (bits / 8).cast("long")
    n_frames = (F.col("doc_id") % 1000 + 100).cast("long")
    data_bytes = n_frames * block_align
    byte_rate = rate * block_align

    def le(v, nbytes: int):
        be = F.lpad(F.hex(v), nbytes * 2, "0")
        return F.concat(
            *[F.substring(be, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
        )

    header = F.concat(
        F.lit("52494646"),            # 'RIFF'
        le(data_bytes + 36, 4),       # riff chunk size
        F.lit("57415645666D7420"),    # 'WAVE' + 'fmt '
        le(F.lit(16), 4),             # fmt chunk size (PCM)
        le(F.lit(1), 2),              # audio format = PCM
        le(channels, 2),
        le(rate, 4),
        le(byte_rate, 4),
        le(block_align, 2),
        le(bits, 2),
        F.lit("64617461"),            # 'data'
        le(data_bytes, 4),
    )
    wavs = docs.select("doc_id", F.unhex(header).alias("payload"))
    meta = multimodal.wav_meta("payload")
    return wavs.select(
        "doc_id",
        meta["channels"].alias("channels"),
        meta["sample_rate"].alias("sample_rate"),
        meta["bits_per_sample"].alias("bits_per_sample"),
        meta["data_bytes"].alias("data_bytes"),
        meta["n_frames"].alias("n_frames"),
        meta["duration_ms"].alias("duration_ms"),
    )


MM_WAV_ORACLE = """
SELECT doc_id,
       CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
       CAST(doc_id % 5 * 4000 + 8000 AS INTEGER) AS sample_rate,
       CAST(doc_id % 3 * 8 + 8 AS INTEGER) AS bits_per_sample,
       CAST((doc_id % 1000 + 100) * ((doc_id % 2 + 1) * ((doc_id % 3 * 8 + 8) // 8)) AS BIGINT) AS data_bytes,
       CAST(doc_id % 1000 + 100 AS BIGINT) AS n_frames,
       CAST((doc_id % 1000 + 100) * 1000 // (doc_id % 5 * 4000 + 8000) AS BIGINT) AS duration_ms
FROM documents
"""


def mm_gif_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL GIF LZW decode end-to-end — synthesizes an 8x8
    gray-palette GIF per document (pixel i = (11*doc_id + 3*i) % 256,
    written by ``gif_encode``'s clear-code-reset LZW; odd doc_ids write
    INTERLACED frames so the 4-pass row reorder is exercised), decodes
    it back through ``decode_image``'s gif path (variable-width LZW +
    palette expansion + deinterlace), and aggregates pixel statistics
    including a POSITION-WEIGHTED sum (sum of i * pixel_i) — mean/min/
    max are permutation-invariant, so only the weighted sum would catch
    an interlace-order bug. The oracle recomputes everything from the
    closed form; mean divides by 64 (power of two): exact double."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import gif_encode

        pal = [(i, i, i) for i in range(256)]
        for pdf in batches:
            payloads = [
                gif_encode(
                    ((11 * int(d) + 3 * np.arange(64)) % 256)
                    .astype(np.uint8)
                    .reshape(8, 8),
                    pal,
                    interlace=bool(int(d) % 2),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_image(imgs)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, w, h, mode, px in zip(
                pdf["id"], pdf["width"], pdf["height"], pdf["mode"], pdf["pixels"]
            ):
                a = np.frombuffer(px, np.uint8).reshape(64, 3)[:, 0].astype(np.int64)
                rows.append(
                    (
                        i,
                        int(w),
                        int(h),
                        mode,
                        float(int(a.sum()) / 64),
                        int(a.min()),
                        int(a.max()),
                        int((np.arange(64) * a).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mode",
                    "mean_px", "min_px", "max_px", "weighted_sum",
                ],
            )

    return decoded.mapInPandas(
        stats,
        schema=(
            "doc_id long, width int, height int, mode string, "
            "mean_px double, min_px int, max_px int, weighted_sum bigint"
        ),
    )


MM_GIF_ORACLE = """
WITH px AS (
  SELECT doc_id, list_transform(range(0, 64), i -> (11 * doc_id + 3 * i) % 256) AS p
  FROM documents
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       'RGB' AS mode,
       list_sum(p) / 64.0 AS mean_px,
       CAST(list_aggregate(p, 'min') AS INTEGER) AS min_px,
       CAST(list_aggregate(p, 'max') AS INTEGER) AS max_px,
       CAST(list_sum(list_transform(range(0, 64), i -> i * p[i + 1])) AS BIGINT) AS weighted_sum
FROM px
"""


def mm_mp4_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL MP4 frame sampling — synthesizes a 6-frame 8x8 MJPEG
    MP4 per document (ISO-BMFF with a real stco/stsc/stsz sample table;
    frame f is the constant even gray g = 2*((3*doc_id + 41*f) % 128),
    25 fps), samples every 80 ms (stride 2 → frames 0/2/4) through
    ``sample_frames``'s ISO-BMFF path, and aggregates per-frame stats.
    DC-only even-valued frames decode bit-losslessly, so the oracle is
    closed form and the box-walk → sample-table slicing → huffman →
    IDCT chain hash-fails on any defect. Lifts the 'MP4 is always
    gated' limitation for the dominant video container.

    read_corpus: same millisecond-codec argument as mm_mjpeg_frame_stats."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import mp4_encode_mjpeg

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                g = 2 * ((3 * int(d) + 41 * np.arange(6)) % 128)
                frames = np.repeat(
                    g.astype(np.uint8)[:, None, None], 64, axis=1
                ).reshape(6, 8, 8)
                payloads.append(mp4_encode_mjpeg(frames, frame_ms=40))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(synth, schema="id long, payload binary")
    sampled = multimodal.sample_frames(vids, every_ms=80)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, f, ts, w, h, mode, px in zip(
                pdf["id"], pdf["frame_idx"], pdf["ts_ms"], pdf["width"],
                pdf["height"], pdf["mode"], pdf["pixels"],
            ):
                a = np.frombuffer(px, np.uint8)
                rows.append(
                    (i, int(f), int(ts), int(w), int(h), mode,
                     float(int(a.sum()) / a.size), int(a.min()), int(a.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "ts_ms", "width", "height",
                    "mode", "mean_px", "min_px", "max_px",
                ],
            )

    return sampled.mapInPandas(
        stats,
        schema=(
            "doc_id long, frame_idx int, ts_ms bigint, width int, height int, "
            "mode string, mean_px double, min_px int, max_px int"
        ),
    )


MM_MP4_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, unnest([0, 2, 4]) AS frame_idx FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       'L' AS mode,
       CAST(2 * ((3 * doc_id + 41 * frame_idx) % 128) AS DOUBLE) AS mean_px,
       CAST(2 * ((3 * doc_id + 41 * frame_idx) % 128) AS INTEGER) AS min_px,
       CAST(2 * ((3 * doc_id + 41 * frame_idx) % 128) AS INTEGER) AS max_px
FROM f
"""


def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: REAL sample-level PCM audio decode end-to-end — synthesizes a
    mono 16-bit WAV per document (256 samples, sample i =
    (doc_id*31 + i*7919) % 4001 - 2000, written by ``wav_encode`` with a
    filler LIST chunk between fmt and data so the reader must walk chunks
    rather than trust the canonical 44-byte offsets), decodes it back
    with ``multimodal.decode_audio`` (RIFF chunk walk + numpy int16
    PCM), and aggregates integer-exact amplitude statistics. The oracle
    recomputes them from the closed form, so a bug anywhere in the
    encode → chunk-walk → sample-decode → stats chain hash-fails.
    mean_abs divides by 256 (a power of two): exact double both engines.
    Reference counterpart: the lakehouse stops at header metadata
    (`wav_meta`); this is the training-pipeline extension that actually
    touches samples."""
    import numpy as np

    # read_table, not read_corpus: microsecond-per-row kernels — see
    # mm_pixel_stats for why the 32-way repartition would cost more than
    # it buys across 3 chained mapInPandas stages
    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        for pdf in batches:
            payloads = [
                wav_encode(
                    ((int(d) * 31 + np.arange(256) * 7919) % 4001 - 2000).astype(
                        np.int16
                    ),
                    8000,
                    extra_chunks=[(b"LIST", b"INFO" + b"\x00" * 12)],
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i, nf, buf in zip(pdf["id"], pdf["n_frames"], pdf["samples"]):
                v = np.frombuffer(buf, "<i2").astype(np.int64)
                rows.append(
                    (
                        i,
                        int(nf),
                        int(np.abs(v).sum()),
                        int(np.abs(v).max()),
                        int(((v[:-1] * v[1:]) < 0).sum()),
                        float(int(np.abs(v).sum()) / 256),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sum_abs", "peak",
                    "zero_crossings", "mean_abs",
                ],
            )

    return decoded.mapInPandas(
        stats,
        schema=(
            "doc_id long, n_samples bigint, sum_abs bigint, peak int, "
            "zero_crossings bigint, mean_abs double"
        ),
    )


MM_AUDIO_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, 256),
                        i -> (doc_id * 31 + i * 7919) % 4001 - 2000) AS v
  FROM documents
)
SELECT doc_id,
       CAST(256 AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(v, x -> abs(x))) AS BIGINT) AS sum_abs,
       CAST(list_aggregate(list_transform(v, x -> abs(x)), 'max') AS INTEGER) AS peak,
       CAST(len(list_filter(range(0, 255), i -> v[i+1] * v[i+2] < 0)) AS BIGINT) AS zero_crossings,
       CAST(list_sum(list_transform(v, x -> abs(x))) AS DOUBLE) / 256.0 AS mean_abs
FROM s
"""


def mm_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: frequency-domain audio features — synthesizes a two-tone
    16-bit WAV per document (dominant tone at bin 5 + doc_id%50 with
    amplitude 10000, secondary at bin 60 + (doc_id*7)%50 with amplitude
    3000, N=256 @ 8 kHz), decodes it through the real RIFF chunk walk
    (``multimodal.decode_audio``), and recovers both planted bins from
    the magnitude spectrum (numpy rfft, Arrow-batched). The oracle states
    the closed-form bins/frequencies, so the whole synth → encode →
    decode → FFT → argmax chain must be right to hash-match; bin_hz =
    8000/256 = 31.25 is binary-exact, keeping the Hz columns bit-stable.
    Scale: per-row kernels with no shuffle; a 256-point rfft is ~µs —
    the corpus scan dominates, which is the right shape at 100 TB."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        i = np.arange(256)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                k = 5 + int(d) % 50
                m = 60 + (int(d) * 7) % 50
                wave = 10000 * np.sin(2 * np.pi * k * i / 256) + 3000 * np.sin(
                    2 * np.pi * m * i / 256
                )
                payloads.append(
                    wav_encode(np.round(wave).astype(np.int16), 8000)
                )
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def spectral(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["samples"]):
                v = np.frombuffer(buf, "<i2").astype(np.float64)
                mag = np.abs(np.fft.rfft(v))
                mag[0] = 0.0  # ignore DC
                dom = int(np.argmax(mag))
                mag2 = mag.copy()
                mag2[dom] = 0.0
                sec = int(np.argmax(mag2))
                rows.append((i, dom, sec, dom * 31.25, sec * 31.25))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dominant_bin", "second_bin",
                    "dominant_hz", "second_hz",
                ],
            )

    return decoded.mapInPandas(
        spectral,
        schema=(
            "doc_id long, dominant_bin int, second_bin int, "
            "dominant_hz double, second_hz double"
        ),
    )


MM_SPECTRAL_ORACLE = """
SELECT doc_id,
       CAST(5 + doc_id % 50 AS INTEGER) AS dominant_bin,
       CAST(60 + (doc_id * 7) % 50 AS INTEGER) AS second_bin,
       CAST((5 + doc_id % 50) * 31.25 AS DOUBLE) AS dominant_hz,
       CAST((60 + (doc_id * 7) % 50) * 31.25 AS DOUBLE) AS second_hz
FROM documents
"""


#: mvhd timescales exercised by mm_mp4_meta, indexed by doc_id % 4
_MP4_TIMESCALES = (600, 1000, 24000, 90000)


def mm_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: MP4/ISO-BMFF video metadata from header box walking — NO
    codec: synthesizes minimal ftyp + free + moov(mvhd) files (both mvhd
    v0 32-bit and v1 64-bit layouts, brand and timescale derived from
    doc_id, and a 'free' box in the middle so the kernel must actually
    walk variable-size boxes), then recovers brand / timescale / duration
    with ``multimodal.mp4_meta``. The oracle recomputes every field
    arithmetically, so a box-offset bug hash-fails."""
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    be32 = lambda c: F.lpad(F.hex(c.cast("long")), 8, "0")  # noqa: E731
    be64 = lambda c: F.lpad(F.hex(c.cast("long")), 16, "0")  # noqa: E731
    brand_hex = F.when(F.col("doc_id") % 2 == 0, "69736F6D").otherwise("6D703432")
    ts = F.element_at(
        F.array(*[F.lit(t) for t in _MP4_TIMESCALES]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    dur = F.col("doc_id") % 100000 + 1000
    ftyp = F.concat(F.lit("0000001066747970"), brand_hex, F.lit("00000000"))
    free = F.lit("0000000866726565")
    mvhd_v0 = F.concat(
        F.lit("0000001C6D766864"),  # size 28, 'mvhd'
        F.lit("00000000"),          # version 0 + flags
        F.lit("00000000" * 2),      # ctime, mtime
        be32(ts),
        be32(dur),
    )
    mvhd_v1 = F.concat(
        F.lit("000000286D766864"),  # size 40, 'mvhd'
        F.lit("01000000"),          # version 1 + flags
        F.lit("0" * 32),            # 64-bit ctime, mtime
        be32(ts),
        be64(dur),
    )
    mvhd = F.when(F.col("doc_id") % 2 == 0, mvhd_v0).otherwise(mvhd_v1)
    moov_size = F.when(F.col("doc_id") % 2 == 0, F.lit(36)).otherwise(F.lit(48))
    moov = F.concat(be32(moov_size), F.lit("6D6F6F76"), mvhd)
    payload = F.unhex(F.concat(ftyp, free, moov))
    vids = docs.select("doc_id", payload.alias("payload"))
    meta = multimodal.mp4_meta(vids, id_col="doc_id")
    return meta.select(
        F.col("id").alias("doc_id"),
        "major_brand",
        "timescale",
        "duration",
        "duration_ms",
    )


MM_MP4_ORACLE = f"""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
       CAST(CASE doc_id % 4 WHEN 0 THEN {_MP4_TIMESCALES[0]}
                            WHEN 1 THEN {_MP4_TIMESCALES[1]}
                            WHEN 2 THEN {_MP4_TIMESCALES[2]}
                            ELSE {_MP4_TIMESCALES[3]} END AS INTEGER) AS timescale,
       CAST(doc_id % 100000 + 1000 AS BIGINT) AS duration,
       CAST((doc_id % 100000 + 1000) * 1000 //
            (CASE doc_id % 4 WHEN 0 THEN {_MP4_TIMESCALES[0]}
                             WHEN 1 THEN {_MP4_TIMESCALES[1]}
                             WHEN 2 THEN {_MP4_TIMESCALES[2]}
                             ELSE {_MP4_TIMESCALES[3]} END) AS BIGINT) AS duration_ms
FROM documents
"""


def ts_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: per-document fluency score under the corpus's own bigram LM —
    the CCNet/Gopher-style perplexity-proxy quality filter, model-free:
    train P(w2|w1) = c(w1 w2)/c(w1·) on the corpus (the ts_ngram_lm
    table, un-truncated), then score every document as the mean
    next-word probability over its bigrams. Low scores = atypical word
    sequences (boilerplate, garbled text) — the rows a quality gate
    drops. Probability mean, not log-prob mean: libm log differs in
    final ulps across engines (same policy as ts_ngram_lm), while count
    ratios and one division are bit-stable.

    Determinism: the per-doc sum folds the probabilities in POSITION
    order (sort_array over (pos, p) → sequential F.aggregate), exactly
    the order DuckDB's list_sum folds list(p ORDER BY pos) — parallel
    float reduction order never leaks into the result.

    Scale: corpus text is scanned once into positioned bigrams; the LM
    is a vocab²-bounded aggregate of that same relation; scoring is one
    hash join (bigram keys) + one per-doc aggregate."""
    from us_dot_flights_lakehouse_spark.functions.text import word_bigrams

    docs = read_corpus(spark, sf_dir, "documents")
    grams_pos = docs.select(
        "doc_id",
        F.posexplode(word_bigrams(tokenize("text"))).alias("pos", "bg"),
    ).select(
        "doc_id",
        "pos",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    counts = grams_pos.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    heads = counts.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    lm = counts.join(heads, "w1").select(
        "w1",
        "w2",
        (F.col("c12").cast("double") / F.col("c1").cast("double")).alias("p"),
    )
    scored = grams_pos.join(lm, ["w1", "w2"])
    sum_p = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "p"))),
            lambda s: s["p"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_bigrams"),
        (sum_p / F.count("*").cast("double")).alias("avg_p"),
    )


TS_LM_SCORE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS toks FROM documents
), g AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(range(1, len(toks))) AS u(i)
  WHERE len(toks) >= 2
), counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY 1, 2
), heads AS (
  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM counts GROUP BY 1
), lm AS (
  SELECT c.w1, c.w2, CAST(c.c12 AS DOUBLE) / CAST(h.c1 AS DOUBLE) AS p
  FROM counts c JOIN heads h ON c.w1 = h.w1
)
SELECT g.doc_id,
       CAST(count(*) AS INTEGER) AS n_bigrams,
       list_sum(list(lm.p ORDER BY g.pos)) / CAST(count(*) AS DOUBLE) AS avg_p
FROM g JOIN lm ON g.w1 = lm.w1 AND g.w2 = lm.w2
GROUP BY g.doc_id
"""


COV_TOPK = 200


def tp_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: cumulative vocabulary coverage — how much of the token stream
    the top-k vocabulary entries cover (the curve that sizes tokenizer
    vocabularies and UNK budgets: 'the top 200 words cover X% of all
    tokens'). Counts and the running sum are exact BIGINTs; the fraction
    is one double division — bit-stable.

    Scale: one corpus word aggregate; the global rank runs AFTER a
    TakeOrdered top-{COV_TOPK} (a k-row single task, never a global
    sort), and the stream total rides in on a broadcast 1-row
    aggregate."""
    docs = read_corpus(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokenize("text")).alias("word"))
    vocab = words.groupBy("word").agg(F.count("*").cast("bigint").alias("freq"))
    total = vocab.agg(F.sum("freq").cast("bigint").alias("total"))
    order = [F.desc("freq"), F.asc("word")]
    top = vocab.orderBy(*order).limit(COV_TOPK)
    w = Window.orderBy(*order)
    return (
        top.select(
            F.row_number().over(w).cast("int").alias("rank"),
            "word",
            "freq",
            F.sum("freq")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint")
            .alias("cum_freq"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "word",
            "freq",
            "cum_freq",
            (F.col("cum_freq").cast("double") / F.col("total").cast("double")).alias(
                "cum_frac"
            ),
        )
    )


TP_VOCAB_COV_ORACLE = f"""
WITH words AS (
  SELECT unnest({_TOKENS}) AS word FROM documents
), vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY word
), tot AS (
  SELECT CAST(sum(freq) AS BIGINT) AS total FROM vocab
), ranked AS (
  SELECT word, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, word ASC) AS INTEGER)
           AS rank,
         CAST(sum(freq) OVER (ORDER BY freq DESC, word ASC
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_freq
  FROM vocab
)
SELECT rank, word, freq, cum_freq,
       CAST(cum_freq AS DOUBLE) / CAST(total AS DOUBLE) AS cum_frac
FROM ranked, tot
WHERE rank <= {COV_TOPK}
"""


def tp_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: temperature-scaled source sampling weights — the multilingual /
    multi-source training-mix rule (mBERT/XLM-R exponentiated sampling):
    w_i = n_i^α / Σ_j n_j^α with α = 0.5, which up-weights small sources
    relative to their raw share without letting any source dominate.
    α = 0.5 deliberately: sqrt is IEEE-correctly-rounded on both engines
    (general pow is not), and the normalizer folds the per-source sqrt
    terms in SOURCE order on both sides — bit-stable.

    Scale: one per-source count aggregate; the normalizer is a 1-row
    broadcast (source cardinality is tiny by construction)."""
    docs = read_corpus(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    norm = src.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("source", "n_docs"))),
                lambda s: F.sqrt(s["n_docs"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z"),
        F.sum("n_docs").cast("bigint").alias("total"),
    )
    return src.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("total").cast("double")).alias(
            "raw_share"
        ),
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("z")).alias("weight"),
    )


TP_TEMP_MIX_ORACLE = """
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), norm AS (
  SELECT list_sum(list_transform(
           list(struct_pack(s := source, n := n_docs) ORDER BY source),
           e -> sqrt(CAST(e.n AS DOUBLE)))) AS z,
         CAST(sum(n_docs) AS BIGINT) AS total
  FROM src
)
SELECT source, n_docs,
       CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS raw_share,
       sqrt(CAST(n_docs AS DOUBLE)) / z AS weight
FROM src, norm
"""


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: perceptual-hash image dedup — synthesize a 32×32 grayscale
    image per document with only {PHASH_VARIANTS} distinct motifs
    (pixel(r,c) = (37·(doc_id mod {PHASH_VARIANTS}) + 3·(r//4) + 5·(c//4))
    mod 256, constant on 4×4 blocks so the box resize is closed-form),
    box-resize to the canonical 8×8 thumbnail, dHash
    (``multimodal.dhash_image``: adjacent-pixel comparisons, 56 bits),
    then exact-match the hashes into duplicate clusters — the standard
    near-duplicate-image pipeline for multimodal training data. The
    oracle recomputes every comparison bit from the synth formula, so a
    defect anywhere in resize → grayscale → bit packing hash-fails.

    Scale: synth/resize/hash are scan-local Arrow kernels; the dedup is
    one groupBy on an 8-byte key."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        rr = np.arange(32)[:, None] // 4
        cc = np.arange(32)[None, :] // 4
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                px = ((37 * (int(d) % PHASH_VARIANTS) + 3 * rr + 5 * cc) % 256).astype(
                    np.uint8
                )
                rows.append((int(d), 32, 32, "L", px.tobytes()))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mode", "pixels"]
            )

    imgs = docs.mapInPandas(synth, schema=multimodal.DECODED_IMAGE_SCHEMA)
    hashed = multimodal.dhash_image(
        multimodal.resize_image(imgs, 8, 8, method="box")
    )
    firsts = hashed.groupBy("dhash").agg(F.min("id").alias("cluster_min"))
    return hashed.join(firsts, "dhash").select(
        F.col("id").alias("doc_id"),
        "dhash",
        "cluster_min",
        (F.col("id") != F.col("cluster_min")).alias("is_dup"),
    )


PHASH_VARIANTS = 16


def _phash_oracle() -> str:
    """Closed-form dHash replica: after the exact box resize the 8×8
    thumbnail is g(r,c) = (37·(doc_id mod {PHASH_VARIANTS}) + 3r + 5c)
    mod 256; emit the 56 comparison bits MSB-first, row-major."""
    a = f"(37 * (doc_id % {PHASH_VARIANTS}))"
    terms = []
    for r in range(8):
        for c in range(7):
            lo = f"(({a} + {3 * r + 5 * c}) % 256)"
            hi = f"(({a} + {3 * r + 5 * (c + 1)}) % 256)"
            weight = 1 << (55 - (r * 7 + c))
            terms.append(f"(CASE WHEN {hi} > {lo} THEN CAST({weight} AS BIGINT) ELSE 0 END)")
    dh = "(" + " + ".join(terms) + ")"
    return f"""
WITH h AS (
  SELECT doc_id, CAST({dh} AS BIGINT) AS dhash FROM documents
), f AS (
  SELECT dhash, min(doc_id) AS cluster_min FROM h GROUP BY dhash
)
SELECT h.doc_id, h.dhash, f.cluster_min,
       h.doc_id != f.cluster_min AS is_dup
FROM h JOIN f ON h.dhash = f.dhash
"""


SC_BLOCK = 3  # span-corruption span length (token block size)
SC_GATE = 5  # 1-in-5 blocks mask -> ~20% corruption rate, T5's default


def tp_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: T5-style span corruption — partition each document's token
    stream into length-{SC_BLOCK} blocks and mask whole blocks behind a
    deterministic hash gate (hash28('sc:'||doc_id||':'||block) mod
    {SC_GATE} = 0 → ~1/{SC_GATE} of tokens masked as contiguous spans,
    the denoising-objective shape). Emits per-doc mask accounting plus
    the md5 of the corrupted stream, so the oracle checks every masked
    POSITION, not just the counts. Zero shuffle: gate, rewrite and
    digest are scan-local array expressions.

    Perf: the hash gate depends only on the BLOCK index, so it is
    evaluated once per block (one md5 per {SC_BLOCK} tokens) and the
    per-position expressions index into the precomputed gate array —
    not one md5 per position per output column (9x fewer digests;
    MEMORY's interpreted-HOF trap)."""
    docs = read_corpus(spark, sf_dir, "documents")
    toks = tokenize("text")
    did = F.col("doc_id").cast("string")

    n = F.size(toks)
    n_blocks = F.ceil(n / F.lit(SC_BLOCK)).cast("int")
    gates = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda b: F.pmod(
            hash28(F.concat(F.lit("sc:"), did, F.lit(":"), b.cast("string"))),
            F.lit(SC_GATE),
        )
        == 0,
    )
    base = docs.select(
        "doc_id", toks.alias("toks"), n.alias("n"), gates.alias("gates")
    )
    g = F.col("gates")
    nn = F.col("n")
    corrupted = F.transform(
        F.sequence(F.lit(1), nn),
        lambda i: F.when(
            F.element_at(g, (F.floor((i - 1) / SC_BLOCK) + 1).cast("int")),
            F.lit("<mask>"),
        ).otherwise(F.element_at(F.col("toks"), i)),
    )
    # per gated block, the masked-token count is the block size (SC_BLOCK,
    # except a short final block)
    n_masked = F.aggregate(
        F.zip_with(
            g,
            F.sequence(F.lit(0), F.size(g) - 1),
            lambda gate, b: F.when(
                gate, F.least(F.lit(SC_BLOCK), nn - b * SC_BLOCK)
            ).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_spans = F.size(F.filter(g, lambda x: x))
    return base.select(
        "doc_id",
        nn.cast("int").alias("n_tokens"),
        n_masked.cast("int").alias("n_masked"),
        n_spans.cast("int").alias("n_spans"),
        F.md5(F.concat_ws(" ", corrupted)).alias("corrupted_md5"),
    )


TP_SPAN_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS toks FROM documents
), m AS (
  SELECT doc_id, toks, len(toks) AS n,
    list_transform(range(1, len(toks) + 1), i ->
      ({_HASH28.format(x="'sc:' || CAST(doc_id AS VARCHAR) || ':' || CAST((i - 1) // " + str(SC_BLOCK) + " AS VARCHAR)")}) % {SC_GATE} = 0
    ) AS gates
  FROM t
)
SELECT doc_id,
  CAST(n AS INTEGER) AS n_tokens,
  CAST(len(list_filter(range(1, n + 1), i -> gates[i])) AS INTEGER) AS n_masked,
  CAST(len(list_distinct(list_transform(
         list_filter(range(1, n + 1), i -> gates[i]),
         i -> (i - 1) // {SC_BLOCK}))) AS INTEGER) AS n_spans,
  md5(array_to_string(list_transform(range(1, n + 1),
        i -> CASE WHEN gates[i] THEN '<mask>' ELSE toks[i] END), ' '))
    AS corrupted_md5
FROM m
"""


def tp_detokenize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: id→text decode fidelity — encode every document to vocabulary
    ids (tp_token_ids' path), decode back through the id→word table
    (posexplode → join → ordered reassembly), and certify the round trip
    against the whitespace-normalized original. The check a tokenizer
    deployment pipeline runs before training: lossless ids or the run is
    garbage. roundtrip_ok is TRUE for every row by construction (the
    vocab is corpus-trained, no OOV) — the oracle proves the decode
    chain, not the flag's tautology, via the decoded md5."""
    docs = read_corpus(spark, sf_dir, "documents")
    vocab = tokenizer.vocab_ids(docs)
    enc = tokenizer.encode_token_ids(docs, vocab)
    ids = enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    )
    dec = ids.join(vocab.select("token_id", "word"), "token_id")
    rejoined = dec.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("word")))
                ),
                lambda s: s["word"],
            ),
        ).alias("decoded"),
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    orig = docs.select("doc_id", F.md5(norm).alias("orig_md5"))
    return rejoined.join(orig, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.md5("decoded").alias("decoded_md5"),
        (F.md5(F.col("decoded")) == F.col("orig_md5")).alias("roundtrip_ok"),
    )


TP_DETOK_ORACLE = f"""
WITH words AS (
  SELECT w AS word, count(*) AS freq
  FROM (SELECT unnest({_TOKENS}) AS w FROM documents) GROUP BY w
), vocab AS (
  SELECT word,
         CAST(row_number() OVER (ORDER BY freq DESC, word ASC) - 1 AS INTEGER)
           AS token_id
  FROM words
), ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) + 1),
                               i -> struct_pack(pos := i - 1, word := t[i]))) AS u
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), pos_words AS (
  SELECT doc_id, u.pos AS pos, u.word AS word FROM ex
), enc AS (
  SELECT e.doc_id, e.pos, v.token_id
  FROM pos_words e LEFT JOIN vocab v USING (word)
), dec AS (
  SELECT enc.doc_id, enc.pos, v2.word
  FROM enc JOIN vocab v2 USING (token_id)
), rejoined AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
         string_agg(word, ' ' ORDER BY pos) AS decoded
  FROM dec GROUP BY doc_id
)
SELECT r.doc_id, r.n_tokens,
       md5(r.decoded) AS decoded_md5,
       md5(r.decoded) = md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g'))
         AS roundtrip_ok
FROM rejoined r JOIN documents d ON r.doc_id = d.doc_id
"""


SIL_PAYLOAD = 128


def mm_silence_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: audio silence trimming — synthesize a WAV with doc-dependent
    leading/trailing zero-sample runs around a {SIL_PAYLOAD}-sample
    nonzero payload, decode the PCM (llm/multimodal.py::decode_audio),
    and find the first/last nonzero sample in an Arrow kernel (the VAD
    pre-step every speech-training pipeline runs). The oracle states the
    trim offsets and the trimmed payload's sum in closed form, so an
    off-by-one anywhere in decode → scan → slice hash-fails.

    Scale: per-row kernels, zero shuffle."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                lead = d % 32
                tail = (d * 7) % 32
                body = (d + np.arange(SIL_PAYLOAD) * 37) % 251 + 1
                samples = np.concatenate(
                    [np.zeros(lead), body, np.zeros(tail)]
                ).astype(np.int16)
                payloads.append(wav_encode(samples, 8000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def trim(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["samples"]):
                if buf is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                v = np.frombuffer(buf, "<i2").astype(np.int64)
                nz = np.flatnonzero(v)
                if len(nz) == 0:
                    rows.append((int(i), len(v), None, None, None))
                    continue
                s, e = int(nz[0]), int(nz[-1]) + 1
                rows.append((int(i), len(v), s, e, int(v[s:e].sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "trim_start", "trim_end", "sum_trimmed"],
            )

    return decoded.mapInPandas(
        trim,
        schema=(
            "doc_id long, n_samples int, trim_start int, trim_end int, "
            "sum_trimmed bigint"
        ),
    )


MM_SILENCE_ORACLE = f"""
SELECT doc_id,
       CAST(doc_id % 32 + {SIL_PAYLOAD} + (doc_id * 7) % 32 AS INTEGER)
         AS n_samples,
       CAST(doc_id % 32 AS INTEGER) AS trim_start,
       CAST(doc_id % 32 + {SIL_PAYLOAD} AS INTEGER) AS trim_end,
       CAST(list_sum(list_transform(range(0, {SIL_PAYLOAD}),
              k -> (doc_id + k * 37) % 251 + 1)) AS BIGINT) AS sum_trimmed
FROM documents
"""


def dd_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: URL canonicalization dedup — the crawl-frontier dedup step:
    scheme variants, host case, a www. prefix, default ports, trailing
    slashes and (allowlisted) query-parameter order all collapse to one
    canonical form, which then keys an exact-match cluster. The synth
    URL embeds doc-dependent junk around a doc_id%{URL_SITES}-determined
    canonical identity, so ~{URL_SITES} clusters emerge; the
    canonicalization itself runs on the URL STRING (parse_url + string
    ops — real work), while the oracle states the canonical form closed-
    form from doc_id and replays the clustering."""
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("Site")).otherwise(F.lit("site")),
        (d % URL_SITES).cast("string"),
        F.lit(".example.com"),
        F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/page"),
        (d % 3).cast("string"),
        F.when(d % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("?b=2&a=1")),
    )
    with_url = docs.withColumn("url", url)
    host = F.regexp_replace(
        F.lower(F.parse_url(F.col("url"), F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.parse_url(F.col("url"), F.lit("PATH")), r"/$", ""
    )
    qa = F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("a"))
    qb = F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("b"))
    canon = F.concat(
        host, path, F.lit("?a="), qa, F.lit("&b="), qb
    )
    canoned = with_url.select("doc_id", canon.alias("canonical_url"))
    firsts = canoned.groupBy("canonical_url").agg(
        F.min("doc_id").alias("cluster_min")
    )
    return canoned.join(firsts, "canonical_url").select(
        "doc_id",
        "canonical_url",
        "cluster_min",
        (F.col("doc_id") != F.col("cluster_min")).alias("is_dup"),
    )


URL_SITES = 40


DD_URL_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         'site' || CAST(doc_id % {URL_SITES} AS VARCHAR) || '.example.com'
           || '/docs/page' || CAST(doc_id % 3 AS VARCHAR)
           || '?a=1&b=2' AS canonical_url
  FROM documents
), f AS (
  SELECT canonical_url, min(doc_id) AS cluster_min FROM c GROUP BY 1
)
SELECT c.doc_id, c.canonical_url, f.cluster_min,
       c.doc_id != f.cluster_min AS is_dup
FROM c JOIN f USING (canonical_url)
"""


def tp_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: sequence-length bucketing — group documents into power-of-two
    token-length buckets (the batching strategy that keeps padding waste
    down when fixed-shape batches are built per bucket) and report each
    bucket's padding overhead: padded_tokens = bucket_len × n_docs vs the
    real token total. The bucket boundary is computed with INTEGER ops
    only (1 << bit_length(n-1), via the binary-string length both engines
    expose) — no float log2, whose boundary rounding differs per engine.

    Scale: one scan + one tiny (≤ ~20 buckets) aggregate; waste_frac is
    one exact-bigint double division — bit-stable."""
    docs = read_corpus(spark, sf_dir, "documents")
    n = F.size(tokenize("text"))
    bits = F.length(F.bin((n - 1).cast("long")))
    bucket = F.when(n <= 1, F.lit(1).cast("long")).otherwise(
        F.call_function("shiftleft", F.lit(1).cast("long"), bits.cast("int")).cast(
            "long"
        )
    )
    per_doc = docs.select(n.alias("n_tokens"), bucket.alias("bucket_len"))
    agg = per_doc.groupBy("bucket_len").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    padded = F.col("bucket_len") * F.col("n_docs")
    return agg.select(
        "bucket_len",
        "n_docs",
        "total_tokens",
        padded.cast("bigint").alias("padded_tokens"),
        (
            (padded - F.col("total_tokens")).cast("double")
            / padded.cast("double")
        ).alias("pad_waste_frac"),
    )


TP_LENBUCKET_ORACLE = f"""
WITH t AS (
  SELECT len({_TOKENS}) AS n FROM documents
), b AS (
  SELECT n,
         CASE WHEN n <= 1 THEN CAST(1 AS BIGINT)
              ELSE CAST((CAST(1 AS BIGINT) << length(bin(n - 1))) AS BIGINT)
         END AS bucket_len
  FROM t
), agg AS (
  SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens
  FROM b GROUP BY 1
)
SELECT bucket_len, n_docs, total_tokens,
       CAST(bucket_len * n_docs AS BIGINT) AS padded_tokens,
       CAST(bucket_len * n_docs - total_tokens AS DOUBLE)
         / CAST(bucket_len * n_docs AS DOUBLE) AS pad_waste_frac
FROM agg
"""


SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90


def tp_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: deterministic train/val/test split — every doc routes to a
    split by a salted-hash gate on its id (hash28('split:'||doc_id) mod
    100: <{SPLIT_TRAIN_PCT} train, <{SPLIT_VAL_PCT} val, else test), so
    the assignment is reproducible across runs, machines and engines —
    no rand(), no global sort. The output is the stratification audit:
    per (source, split) counts and the within-source fraction, the table
    a data-governance check reads to confirm no source leaked wholly
    into eval.

    Scale: one scan + one (source × 3)-row aggregate; the within-source
    normalizer rides a partitionBy(source) window over that tiny table."""
    docs = read_corpus(spark, sf_dir, "documents")
    gate = F.pmod(
        hash28(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    split = (
        F.when(gate < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(gate < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    counts = docs.select("source", split.alias("split")).groupBy(
        "source", "split"
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    w = Window.partitionBy("source")
    return counts.select(
        "source",
        "split",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("source_frac"),
    )


TP_SPLIT_ORACLE = f"""
WITH g AS (
  SELECT source,
         ({_HASH28.format(x="'split:' || CAST(doc_id AS VARCHAR)")}) % 100
           AS gate
  FROM documents
), s AS (
  SELECT source,
         CASE WHEN gate < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN gate < {SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM g
), counts AS (
  SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
  FROM s GROUP BY 1, 2
)
SELECT source, split, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE)
         AS source_frac
FROM counts
"""


def ts_novel_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: n-gram novelty scoring — the share of each document's distinct
    3-token shingles that appear in NO other document (document frequency
    1 across the corpus). High-novelty docs carry information the corpus
    doesn't already have; low-novelty docs are template/boilerplate
    candidates even when no single near-dup partner exists (the signal
    Jaccard pair-mining misses).

    Scale: explode distinct shingles once, ONE shingle-key aggregate for
    document frequency, join back on the shingle (both sides row-scale —
    a genuine shuffle join, same shape as the dd_ngram_jaccard index),
    then one doc-key aggregate. novelty_frac is one exact-bigint double
    division — bit-stable."""
    docs = read_corpus(spark, sf_dir, "documents")
    doc_sh = docs.select(
        "doc_id", F.explode(shingles(tokenize("text"), 3)).alias("sh")
    )
    df_counts = doc_sh.groupBy("sh").agg(
        F.count("*").cast("bigint").alias("df")
    )
    joined = doc_sh.join(df_counts, "sh")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum((F.col("df") == 1).cast("bigint")).cast("bigint").alias("n_novel"),
        (
            F.sum((F.col("df") == 1).cast("bigint")).cast("double")
            / F.count("*").cast("double")
        ).alias("novelty_frac"),
    )


TS_NOVEL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), doc_sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS sh FROM t
), dfc AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM doc_sh GROUP BY sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novelty_frac
FROM doc_sh JOIN dfc USING (sh)
GROUP BY doc_id
"""


def mm_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: ViT patch-grid extraction — synthesize the same 32×32
    block-structured grayscale images as ``mm_phash_dedup`` (pixel(r,c) =
    (37·(doc_id mod {PHASH_VARIANTS}) + 3·(r//4) + 5·(c//4)) mod 256),
    then split each into the 4×4 grid of 8×8 patches with per-patch
    mean/min/max (``multimodal.patchify_stats``) — the tiling step a
    vision-transformer pipeline runs before patch embedding. Because the
    synth is constant on 4×4 blocks, each 8×8 patch covers exactly four
    block values (16 px each) and the oracle states every patch's
    statistics in closed form — an indexing or tiling bug anywhere in
    the kernel hash-fails.

    Scale: synth + tiling are scan-local Arrow kernels, zero shuffle;
    16 output rows per image."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        rr = np.arange(32)[:, None] // 4
        cc = np.arange(32)[None, :] // 4
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                px = ((37 * (int(d) % PHASH_VARIANTS) + 3 * rr + 5 * cc) % 256).astype(
                    np.uint8
                )
                rows.append((int(d), 32, 32, "L", px.tobytes()))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mode", "pixels"]
            )

    imgs = docs.mapInPandas(synth, schema=multimodal.DECODED_IMAGE_SCHEMA)
    return multimodal.patchify_stats(imgs, patch=8).select(
        F.col("id").alias("doc_id"),
        "patch_row",
        "patch_col",
        "p_mean",
        "p_min",
        "p_max",
    )


def _patchify_oracle() -> str:
    """Closed-form patch stats: patch (pr, pc) covers block values
    b(i, j) = (37·m + 3·(2pr+i) + 5·(2pc+j)) mod 256 for i, j in {0, 1},
    16 pixels each."""
    m = f"(37 * (doc_id % {PHASH_VARIANTS}))"
    terms = [
        f"(({m} + 3 * (2 * pr + {i}) + 5 * (2 * pc + {j})) % 256)"
        for i in (0, 1)
        for j in (0, 1)
    ]
    tsum = " + ".join(terms)
    tlist = ", ".join(terms)
    return f"""
SELECT doc_id,
       CAST(pr AS INTEGER) AS patch_row,
       CAST(pc AS INTEGER) AS patch_col,
       CAST(16 * ({tsum}) AS DOUBLE) / 64 AS p_mean,
       CAST(least({tlist}) AS INTEGER) AS p_min,
       CAST(greatest({tlist}) AS INTEGER) AS p_max
FROM documents,
     (SELECT unnest(range(0, 4)) AS pr),
     (SELECT unnest(range(0, 4)) AS pc)
"""


IMGNORM_SIDE = 16


def mm_image_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: dataset-level channel normalization stats — synthesize one
    {IMGNORM_SIDE}×{IMGNORM_SIDE} RGB image per document (pixel(r,c,ch) =
    (doc_id + 3r + 5c + 77ch) mod 256), collect per-image exact integer
    pixel moments (``multimodal.channel_sums``), and reduce to the
    per-channel corpus mean/variance — the pass that produces the
    mean/std constants every vision training job normalizes with. All
    accumulation is exact BIGINT; mean and variance are the only float
    ops (division, then var = E[x²] − mean², the same expression shape
    on both engines — bit-stable).

    Scale: decode moments are scan-local Arrow kernels; the reduce
    shuffles 3 BIGINTs per image per channel into a 3-row aggregate."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    side = IMGNORM_SIDE

    def synth(batches):
        r = np.arange(side)[:, None, None]
        c = np.arange(side)[None, :, None]
        ch = np.arange(3)[None, None, :]
        base = 3 * r + 5 * c + 77 * ch
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                px = ((int(d) + base) % 256).astype(np.uint8)
                rows.append((int(d), side, side, "RGB", px.tobytes()))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mode", "pixels"]
            )

    imgs = docs.mapInPandas(synth, schema=multimodal.DECODED_IMAGE_SCHEMA)
    moments = multimodal.channel_sums(imgs)
    agg = moments.groupBy("channel").agg(
        F.sum("n_pixels").cast("bigint").alias("n_pixels"),
        F.sum("psum").cast("bigint").alias("psum"),
        F.sum("psumsq").cast("bigint").alias("psumsq"),
    )
    mean = F.col("psum").cast("double") / F.col("n_pixels").cast("double")
    return agg.select(
        "channel",
        "n_pixels",
        "psum",
        "psumsq",
        mean.alias("mean_px"),
        (
            F.col("psumsq").cast("double") / F.col("n_pixels").cast("double")
            - mean * mean
        ).alias("var_px"),
    )


MM_IMGNORM_ORACLE = f"""
WITH px AS (
  SELECT doc_id, ch,
         (doc_id + 3 * r + 5 * c + 77 * ch) % 256 AS v
  FROM documents,
       (SELECT unnest(range(0, {IMGNORM_SIDE})) AS r),
       (SELECT unnest(range(0, {IMGNORM_SIDE})) AS c),
       (SELECT unnest(range(0, 3)) AS ch)
), agg AS (
  SELECT CAST(ch AS INTEGER) AS channel,
         CAST(count(*) AS BIGINT) AS n_pixels,
         CAST(sum(v) AS BIGINT) AS psum,
         CAST(sum(v * v) AS BIGINT) AS psumsq
  FROM px GROUP BY 1
)
SELECT channel, n_pixels, psum, psumsq,
       CAST(psum AS DOUBLE) / CAST(n_pixels AS DOUBLE) AS mean_px,
       CAST(psumsq AS DOUBLE) / CAST(n_pixels AS DOUBLE)
         - (CAST(psum AS DOUBLE) / CAST(n_pixels AS DOUBLE))
         * (CAST(psum AS DOUBLE) / CAST(n_pixels AS DOUBLE)) AS var_px
FROM agg
"""


def ts_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: C4-style cleaning rule flags — the published C4 heuristics as
    per-doc verdict columns (no rows dropped, same auditability contract
    as the Gopher family): sentence count (terminal-punctuation runs),
    terminal-punctuation ending, curly-brace/code-markup ratio, and the
    boilerplate badword gate ('javascript' / 'lorem ipsum'). keep_c4 is
    the conjunction.

    Scale: per-row regexp counts, zero shuffle, parquet-scan speed."""
    docs = read_corpus(spark, sf_dir, "documents")
    txt = F.lower(F.col("text"))
    n_sent = F.regexp_count(txt, F.lit(r"[.!?]+"))
    ends_punct = F.trim(txt).rlike(r'[.!?"]$')
    n_code = F.regexp_count(txt, F.lit(r"[{}<>\[\]]"))
    code_ratio = n_code.cast("double") / F.length(txt).cast("double")
    bad = txt.contains("javascript") | txt.contains("lorem ipsum")
    return docs.select(
        "doc_id",
        n_sent.cast("int").alias("n_sentences"),
        ends_punct.alias("ends_punct"),
        code_ratio.alias("code_ratio"),
        bad.alias("has_badword"),
        (
            (n_sent >= 3)
            & ends_punct
            & (code_ratio <= F.lit(0.02))
            & ~bad
        ).alias("keep_c4"),
    )


TS_C4_ORACLE = """
WITH f AS (
  SELECT doc_id, lower(text) AS t FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[.!?]+')) AS INTEGER) AS n_sentences,
         regexp_matches(trim(t), '[.!?"]$') AS ends_punct,
         CAST(len(regexp_extract_all(t, '[{}<>\\[\\]]')) AS DOUBLE)
           / CAST(length(t) AS DOUBLE) AS code_ratio,
         (t LIKE '%javascript%' OR t LIKE '%lorem ipsum%') AS has_badword
  FROM f
)
SELECT doc_id, n_sentences, ends_punct, code_ratio, has_badword,
       (n_sentences >= 3 AND ends_punct AND code_ratio <= 0.02
        AND NOT has_badword) AS keep_c4
FROM m
"""


def ts_char_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: character-distribution Gini impurity — 1 − Σ pᵢ² over the
    per-doc character frequency distribution (whitespace excluded): a
    gibberish/degenerate-text detector that needs NO logarithm (unlike
    Shannon entropy, whose ln is not correctly rounded and differs
    across engines) — the only float ops are one division and one
    subtraction of exact integers, bit-stable.

    Scale: zero shuffle — chars sort per row and Σ cᵢ² comes from ONE
    run-length fold over the sorted array (the same O(L log L) pattern
    as repetition_stats; the naive distinct × filter count is O(L²)
    interpreted-HOF work)."""
    docs = read_corpus(spark, sf_dir, "documents")
    s = F.regexp_replace(F.lower(F.col("text")), r"\s+", "")
    chars = F.array_sort(F.split(s, ""))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("sumsq"),
    )

    def merge(acc, x):
        return F.when(
            x == acc["prev"],
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["sumsq"].alias("sumsq"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["sumsq"] + acc["run"] * acc["run"]).alias("sumsq"),
            )
        )

    sumsq = F.aggregate(
        chars,
        init,
        merge,
        lambda acc: acc["sumsq"] + acc["run"] * acc["run"],
    )
    n = F.length(s).cast("long")
    # whitespace-only docs have no character distribution (and Spark's
    # split('', '') artifact would count one empty-string char) — both
    # sides exclude them
    base = docs.select(
        "doc_id", n.alias("n_chars_nospace"), sumsq.alias("char_sumsq")
    ).filter(F.col("n_chars_nospace") > 0)
    return base.select(
        "doc_id",
        "n_chars_nospace",
        "char_sumsq",
        (
            F.lit(1.0)
            - F.col("char_sumsq").cast("double")
            / (F.col("n_chars_nospace") * F.col("n_chars_nospace")).cast("double")
        ).alias("char_gini"),
    )


TS_GINI_ORACLE = """
WITH s AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS t
  FROM documents
), cc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(string_split(t, '')) AS ch FROM s)
  GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars_nospace,
         CAST(sum(cnt * cnt) AS BIGINT) AS char_sumsq
  FROM cc GROUP BY 1
)
SELECT doc_id, n_chars_nospace, char_sumsq,
       1.0 - CAST(char_sumsq AS DOUBLE)
           / CAST(n_chars_nospace * n_chars_nospace AS DOUBLE) AS char_gini
FROM agg
"""


def tp_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: tokenizer fertility by language — sub-word tokens per
    whitespace word (the metric multilingual tokenizer evaluations
    report per language: high fertility = the vocab serves that language
    poorly and its documents cost more sequence length per word). Uses
    the BPE-ish regex tokenizer vs the whitespace tokenizer; also
    reports characters per sub-word token.

    Scale: per-row counts, one lang-cardinality aggregate; ratios are
    exact-bigint double divisions — bit-stable."""
    docs = read_corpus(spark, sf_dir, "documents")
    from us_dot_flights_lakehouse_spark.functions.text import bpe_ish_tokens

    bpe = bpe_ish_tokens("text")
    per_doc = docs.select(
        "lang",
        F.size(tokenize("text")).cast("long").alias("ws"),
        F.size(bpe).cast("long").alias("bp"),
        F.aggregate(
            F.transform(bpe, F.length), F.lit(0), lambda a, x: a + x
        )
        .cast("long")
        .alias("bp_chars"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bp").cast("bigint").alias("bpe_tokens"),
        F.sum("bp_chars").cast("bigint").alias("bpe_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        (F.col("bpe_tokens").cast("double") / F.col("ws_tokens").cast("double")).alias(
            "fertility"
        ),
        (F.col("bpe_chars").cast("double") / F.col("bpe_tokens").cast("double")).alias(
            "chars_per_token"
        ),
    )


TP_FERTILITY_ORACLE = f"""
WITH d AS (
  SELECT lang,
         CAST(len({_TOKENS}) AS BIGINT) AS ws,
         CAST(len({_BPE}) AS BIGINT) AS bp,
         CAST(list_sum(list_transform({_BPE}, x -> length(x))) AS BIGINT)
           AS bp_chars
  FROM documents
), agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS ws_tokens,
         CAST(sum(bp) AS BIGINT) AS bpe_tokens,
         CAST(sum(bp_chars) AS BIGINT) AS bpe_chars
  FROM d GROUP BY 1
)
SELECT lang, n_docs, ws_tokens, bpe_tokens,
       CAST(bpe_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE) AS fertility,
       CAST(bpe_chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE) AS chars_per_token
FROM agg
"""


PREFIX_LEN = 8


def dd_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: shared-prefix boilerplate clustering — fingerprint each
    document's first {PREFIX_LEN} tokens and cluster exact prefix
    matches: the cheap detector for template/boilerplate families
    (scraped pages sharing a header, license preambles) that full-text
    exact dedup misses because the tails differ. Docs shorter than the
    prefix are excluded (their 'prefix' is the whole doc — that is
    exact dedup's job).

    Scale: one md5 per doc + one groupBy on the 16-byte key — the
    cheapest clustering shuffle there is."""
    docs = read_corpus(spark, sf_dir, "documents")
    toks = tokenize("text")
    base = docs.select("doc_id", toks.alias("t")).filter(
        F.size("t") >= PREFIX_LEN
    )
    fp = F.md5(F.concat_ws(" ", F.slice(F.col("t"), 1, PREFIX_LEN)))
    fps = base.select("doc_id", fp.alias("prefix_fp"))
    firsts = fps.groupBy("prefix_fp").agg(
        F.min("doc_id").alias("cluster_min"),
        F.count("*").cast("bigint").alias("cluster_size"),
    )
    return fps.join(firsts, "prefix_fp").select(
        "doc_id",
        "prefix_fp",
        "cluster_min",
        "cluster_size",
        (F.col("doc_id") != F.col("cluster_min")).alias("is_dup"),
    )


DD_PREFIX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), fps AS (
  SELECT doc_id, md5(array_to_string(t[1:{PREFIX_LEN}], ' ')) AS prefix_fp
  FROM t WHERE len(t) >= {PREFIX_LEN}
), firsts AS (
  SELECT prefix_fp, min(doc_id) AS cluster_min,
         CAST(count(*) AS BIGINT) AS cluster_size
  FROM fps GROUP BY 1
)
SELECT f.doc_id, f.prefix_fp, g.cluster_min, g.cluster_size,
       f.doc_id != g.cluster_min AS is_dup
FROM fps f JOIN firsts g USING (prefix_fp)
"""


KNN_K = 5


def sim_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: k-NN label recovery — for each query vector, the majority
    label among its {KNN_K} exact cosine neighbors (self excluded)
    versus its own label: the standard embedding-quality probe (kNN
    accuracy) run before committing a representation to retrieval or
    curriculum use. Composes ``similarity.cosine_topk`` (broadcast
    queries × one corpus scan) with a label join and a count-majority
    vote (ties break toward the smaller label id — deterministic).

    Scale: the vote aggregates k rows per query; labels join via
    broadcast-sized id lookups."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    topk = similarity.cosine_topk(emb, qs, k=KNN_K)
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )
    truth = labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
        "label", "true_label"
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        F.col("n_votes").cast("bigint").alias("n_votes"),
        (F.col("pred_label") == F.col("true_label")).alias("knn_correct"),
    )


SIM_KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, label, v, {_VEC_NORM} AS nrm FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nl,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
           / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
), topk AS (
  SELECT query_id, neighbor_id, nl FROM (
    SELECT query_id, neighbor_id, nl,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {KNN_K}
), votes AS (
  SELECT query_id, nl AS label, count(*) AS n_votes
  FROM topk GROUP BY 1, 2
), pred AS (
  SELECT query_id, label AS pred_label, CAST(n_votes AS BIGINT) AS n_votes
  FROM (
    SELECT query_id, label, n_votes,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY n_votes DESC, label ASC) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT p.query_id, t.label AS true_label, p.pred_label, p.n_votes,
       p.pred_label = t.label AS knn_correct
FROM pred p JOIN e t ON p.query_id = t.vec_id
"""


DSIR_TARGET_LANG = "en"


def tp_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: DSIR-style importance-resampling weights — score every
    document by how target-like its unigram distribution is (Xie et al.,
    'Data Selection for Language Models via Importance Resampling'):
    weight(doc) = Π over its token stream of
    (c_target(w)+1)·(N_corpus+V) / ((c_corpus(w)+1)·(N_target+V)),
    the add-1-smoothed likelihood ratio between the target domain (lang
    '{DSIR_TARGET_LANG}') and the whole corpus. No logarithms (ln is
    not correctly rounded cross-engine): each token contributes ONE
    double division of exact bigint products, and the per-doc product
    folds in token-POSITION order on both engines — bit-stable.

    Scale: two word-count aggregates + one token join (row-scale, the
    tfidf shape) + one doc-key reassembly; global totals ride 1-row
    broadcast aggregates, never a driver collect."""
    docs = read_corpus(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.posexplode(tokenize("text")).alias("pos", "w")
    )
    corpus_counts = toks.groupBy("w").agg(
        F.count("*").cast("bigint").alias("c_c"),
        F.sum((F.col("lang") == DSIR_TARGET_LANG).cast("bigint"))
        .cast("bigint")
        .alias("c_t"),
    )
    totals = corpus_counts.agg(
        F.sum("c_c").cast("bigint").alias("n_c"),
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.count("*").cast("bigint").alias("v"),
    )
    ratio = (
        ((F.col("c_t") + 1) * (F.col("n_c") + F.col("v"))).cast("double")
        / ((F.col("c_c") + 1) * (F.col("n_t") + F.col("v"))).cast("double")
    )
    scored = (
        toks.join(corpus_counts, "w")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "pos", ratio.alias("r"))
    )
    folded = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("r")))),
            F.lit(1.0),
            lambda acc, x: acc * x["r"],
        ).alias("dsir_weight"),
    )
    return folded.select(
        "doc_id",
        "n_tokens",
        "dsir_weight",
        (F.col("dsir_weight") > F.lit(1.0)).alias("target_like"),
    )


TP_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, u.pos AS pos, u.w AS w
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> struct_pack(pos := i - 1, w := t[i])))
             AS u
    FROM (SELECT doc_id, lang, {_TOKENS} AS t FROM documents)
  )
), counts AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c_c,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t
  FROM toks GROUP BY w
), tot AS (
  SELECT CAST(sum(c_c) AS BIGINT) AS n_c, CAST(sum(c_t) AS BIGINT) AS n_t,
         CAST(count(*) AS BIGINT) AS v
  FROM counts
), scored AS (
  SELECT t.doc_id, t.pos,
         CAST((c.c_t + 1) * (n_c + v) AS DOUBLE)
           / CAST((c.c_c + 1) * (n_t + v) AS DOUBLE) AS r
  FROM toks t JOIN counts c USING (w), tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                list(r ORDER BY pos)),
                   (acc, x) -> acc * x) AS dsir_weight,
       list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                list(r ORDER BY pos)),
                   (acc, x) -> acc * x) > 1.0 AS target_like
FROM scored
GROUP BY doc_id
"""


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: per-label centroid (class prototype) computation — the mean
    embedding per label and dimension, the prototype step behind
    nearest-class-mean classifiers, prototype networks and centroid
    seeding. Float addition is order-dependent, so each (label, dim)
    cell folds its components in vec_id order (collect → sort → one
    fold), mirrored by the oracle's ordered list_sum — bit-stable under
    any partitioning; mean is one further double division.

    Scale: posexplode fans out to rows × dim, then ONE (label, dim)
    aggregate; per-cell lists grow with class size — for 100 TB swap
    the sorted fold for a two-level fixed-boundary tree reduction
    (partial folds per vec_id range, then fold the partials in range
    order)."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "val"
        ),
    )
    agg = comp.groupBy("label", "dim").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("vec_id"), F.col("val")))),
            F.lit(0.0),
            lambda acc, x: acc + x["val"],
        ).alias("s"),
    )
    return agg.select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        "n_vecs",
        (F.col("s") / F.col("n_vecs").cast("double")).alias("centroid"),
    )


SIM_CENTROID_ORACLE = """
WITH comp AS (
  SELECT label, vec_id, u.dim, u.val
  FROM (
    SELECT label, vec_id,
           unnest(list_transform(range(1, len(embedding) + 1),
                                 i -> struct_pack(dim := i - 1,
                                                  val := CAST(embedding[i] AS DOUBLE))))
             AS u
    FROM embeddings
  )
), agg AS (
  SELECT label, CAST(dim AS INTEGER) AS dim,
         CAST(count(*) AS BIGINT) AS n_vecs,
         list_sum(list(val ORDER BY vec_id)) AS s
  FROM comp GROUP BY 1, 2
)
SELECT label, dim, n_vecs, s / CAST(n_vecs AS DOUBLE) AS centroid
FROM agg
"""


BIN_N_FILES = 200


def src_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC: binary-file source — ingest a directory of raw binary blobs
    through Spark's ``binaryFile`` format (the standard entry point for
    image/audio corpora: one row per file with path, length, content),
    recover the record id from the file path, and emit length + content
    md5. The fixture files are synthesized deterministically from doc_id
    (payload byte j = (doc_id·7 + j) mod 256, length doc_id mod 50 + 10)
    so the oracle states every file's digest in closed form — any
    truncation or corruption in the scan hash-fails.

    Scale: binaryFile scans parallelize per file and prune with
    pathGlobFilter; for small-file corpora at 100 TB, compact into
    WebDataset shards (src_wds_roundtrip) instead."""
    import os
    import tempfile

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    out = f"{tempfile.gettempdir()}/us_dot_bin_{sf_tag}_v1"
    if not os.path.isdir(out):  # deterministic fixture, write-once
        # per-process tmp dir so concurrent runs never share a staging
        # area; a lost rename race (ENOTEMPTY: another writer won) is
        # success, since the content is deterministic (ADVICE r5)
        tmp = f"{out}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for d in range(BIN_N_FILES):
            payload = bytes((d * 7 + j) % 256 for j in range(d % 50 + 10))
            with open(f"{tmp}/doc_{d:05d}.bin", "wb") as fh:
                fh.write(payload)
        try:
            os.rename(tmp, out)
        except OSError:
            if not os.path.isdir(out):
                raise
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    doc_id = F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1).cast("long")
    # only ids present in the documents table (sf0.001 has < BIN_N_FILES)
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")
    return (
        back.select(
            doc_id.alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .join(docs, "doc_id")
    )


def _binary_oracle() -> str:
    import hashlib

    rows = []
    for d in range(BIN_N_FILES):
        payload = bytes((d * 7 + j) % 256 for j in range(d % 50 + 10))
        rows.append(f"({d}, {len(payload)}, '{hashlib.md5(payload).hexdigest()}')")
    values = ",\n".join(rows)
    return f"""
WITH fixture(doc_id, n_bytes, content_md5) AS (VALUES {values})
SELECT d.doc_id, CAST(f.n_bytes AS BIGINT) AS n_bytes, f.content_md5
FROM fixture f JOIN documents d ON f.doc_id = d.doc_id
"""


def dd_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: quality-aware keeper selection — resolve MinHash-LSH near-dup
    pairs to connected components (``curation.dup_clusters``), then keep
    the HIGHEST-QUALITY member of each cluster (longest text, doc_id
    tiebreak) instead of the arbitrary min-id: the curation policy real
    pipelines want ('keep the canonical page, drop the truncated
    scrapes'). Composes three families — LSH pair mining, iterative
    component resolution, and per-cluster argmax.

    Scale: pair mining is LSH-bucketed; components iterate only the pair
    graph; the argmax is one cluster-key window over cluster-sized
    partitions."""
    docs = read_corpus(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
    labels = curation.dup_clusters(docs.select("doc_id"), pairs)
    member = labels.withColumnRenamed("node", "doc_id").join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = member.withColumn("rk", F.row_number().over(w))
    keepers = ranked.filter(F.col("rk") == 1).select(
        "cluster_id", F.col("doc_id").alias("keeper_id")
    )
    return ranked.join(keepers, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "n_chars",
        "keeper_id",
        (F.col("doc_id") == F.col("keeper_id")).alias("keep"),
    )


DD_KEEPBEST_ORACLE = f"""
WITH RECURSIVE pairs AS ({DD_MINHASH_ORACLE}),
edges AS (
  SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
),
reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM documents
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
labels AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
),
member AS (
  SELECT l.doc_id, l.cluster_id, d.n_chars,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id ASC) AS rk
  FROM labels l JOIN documents d USING (doc_id)
),
keepers AS (
  SELECT cluster_id, doc_id AS keeper_id FROM member WHERE rk = 1
)
SELECT m.doc_id, m.cluster_id, m.n_chars, k.keeper_id,
       m.doc_id = k.keeper_id AS keep
FROM member m JOIN keepers k USING (cluster_id)
"""


EPOCH_TOKEN_BUDGET = 1_000_000


def tp_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: per-source epoch schedule — given a total training token
    budget and the temperature-scaled mix weights (tp_temperature_mix's
    α=0.5 rule), how many PASSES over each source its share implies:
    epochs = budget·weight / source_tokens, reported with the ceiling
    epoch count a repeat-based loader would materialize. The LLaMA-style
    data-recipe table ('books ×2.4, code ×0.6').

    Scale: one per-source aggregate; the normalizer folds per-source
    sqrt terms in source order (bit-stable, as tp_temperature_mix); the
    division chain is double-deterministic."""
    docs = read_corpus(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(tokenize("text"))).cast("bigint").alias("src_tokens"),
    )
    norm = src.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("source", "n_docs"))),
                lambda s: F.sqrt(s["n_docs"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z")
    )
    weight = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    epochs = (
        F.lit(float(EPOCH_TOKEN_BUDGET)) * weight
        / F.col("src_tokens").cast("double")
    )
    return src.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "src_tokens",
        weight.alias("mix_weight"),
        epochs.alias("epochs"),
        F.ceil(epochs).cast("bigint").alias("epochs_ceil"),
    )


TP_EPOCHS_ORACLE = f"""
WITH src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKENS})) AS BIGINT) AS src_tokens
  FROM documents GROUP BY 1
), norm AS (
  SELECT list_sum(list_transform(
           list(struct_pack(s := source, n := n_docs) ORDER BY source),
           e -> sqrt(CAST(e.n AS DOUBLE)))) AS z
  FROM src
)
SELECT source, n_docs, src_tokens,
       sqrt(CAST(n_docs AS DOUBLE)) / z AS mix_weight,
       CAST({EPOCH_TOKEN_BUDGET} AS DOUBLE) * (sqrt(CAST(n_docs AS DOUBLE)) / z)
         / CAST(src_tokens AS DOUBLE) AS epochs,
       CAST(ceil(CAST({EPOCH_TOKEN_BUDGET} AS DOUBLE)
                 * (sqrt(CAST(n_docs AS DOUBLE)) / z)
                 / CAST(src_tokens AS DOUBLE)) AS BIGINT) AS epochs_ceil
FROM src, norm
"""


def ts_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: language-ID confusion matrix — the n-gram-lexicon classifier's
    predictions cross-tabulated against the corpus's labeled lang column,
    with per-true-language recall shares: the evaluation table any
    classifier-based curation gate ships with (how much Spanish leaks
    into the 'und' bucket?). Composes ``textstats.lang_id`` with a
    truth join and one (true, pred) aggregate; the share is one exact
    bigint division.

    Scale: scan-local scoring + a lang²-sized aggregate."""
    docs = read_corpus(spark, sf_dir, "documents")
    pred = textstats.lang_id(docs).select("doc_id", "lang_pred")
    truth = docs.select("doc_id", F.col("lang").alias("lang_true"))
    pairs = truth.join(pred, "doc_id")
    counts = pairs.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("lang_true")
    return counts.select(
        "lang_true",
        "lang_pred",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("true_lang_share"),
    )


def _lang_confusion_oracle() -> str:
    return f"""
WITH pred AS ({_lang_oracle()}),
pairs AS (
  SELECT d.lang AS lang_true, p.lang_pred
  FROM documents d JOIN pred p USING (doc_id)
), counts AS (
  SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
  FROM pairs GROUP BY 1, 2
)
SELECT lang_true, lang_pred, n_docs,
       CAST(n_docs AS DOUBLE)
         / CAST(sum(n_docs) OVER (PARTITION BY lang_true) AS DOUBLE)
         AS true_lang_share
FROM counts
"""


def sim_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: ANN recall audit — per query, how many of the exact
    brute-force top-{TOPK_K} cosine neighbors the IVF index (nprobe
    {IVF_NPROBE}) actually returned: the recall@k measurement every ANN
    deployment tracks before trusting an index. Composes the two
    oracle-proven retrieval paths and counts the overlap — recall is
    one exact bigint division.

    Scale: both retrievals are broadcast-probes × one scan; the audit
    join touches k rows per query."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = similarity.cosine_topk(emb, qs, k=TOPK_K).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.ivf_cosine_topk(
        emb, qs, k=TOPK_K, nlist=IVF_NLIST, nprobe=IVF_NPROBE, seed=IVF_SEED
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint"))
        .cast("bigint")
        .alias("n_recovered"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).cast("double")
            / F.count("*").cast("double")
        ).alias("recall_at_k"),
    )


def _ivf_recall_oracle() -> str:
    return f"""
WITH exact_k AS ({SIM_TOPK_ORACLE}),
ivf_k AS ({_ivf_oracle()}),
joined AS (
  SELECT e.query_id, e.neighbor_id,
         CASE WHEN i.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM exact_k e
  LEFT JOIN ivf_k i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(hit) AS BIGINT) AS n_recovered,
       CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_k
FROM joined GROUP BY query_id
"""


def sim_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: k-means objective audit — per-cell size and inertia
    (Σ‖x − c‖²) against the IVF-trained quantizer centroids: the
    convergence/quality number every clustering deployment tracks. This
    gives the k-means family an ORACLE-verified surface (kmeans_fit
    itself is unit-tested; float ULPs preclude a bit-exact oracle for
    the iterated centroids — so the audit uses the literal-centroid
    technique the IVF oracle established, with distances folded in
    vec_id order per cell for bit-stable float sums).

    Scale: one narrow scan for assignment (expression-only, literal
    centroids), one cell-key aggregate (nlist rows); per-cell fold lists
    grow with cell size — swap for fixed-boundary partial folds at
    100 TB (sim_label_centroids note)."""
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    emb = read_corpus(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = similarity.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", nlist=IVF_NLIST, seed=IVF_SEED
    )

    def sqdist(c):
        return F.aggregate(
            F.zip_with(F.col("v"), lit_doubles([float(x) for x in c]),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(
                    sqdist(c).alias("d"), F.lit(j).cast("int").alias("c")
                )
                for j, c in enumerate(cents.tolist())
            ]
        )
    )
    assigned = corpus.select(
        "vec_id", best["c"].alias("cell_id"), best["d"].alias("d")
    )
    return assigned.groupBy("cell_id").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("vec_id", "d"))),
            F.lit(0.0),
            lambda acc, x: acc + x["d"],
        ).alias("inertia"),
    )


DRIFT_NEW_MOD = 5  #: vec_id % 5 == 0 is the "newly arrived" batch


def sim_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: incremental ANN-index maintenance audit — when a new vector
    batch (vec_id ≡ 0 mod {DRIFT_NEW_MOD}, ~20%) is appended to an
    IVF index WITHOUT retraining the quantizer, which cells absorb the
    growth and which blow past the rebalance threshold? Per cell:
    base count, new-batch count, post-append total, growth share, and
    `needs_split` = cell now holds > 2× the mean cell size — the drift
    report that schedules centroid re-training in a production vector
    store (indexes are never retrained per batch at 100 TB; they are
    monitored and re-split when THIS table says so). Includes empty
    cells via a literal cell spine.

    Determinism: assignment is the literal-centroid argmin (ties to the
    lower cell id) proven by sim_ivf_topk; everything else is exact
    integer counts — `needs_split` compares n_full·nlist > 2·N in
    BIGINT, no float thresholds.

    Scale: one narrow scan, expression-only assignment, one ≤nlist-row
    aggregate; the spine join is a broadcast of {IVF_NLIST} rows."""
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    emb = read_corpus(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = similarity.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", nlist=IVF_NLIST, seed=IVF_SEED
    )

    def sqdist(c):
        return F.aggregate(
            F.zip_with(F.col("v"), lit_doubles(c), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(sqdist(c).alias("d"), F.lit(j).cast("int").alias("c"))
                for j, c in enumerate(cents.tolist())
            ]
        )
    )
    assigned = corpus.select(
        "vec_id",
        best["c"].alias("cell_id"),
        (F.pmod(F.col("vec_id"), F.lit(DRIFT_NEW_MOD)) == 0).alias("is_new"),
    )
    per_cell = assigned.groupBy("cell_id").agg(
        F.sum((~F.col("is_new")).cast("bigint")).cast("bigint").alias("n_base"),
        F.sum(F.col("is_new").cast("bigint")).cast("bigint").alias("n_new"),
    )
    spine = spark.range(IVF_NLIST).select(F.col("id").cast("int").alias("cell_id"))
    total = assigned.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        spine.join(per_cell, "cell_id", "left")
        .select(
            "cell_id",
            F.coalesce("n_base", F.lit(0)).cast("bigint").alias("n_base"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn("n_full", (F.col("n_base") + F.col("n_new")).cast("bigint"))
        .crossJoin(F.broadcast(total))
        .select(
            "cell_id",
            "n_base",
            "n_new",
            "n_full",
            (F.col("n_full") * F.lit(IVF_NLIST) > 2 * F.col("n_total")).alias(
                "needs_split"
            ),
        )
    )


def _index_drift_oracle() -> str:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    cents = similarity.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", nlist=IVF_NLIST, seed=IVF_SEED
    )
    rows = []
    for j, c in enumerate(cents.tolist()):
        rows.append(f"SELECT {j} AS cell_id, {_duck_doubles(c)} AS c")
    cents_sql = "\n  UNION ALL ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cents AS (
  {cents_sql}
), assigned AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, 65),
                                     i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))
               ASC, c.cell_id ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
), per_cell AS (
  SELECT cell_id,
         CAST(sum(CASE WHEN vec_id % {DRIFT_NEW_MOD} != 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN vec_id % {DRIFT_NEW_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM assigned GROUP BY 1
), total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM assigned),
spine AS (SELECT CAST(unnest(range(0, {IVF_NLIST})) AS INTEGER) AS cell_id)
SELECT s.cell_id,
       CAST(coalesce(p.n_base, 0) AS BIGINT) AS n_base,
       CAST(coalesce(p.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(p.n_base, 0) + coalesce(p.n_new, 0) AS BIGINT) AS n_full,
       (coalesce(p.n_base, 0) + coalesce(p.n_new, 0)) * {IVF_NLIST}
         > 2 * n_total AS needs_split
FROM spine s LEFT JOIN per_cell p ON s.cell_id = p.cell_id
CROSS JOIN total
"""


NEYMAN_BUDGET = 10_000  #: total docs the downstream sampler may keep


def tp_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: Neyman (variance-optimal) sampling allocation across sources —
    given a sampling budget of {NEYMAN_BUDGET} docs, each source gets
    budget ∝ N_g·σ_g (its size × its doc-length standard deviation):
    the stratified-sampling rule that minimizes estimator variance, and
    in a data pipeline the principled answer to "how many docs do I keep
    from each crawl source for the audit sample?" — high-variance
    sources need proportionally more coverage than uniform sampling
    gives them.

    Determinism: per-source moments are exact BIGINT sums of n_chars
    and n_chars²; σ_g = √((n·SS − S²)/n²) is per-row float math from
    exact ints; the DENOMINATOR Σ N_g·σ_g folds the ~30 source weights
    sequentially in source order (F.aggregate over a sorted array — the
    kcenter/inertia bit-exact-fold technique), never a parallel double
    sum.

    Scale: one groupBy(source) over the scan; the fold runs over the
    source-count-sized aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    # Moments in decimal(38,0), not BIGINT: at 100 TB a source's summed
    # n_chars passes ~3e9 and s*s would silently wrap int64 under
    # ansi=false (ADVICE r6). decimal(19,0)*decimal(19,0) -> decimal(38,0)
    # stays exact to 1e38; the oracle mirrors with HUGEINT (int128).
    nc = F.col("n_chars").cast("decimal(19,0)")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(nc).cast("decimal(38,0)").alias("s"),
        F.sum(nc * nc).cast("decimal(38,0)").alias("ss"),
    )
    n = F.col("n_docs").cast("double")
    var_pop = (
        F.col("n_docs").cast("decimal(19,0)") * F.col("ss")
        - F.col("s") * F.col("s")
    ).cast("double") / (n * n)
    weighted = per_src.select(
        "source",
        "n_docs",
        F.sqrt(var_pop).alias("sigma"),
    ).withColumn("weight", n * F.col("sigma"))
    denom = weighted.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "weight"))),
            F.lit(0.0),
            lambda acc, x: acc + x["weight"],
        ).alias("denom")
    )
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "sigma",
            (F.col("weight") / F.col("denom")).alias("share"),
            (
                F.col("weight") / F.col("denom") * F.lit(float(NEYMAN_BUDGET))
            ).alias("alloc_docs"),
        )
    )


TP_NEYMAN_ORACLE = f"""
WITH per_src AS (
  -- HUGEINT (int128) moments: exact where BIGINT would wrap at scale,
  -- mirroring the Spark side's decimal(38,0)
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
              AS HUGEINT) AS ss
  FROM documents GROUP BY 1
), weighted AS (
  SELECT source, n_docs,
         sqrt(CAST(n_docs * ss - s * s AS DOUBLE)
              / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) AS sigma,
         CAST(n_docs AS DOUBLE)
           * sqrt(CAST(n_docs * ss - s * s AS DOUBLE)
                  / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))
           AS weight
  FROM per_src
), denom AS (
  SELECT list_sum(list(weight ORDER BY source)) AS denom FROM weighted
)
SELECT source, n_docs, sigma,
       weight / denom AS share,
       weight / denom * {float(NEYMAN_BUDGET)!r} AS alloc_docs
FROM weighted CROSS JOIN denom
"""


def _kmeans_inertia_oracle() -> str:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    cents = similarity.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", nlist=IVF_NLIST, seed=IVF_SEED
    )
    rows = []
    for j, c in enumerate(cents.tolist()):
        rows.append(f"SELECT {j} AS cell_id, {_duck_doubles(c)} AS c")
    cents_sql = "\n  UNION ALL ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cents AS (
  {cents_sql}
), assigned AS (
  SELECT vec_id, cell_id, d FROM (
    SELECT e.vec_id, c.cell_id,
           list_sum(list_transform(range(1, 65),
                                   i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))
             AS d,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_sum(list_transform(range(1, 65),
                                     i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))
               ASC, c.cell_id ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
)
SELECT CAST(cell_id AS INTEGER) AS cell_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       list_sum(list(d ORDER BY vec_id)) AS inertia
FROM assigned GROUP BY cell_id
"""


def j16_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: point-in-time (feature-store) join — attach to every event
    the SCD2 dimension version that was EFFECTIVE at the event's own
    timestamp: the lookup that keeps training data leak-free (a feature
    computed tomorrow must not describe yesterday's example). The dim is
    the user's SCD2 state history (operators/scd.py over the event_type
    changelog); the lookup composes the as-of join operator (greatest
    effective_from ≤ ts) and certifies containment against
    effective_to.

    Scale: the as-of join is the union-window single-shuffle design
    (operators/joins.py:136) keyed by user — no range explosion."""
    from us_dot_flights_lakehouse_spark.operators.joins import asof_join
    from us_dot_flights_lakehouse_spark.operators.scd import scd2_from_changelog

    events = read_table(spark, sf_dir, "events")
    dim = scd2_from_changelog(
        events, ["user_id"], "event_type", "ts", "event_id"
    ).select("user_id", "state", "effective_from", "effective_to", "version")
    facts = events.select("event_id", "user_id", "ts")
    joined = asof_join(
        facts,
        dim,
        keys=["user_id"],
        left_ts="ts",
        right_ts="effective_from",
        right_cols=["state", "version", "effective_to"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "state",
        F.col("version").cast("int").alias("version"),
        (
            F.col("effective_to").isNull() | (F.col("ts") < F.col("effective_to"))
        ).alias("within_version"),
    )


J16_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type AS state, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
), changes AS (
  -- null-safe change detection mirroring scd2_from_changelog (ADVICE r5)
  SELECT user_id, state, ts, event_id FROM ordered
  WHERE prev_ts IS NULL OR state IS DISTINCT FROM prev_state
), hist AS (
  SELECT user_id, state,
         ts AS effective_from,
         lead(ts) OVER w AS effective_to,
         row_number() OVER w AS version
  FROM changes
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pit AS (
  SELECT e.event_id, e.user_id, e.ts, h.state, h.version, h.effective_to,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY h.effective_from DESC, h.version DESC)
           AS rn
  FROM events e JOIN hist h
    ON e.user_id = h.user_id AND h.effective_from <= e.ts
)
SELECT event_id, user_id, ts, state, CAST(version AS INTEGER) AS version,
       (effective_to IS NULL OR ts < effective_to) AS within_version
FROM pit WHERE rn = 1
"""


SFT_BUDGET_CHARS = 4096


def tp_sft_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: SFT chat-template assembly — pair documents within each
    source (doc_id-ranked, i with i+1, the deterministic stand-in for
    prompt/response pairs) and render the chat template
    '<|user|>…<|assistant|>…<|end|>' with a context-budget flag: the
    formatting step every supervised-fine-tune data build runs before
    tokenization. The md5 over the rendered string makes the oracle
    sensitive to every byte of template assembly.

    Scale: one source-key window for the pairing; rendering is
    scan-local string concat."""
    docs = read_corpus(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    paired = docs.select(
        "source",
        F.col("doc_id").alias("prompt_id"),
        F.col("text").alias("prompt"),
        F.lead("doc_id").over(w).alias("response_id"),
        F.lead("text").over(w).alias("response"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("response_id").isNotNull() & (F.col("rn") % 2 == 1))
    formatted = F.concat(
        F.lit("<|user|>\n"),
        F.col("prompt"),
        F.lit("\n<|assistant|>\n"),
        F.col("response"),
        F.lit("<|end|>"),
    )
    return paired.select(
        "source",
        "prompt_id",
        "response_id",
        F.length(formatted).cast("bigint").alias("n_chars"),
        (F.length(formatted) <= SFT_BUDGET_CHARS).alias("fits_budget"),
        F.md5(formatted).alias("formatted_md5"),
    )


TP_SFT_ORACLE = f"""
WITH paired AS (
  SELECT source, doc_id AS prompt_id, text AS prompt,
         lead(doc_id) OVER w AS response_id,
         lead(text) OVER w AS response,
         row_number() OVER w AS rn
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY doc_id)
), f AS (
  SELECT source, prompt_id, response_id,
         '<|user|>' || chr(10) || prompt || chr(10) || '<|assistant|>'
           || chr(10) || response || '<|end|>' AS formatted
  FROM paired WHERE response_id IS NOT NULL AND rn % 2 = 1
)
SELECT source, prompt_id, response_id,
       CAST(length(formatted) AS BIGINT) AS n_chars,
       length(formatted) <= {SFT_BUDGET_CHARS} AS fits_budget,
       md5(formatted) AS formatted_md5
FROM f
"""


VAD_BODY1 = 64
VAD_BODY2 = 32


def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: voice-activity segmentation — synthesize a WAV whose PCM has
    TWO nonzero bursts separated by doc-dependent silence runs, decode
    it (llm/multimodal.py::decode_audio) and emit one row per detected
    voiced segment with its offsets and energy: the VAD step that turns
    raw audio into training utterances (mm_silence_trim's big sibling —
    trim handles one burst; this finds them all). The oracle states
    every segment's offsets and energy in closed form.

    Scale: per-row Arrow kernels, zero shuffle; output fan-out is
    segments-per-file."""
    import numpy as np

    docs = read_corpus(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                body1 = (d + np.arange(VAD_BODY1) * 37) % 251 + 1
                body2 = (d * 3 + np.arange(VAD_BODY2) * 11) % 199 + 1
                samples = np.concatenate(
                    [
                        np.zeros(d % 16),
                        body1,
                        np.zeros(d % 8 + 4),
                        body2,
                        np.zeros(d % 12),
                    ]
                ).astype(np.int16)
                payloads.append(wav_encode(samples, 8000))
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def segments(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["samples"]):
                if buf is None:
                    rows.append((int(i), None, None, None, None))
                    continue
                v = np.frombuffer(buf, "<i2").astype(np.int64)
                nz = np.flatnonzero(v)
                if len(nz) == 0:
                    continue
                splits = np.split(nz, np.where(np.diff(nz) > 1)[0] + 1)
                for si, run in enumerate(splits):
                    s, e = int(run[0]), int(run[-1]) + 1
                    rows.append((int(i), si, s, e, int(v[s:e].sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "segment", "seg_start", "seg_end", "energy"],
            )

    return decoded.mapInPandas(
        segments,
        schema=(
            "doc_id long, segment int, seg_start int, seg_end int, "
            "energy bigint"
        ),
    )


MM_VAD_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         doc_id % 16 AS a,
         doc_id % 8 + 4 AS b
  FROM documents
)
SELECT doc_id, CAST(0 AS INTEGER) AS segment,
       CAST(a AS INTEGER) AS seg_start,
       CAST(a + {VAD_BODY1} AS INTEGER) AS seg_end,
       CAST(list_sum(list_transform(range(0, {VAD_BODY1}),
              k -> (doc_id + k * 37) % 251 + 1)) AS BIGINT) AS energy
FROM base
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER),
       CAST(a + {VAD_BODY1} + b AS INTEGER),
       CAST(a + {VAD_BODY1} + b + {VAD_BODY2} AS INTEGER),
       CAST(list_sum(list_transform(range(0, {VAD_BODY2}),
              k -> (doc_id * 3 + k * 11) % 199 + 1)) AS BIGINT)
FROM base
"""


KCENTER_K = 8


def _kcenter_select(path: str, k: int):
    """Greedy k-center selection replicated with SEQUENTIAL IEEE double
    arithmetic (python loops — the same op order as the Spark fold and
    the oracle's list_sum), reading the parquet directly. Returns
    [(round, vec_id, min_dist_at_selection)]: seed = min vec_id, then
    argmax of min-squared-distance-to-selected, ties to the smaller id."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id"
    ).fetchall()
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    seed = min(vecs)
    selected = [(0, seed, 0.0)]
    # min squared distance to the selected set, maintained sequentially
    mind = {}
    for r in range(1, k):
        last = vecs[selected[-1][1]]
        for i, v in vecs.items():
            d = 0.0
            for x, y in zip(v, last):
                d += (x - y) * (x - y)
            if i not in mind or d < mind[i]:
                mind[i] = d
        best_i, best_d = None, -1.0
        for i in sorted(vecs):
            if i in {s[1] for s in selected}:
                continue
            if mind[i] > best_d:
                best_i, best_d = i, mind[i]
        selected.append((r, best_i, best_d))
        # distances to the new center fold into mind at the START of the
        # next iteration (via `last`)
    return selected, vecs


def sim_kcenter_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: k-center greedy diversity sampling — pick {KCENTER_K} maximally
    spread vectors (farthest-point traversal: seed = min id, then
    repeatedly the vector farthest from the selected set): the coreset /
    diversity-aware data-selection step that picks representative
    examples instead of redundant ones. Each round is ONE distributed
    argmax (distance expressions over literal already-selected centers,
    TakeOrdered(1)) — the k-means-style bounded-driver iteration; all
    distance math is sequential folds, so the oracle (which re-derives
    every round's argmax over the full corpus from the same literal
    centers) is bit-exact.

    Scale: k scans with expression-only distance math; driver holds k
    ids. For huge k switch to the parallel-oversampling path
    (``llm/similarity.py::kcenter_oversample``: k-means||-style — a few
    farthest-batch passes grow an O(k·log) candidate pool, driver-local
    Gonzalez refine; unit-verified against this greedy on planted
    clusters)."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    # the k rounds each rescan the corpus — cache it for the duration of
    # the selection (k reads of one materialization), release after
    corpus = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).cache()
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    def sqdist_to(center):
        return F.aggregate(
            F.zip_with(F.col("v"), lit_doubles(center), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )

    seed_row = corpus.orderBy("vec_id").limit(1).collect()[0]
    selected = [(0, int(seed_row["vec_id"]), 0.0)]
    centers = [list(seed_row["v"])]
    mind = F.lit(float("inf"))
    for r in range(1, KCENTER_K):
        mind = F.least(mind, sqdist_to(centers[-1]))
        cand = corpus.filter(
            ~F.col("vec_id").isin([s[1] for s in selected])
        ).select("vec_id", "v", mind.alias("d"))
        top = cand.orderBy(F.desc("d"), F.asc("vec_id")).limit(1).collect()[0]
        selected.append((r, int(top["vec_id"]), float(top["d"])))
        centers.append(list(top["v"]))
    corpus.unpersist()
    return spark.createDataFrame(
        selected, "round int, vec_id long, min_dist double"
    )


def _kcenter_oracle() -> str:
    """Verifies every greedy round: given the literal centers selected in
    rounds 0..r−1 (re-derived at oracle-build time with sequential
    python arithmetic — the identical op order), round r's pick must be
    the argmax of min-distance over the FULL corpus, recomputed by the
    oracle's own folds."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    selected, vecs = _kcenter_select(
        f"{sf_dir}/embeddings.parquet", KCENTER_K
    )
    parts = [
        f"SELECT 0 AS round, CAST({selected[0][1]} AS BIGINT) AS vec_id,"
        " CAST(0.0 AS DOUBLE) AS min_dist"
    ]
    for r in range(1, KCENTER_K):
        prior = [s[1] for s in selected[:r]]
        dists = []
        for pid in prior:
            c = _duck_doubles(vecs[pid])
            dists.append(
                "list_sum(list_transform(range(1, 65),"
                f" i -> (v[i] - c{pid}_[i]) * (v[i] - c{pid}_[i])))"
            )
        center_cols = ", ".join(
            f"{_duck_doubles(vecs[pid])} AS c{pid}_" for pid in prior
        )
        excl = ", ".join(str(p) for p in prior)
        mind = "least(" + ", ".join(dists) + ")" if len(dists) > 1 else dists[0]
        parts.append(f"""
SELECT {r} AS round, vec_id, min_dist FROM (
  SELECT e.vec_id, {mind} AS min_dist,
         ROW_NUMBER() OVER (ORDER BY {mind} DESC, e.vec_id ASC) AS rn
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               {center_cols}
        FROM embeddings WHERE vec_id NOT IN ({excl})) e
) WHERE rn = 1""")
    return "\nUNION ALL\n".join(parts)


def sim_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: PQ recall@k audit — per query, how many exact brute-force
    top-{TOPK_K} cosine neighbors survive the product-quantization ADC
    ranking: the compression-loss measurement that decides a PQ
    deployment's code budget (IVF gets the same audit in
    sim_ivf_recall_audit; together they close the ANN-quality
    measurement family).

    Scale: both retrievals are broadcast-probes × one scan."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = similarity.cosine_topk(emb, qs, k=TOPK_K).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.pq_cosine_topk(
        emb, qs, k=TOPK_K, dim=PQ_DIM, seed=PQ_SEED
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint"))
        .cast("bigint")
        .alias("n_recovered"),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0)).cast("bigint")).cast("double")
            / F.count("*").cast("double")
        ).alias("recall_at_k"),
    )


def _pq_recall_oracle() -> str:
    return f"""
WITH exact_k AS ({SIM_TOPK_ORACLE}),
pq_k AS ({_pq_oracle()}),
joined AS (
  SELECT e.query_id, e.neighbor_id,
         CASE WHEN i.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
  FROM exact_k e
  LEFT JOIN pq_k i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(hit) AS BIGINT) AS n_recovered,
       CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_k
FROM joined GROUP BY query_id
"""


RESERVOIR_K = 20
RESERVOIR_SALT = "r6res"


def o8_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: deterministic fixed-size uniform sample per stratum — the
    distributed equivalent of reservoir sampling: priority = md5 of the
    salted id (a uniform hash draw), keep the k smallest priorities per
    source. Unlike Spark's ``sample()`` (Bernoulli, approximate size,
    seed-and-partitioning dependent) this yields EXACTLY min(k, n) rows
    per stratum and the same rows on any cluster layout or retry —
    reproducibility a training-data audit needs. Changing the salt
    redraws the sample.

    Scale: one shuffle (per-source top-k — Spark turns the
    rank-filter into partial top-k per partition); no global sort."""
    docs = read_corpus(spark, sf_dir, "documents")
    pri = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":" + RESERVOIR_SALT)))
    w = Window.partitionBy("source").orderBy("priority")
    return (
        docs.select("source", "doc_id", pri.alias("priority"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "doc_id", "priority", F.col("sample_rank").cast("long").alias("sample_rank"))
    )


O8_RESERVOIR_ORACLE = f"""
WITH pri AS (
  SELECT source, doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':{RESERVOIR_SALT}') AS priority
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY priority)
            AS sample_rank
  FROM pri
)
SELECT source, doc_id, priority, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= {RESERVOIR_K}
"""


def ts_source_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: source-pair vocabulary containment matrix — for every pair of
    sources, the distinct-token overlap, Jaccard, and containment
    (common/min): the corpus-mixing diagnostic that says which sources
    are near-subsets of others (containment ≈ 1 with low Jaccard =
    one source is swallowed by another — drop or down-weight it).
    Complements the per-document dedup family with a source-level view.

    Scale: inverted token→source index (distinct per source), self-join
    on token — each token contributes ≤ C(n_sources, 2) pairs, so the
    join is corpus-linear with a tiny constant; the pair aggregate is
    n_sources²-sized."""
    docs = read_corpus(spark, sf_dir, "documents")
    idx = docs.select(
        "source", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
    ).distinct()
    sizes = idx.groupBy("source").agg(F.count("*").alias("n_tok"))
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        common.join(F.broadcast(sa), F.col("source_a") == F.col("sa.source"))
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.source"))
        .select(
            "source_a",
            "source_b",
            F.col("common").cast("long").alias("common_tokens"),
            F.col("sa.n_tok").cast("long").alias("n_tok_a"),
            F.col("sb.n_tok").cast("long").alias("n_tok_b"),
            (
                F.col("common").cast("double")
                / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("common")).cast(
                    "double"
                )
            ).alias("jaccard"),
            (
                F.col("common").cast("double")
                / F.least("sa.n_tok", "sb.n_tok").cast("double")
            ).alias("containment"),
        )
    )


TS_SRC_CONTAIN_ORACLE = """
WITH idx AS (
  SELECT DISTINCT source, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tok FROM idx GROUP BY 1
), common AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS common_tokens
  FROM idx a JOIN idx b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, common_tokens,
       sa.n_tok AS n_tok_a, sb.n_tok AS n_tok_b,
       CAST(common_tokens AS DOUBLE)
         / CAST(sa.n_tok + sb.n_tok - common_tokens AS DOUBLE) AS jaccard,
       CAST(common_tokens AS DOUBLE)
         / CAST(least(sa.n_tok, sb.n_tok) AS DOUBLE) AS containment
FROM common
JOIN sizes sa ON source_a = sa.source
JOIN sizes sb ON source_b = sb.source
"""


SCHEMA_DRIFT_TOL = 0.2


def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q: cross-partition profile-drift audit — treat each ingest source
    as a partition and compare its observed column profile against the
    corpus baseline: row count share, empty/degenerate text rate,
    language-domain coverage (langs present here vs corpus-wide), and
    mean-length drift ratio. The "schema didn't change but the DATA
    did" detector every multi-source ingest runs before a refresh is
    published; a drifting partition gets quarantined upstream of
    training. All counts exact; ratios pointwise doubles.

    Scale: two source-cardinality aggregates plus one broadcast of the
    1-row corpus baseline — the scan dominates."""
    docs = read_corpus(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.length(F.trim("text")) == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("empty_text"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    corpus = docs.agg(
        F.count("*").cast("bigint").alias("c_docs"),
        F.countDistinct("lang").cast("bigint").alias("c_langs"),
        F.sum("n_chars").cast("bigint").alias("c_chars"),
    )
    avg_chars = F.col("sum_chars").cast("double") / F.col("n_docs").cast("double")
    corpus_avg = F.col("c_chars").cast("double") / F.col("c_docs").cast("double")
    drift = avg_chars / corpus_avg
    return per_src.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        "empty_text",
        "n_langs",
        F.col("c_langs").alias("corpus_langs"),
        avg_chars.alias("avg_chars"),
        drift.alias("len_drift_ratio"),
        (
            (F.col("n_langs") < F.col("c_langs"))
            | (F.abs(drift - 1.0) > SCHEMA_DRIFT_TOL)
        ).alias("drifted"),
    )


Q_SCHEMA_DRIFT_ORACLE = f"""
WITH per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS empty_text,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
), corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS c_docs,
         CAST(count(DISTINCT lang) AS BIGINT) AS c_langs,
         CAST(sum(n_chars) AS BIGINT) AS c_chars
  FROM documents
)
SELECT source, n_docs, empty_text, n_langs, c_langs AS corpus_langs,
       CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_chars,
       (CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE))
         / (CAST(c_chars AS DOUBLE) / CAST(c_docs AS DOUBLE))
         AS len_drift_ratio,
       (n_langs < c_langs
        OR abs((CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE))
               / (CAST(c_chars AS DOUBLE) / CAST(c_docs AS DOUBLE)) - 1.0)
           > {SCHEMA_DRIFT_TOL}) AS drifted
FROM per_src, corpus
"""


CHAT_TURNS = 4
CHAT_BUDGET_CHARS = 2048
#: lint rule bits (LSB first): empty turn, adjacent duplicate turns,
#: over budget, incomplete conversation, template-tag leakage
CHAT_LINT_BITS = 5


def tp_chat_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: SFT conversation lint — assemble {CHAT_TURNS}-turn
    conversations (doc_id-ranked within source, the multi-turn extension
    of tp_sft_format's pairing) and run the lint rules every SFT data
    build applies before training: empty turns, adjacent duplicate
    turns (copy-paste echo), context-budget overflow, incomplete
    conversations at the tail, and template-tag leakage ('<|' inside a
    turn would break the chat template). Emits one row per conversation
    with the violation bitmask — the triage table for fix-vs-drop.

    Scale: one source-keyed window for turn ranking, one
    conversation-keyed aggregate; rules are array folds over
    conversation-sized lists."""
    docs = read_corpus(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    turns = docs.select(
        "source",
        "doc_id",
        "text",
        # floor-div explicitly: Spark's long cast TRUNCATES a double while
        # DuckDB's CAST rounds — floor() agrees on both engines
        F.floor((F.row_number().over(w) - 1) / CHAT_TURNS)
        .cast("long")
        .alias("conv_id"),
    )
    conv = turns.groupBy("source", "conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id").alias("k"), F.col("text").alias("t")))
        ).alias("ts"),
    )
    texts = F.transform("ts", lambda x: x["t"])
    total_chars = F.aggregate(
        texts, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    has_empty = F.exists(texts, lambda t: F.length(F.trim(t)) == 0)
    # zip_with pads the shorter (shifted) side with NULL — eqNullSafe +
    # isNotNull keeps the pair-equality list boolean-typed and null-free
    # so exists() can't go three-valued on the tail pair
    adj_dup = F.exists(
        F.zip_with(
            texts,
            F.slice(texts, 2, CHAT_TURNS),
            lambda x, y: x.eqNullSafe(y) & y.isNotNull(),
        ),
        lambda e: e,
    )
    over = total_chars > CHAT_BUDGET_CHARS
    incomplete = F.col("n_turns") < CHAT_TURNS
    leak = F.exists(texts, lambda t: t.contains("<|"))
    mask = (
        has_empty.cast("int")
        + adj_dup.cast("int") * 2
        + over.cast("int") * 4
        + incomplete.cast("int") * 8
        + leak.cast("int") * 16
    )
    return conv.select(
        "source",
        "conv_id",
        "n_turns",
        total_chars.alias("total_chars"),
        mask.cast("long").alias("lint_mask"),
        (mask == 0).alias("clean"),
    )


TP_CHAT_LINT_ORACLE = f"""
WITH turns AS (
  SELECT source, doc_id, text,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
              // {CHAT_TURNS} AS conv_id
  FROM documents
), conv AS (
  SELECT source, conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         list(text ORDER BY doc_id) AS texts,
         CAST(sum(length(text)) AS BIGINT) AS total_chars,
         bool_or(length(trim(text)) = 0) AS has_empty,
         bool_or(contains(text, '<|')) AS leak
  FROM turns GROUP BY 1, 2
), scored AS (
  SELECT source, conv_id, n_turns, total_chars,
         CAST(has_empty AS INT)
         + CAST(len(list_filter(range(1, len(texts)),
                                i -> texts[i] = texts[i+1])) > 0 AS INT) * 2
         + CAST(total_chars > {CHAT_BUDGET_CHARS} AS INT) * 4
         + CAST(n_turns < {CHAT_TURNS} AS INT) * 8
         + CAST(leak AS INT) * 16 AS lint_mask
  FROM conv
)
SELECT source, conv_id, n_turns, total_chars,
       CAST(lint_mask AS BIGINT) AS lint_mask, lint_mask = 0 AS clean
FROM scored
"""


def mm_exif_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: metadata-chunk scrub end-to-end — synthesizes per document a
    real PNG carrying two ancillary metadata chunks (a tEXt comment
    'doc:<id>' and a fake eXIf blob of doc-dependent length), strips
    them with ``multimodal.strip_ancillary_chunks``, and certifies:
    the dropped-type inventory, the exact byte savings (closed-form:
    12-byte chunk overhead + body lengths), and — the strong contract —
    that the stripped bytes are BYTE-IDENTICAL to the canonical
    metadata-free encoding of the same pixels (verified in-kernel by
    md5 equality, stated as a constant by the oracle). A strip that
    corrupts any critical chunk or misclassifies one fails the oracle.

    Scale: two chained Arrow kernels, zero shuffle."""
    import numpy as np

    from us_dot_flights_lakehouse_spark.llm import multimodal

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import struct
        import zlib

        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        def chunk(typ: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + typ
                + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
            )

        for pdf in batches:
            payloads, canon_md5 = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                base = png_encode(
                    ((7 * d + np.arange(64)) % 256).astype(np.uint8).reshape(8, 8),
                    "L",
                )
                # insert metadata after IHDR (sig 8 + IHDR chunk 25 bytes)
                text = chunk(b"tEXt", b"Comment\x00" + f"doc:{d}".encode())
                exif = chunk(b"eXIf", bytes((d + j) % 256 for j in range(d % 16 + 8)))
                cut = 8 + 25
                payloads.append(base[:cut] + text + exif + base[cut:])
                import hashlib

                canon_md5.append(hashlib.md5(base).hexdigest())
            yield pd.DataFrame(
                {"id": pdf["doc_id"], "payload": payloads, "canon_md5": canon_md5}
            )

    imgs = docs.mapInPandas(
        synth, schema="id long, payload binary, canon_md5 string"
    )
    stripped = multimodal.strip_ancillary_chunks(imgs)
    return stripped.select(
        F.col("id").alias("doc_id"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        "dropped_csv",
        "bytes_saved",
        (F.md5("clean") == F.col("canon_md5")).alias("roundtrip_ok"),
    )


MM_EXIF_ORACLE = """
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_dropped,
       'eXIf,tEXt' AS dropped_csv,
       -- tEXt: 12 + len('Comment')+1 + len('doc:'||id); eXIf: 12 + (id%16 + 8)
       CAST(12 + 8 + 4 + length(CAST(doc_id AS VARCHAR))
            + 12 + (doc_id % 16 + 8) AS BIGINT) AS bytes_saved,
       true AS roundtrip_ok
FROM documents
"""


def dd_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: MinHash estimator-quality audit (llm/dedup.minhash_calibration)
    — per LSH candidate pair, the K=16 signature-agreement Jaccard
    estimate vs the exact shingle-set Jaccard and |error|: is the sketch
    calibrated at this corpus's duplicate profile? Completes the audit
    family — the ANN recall audits check the index, this checks the
    dedup sketch.

    Scale: bucket-bounded candidates; exact verification touches
    candidates only."""
    docs = read_corpus(spark, sf_dir, "documents")
    return dedup.minhash_calibration(docs)


DD_MINHASH_CAL_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {{shingles}} AS shs
  FROM (SELECT doc_id, {{tokens}} AS t FROM documents)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hashed AS (SELECT doc_id, {{hash28}} AS h FROM s),
sig AS (
  SELECT doc_id,
    {{sig_mins}}
  FROM hashed GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.band_id, b.band_key
  FROM sig, (VALUES {{band_keys}}) AS b(band_id, band_key)
), cand AS (
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
), est AS (
  SELECT ia, ib,
         CAST({{agree}} AS DOUBLE) / {MINHASH_K} AS est_jaccard
  FROM cand JOIN sig ga ON ia = ga.doc_id JOIN sig gb ON ib = gb.doc_id
)
SELECT ia AS doc_id_a, ib AS doc_id_b, est_jaccard,
       CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
         / CAST(len(da.shs) + len(db.shs)
                - len(list_intersect(da.shs, db.shs)) AS DOUBLE) AS true_jaccard,
       abs(est_jaccard
           - CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
             / CAST(len(da.shs) + len(db.shs)
                    - len(list_intersect(da.shs, db.shs)) AS DOUBLE)) AS abs_err
FROM est JOIN d da ON ia = da.doc_id JOIN d db ON ib = db.doc_id
"""


def _minhash_cal_oracle() -> str:
    agree = " + ".join(
        f"(CASE WHEN ga.mh{i} = gb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_K)
    )
    return DD_MINHASH_CAL_ORACLE.format(
        shingles=_SHINGLES,
        tokens=_TOKENS,
        hash28=_HASH28.format(x="sh"),
        sig_mins=_sig_mins_sql(),
        band_keys=_band_keys_sql(),
        agree=agree,
    )


ZIPF_TOP = 50


def ts_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: Zipf-law vocabulary audit — the top {ZIPF_TOP} corpus tokens
    with their frequency and the Zipf deviation ratio freq·rank / freq₁
    (≈1.0 under ideal Zipf): natural corpora track Zipf closely, so a
    flat curve flags synthetic/templated text and a cliff flags
    boilerplate flooding — a cheap corpus-health fingerprint quality
    reports quote. Log-free by construction (ratios, not log-log
    slopes), so every value is a pointwise double over exact counts.

    Scale: one token-count shuffle (map-side combined), then a
    {ZIPF_TOP}-row top-k merge; the 1-row top-frequency broadcast rides
    the plan."""
    docs = read_corpus(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    wr = Window.orderBy(F.col("freq").desc(), F.col("tok"))
    top = counts.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= ZIPF_TOP
    )
    f1 = top.agg(F.max("freq").alias("f1"))
    return top.crossJoin(F.broadcast(f1)).select(
        F.col("rank").cast("long").alias("rank"),
        "tok",
        F.col("freq").cast("long").alias("freq"),
        (
            F.col("freq").cast("double")
            * F.col("rank").cast("double")
            / F.col("f1").cast("double")
        ).alias("zipf_ratio"),
    )


TS_ZIPF_ORACLE = f"""
WITH counts AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents)
  GROUP BY tok
), top AS (
  SELECT tok, freq,
         row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM counts QUALIFY rank <= {ZIPF_TOP}
), f1 AS (SELECT max(freq) AS f1 FROM top)
SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(freq AS BIGINT) AS freq,
       CAST(freq AS DOUBLE) * CAST(rank AS DOUBLE) / CAST(f1 AS DOUBLE)
         AS zipf_ratio
FROM top, f1
"""


def tp_loss_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: SFT loss-mask offsets — for each assembled chat example
    (tp_sft_format's pairing and template), the exact character span
    where training loss applies (the assistant turn only; prompt and
    template tokens are masked out): the offset bookkeeping every SFT
    tokenizer pass must get byte-exact, emitted as closed-form
    arithmetic over the component lengths so the oracle certifies every
    boundary.

    Scale: one source-key window for the pairing; everything else is
    scan-local length arithmetic."""
    docs = read_corpus(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    paired = docs.select(
        "source",
        F.col("doc_id").alias("prompt_id"),
        F.col("text").alias("prompt"),
        F.lead("doc_id").over(w).alias("response_id"),
        F.lead("text").over(w).alias("response"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("response_id").isNotNull() & (F.col("rn") % 2 == 1))
    pre = F.lit(9) + F.length("prompt") + F.lit(15)  # '<|user|>\n' + p + '\n<|assistant|>\n'
    total = pre + F.length("response") + F.lit(7)  # + r + '<|end|>'
    mask_start = pre + 1
    mask_end = pre + F.length("response")
    return paired.select(
        "source",
        "prompt_id",
        "response_id",
        total.cast("long").alias("total_chars"),
        mask_start.cast("long").alias("mask_start"),
        mask_end.cast("long").alias("mask_end"),
        F.length("response").cast("long").alias("mask_chars"),
        (F.length("response").cast("double") / total.cast("double")).alias(
            "loss_frac"
        ),
    )


TP_LOSS_MASK_ORACLE = """
WITH paired AS (
  SELECT source, doc_id AS prompt_id, text AS prompt,
         lead(doc_id) OVER w AS response_id,
         lead(text) OVER w AS response,
         row_number() OVER w AS rn
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY doc_id)
)
SELECT source, prompt_id, response_id,
       CAST(9 + length(prompt) + 15 + length(response) + 7 AS BIGINT)
         AS total_chars,
       CAST(9 + length(prompt) + 15 + 1 AS BIGINT) AS mask_start,
       CAST(9 + length(prompt) + 15 + length(response) AS BIGINT) AS mask_end,
       CAST(length(response) AS BIGINT) AS mask_chars,
       CAST(length(response) AS DOUBLE)
         / CAST(9 + length(prompt) + 15 + length(response) + 7 AS DOUBLE)
         AS loss_frac
FROM paired WHERE response_id IS NOT NULL AND rn % 2 = 1
"""


NDCG_K = 10


def _ndcg_discounts() -> list[float]:
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]


def sim_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: NDCG@{NDCG_K} retrieval-quality evaluation — for each probe
    query, exact cosine top-k, graded by label agreement (rel∈{{0,1}}),
    discounted by the shared literal 1/log2(rank+1) table (no engine
    logarithms) and normalized by the ideal ordering: the ranking metric
    retrieval evals report, computed bit-stably (DCG folds terms in rank
    order; IDCG folds the discount-table prefix of the relevant count).
    Completes the eval family: recall audits (set overlap), kNN accuracy
    (classification), NDCG (ranking).

    Scale: broadcast queries × one corpus scan; per-query folds are
    k-sized."""
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    emb = read_corpus(spark, sf_dir, "embeddings")
    disc = lit_doubles(_ndcg_discounts())
    qs = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    topk = similarity.cosine_topk(emb, qs, k=NDCG_K)
    labels = emb.select("vec_id", "label")
    graded = (
        topk.join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(
            labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                "label", "qlabel"
            ),
            "query_id",
        )
        .select(
            "query_id",
            "qlabel",
            "rank",
            (F.col("label") == F.col("qlabel")).alias("rel"),
        )
    )
    per_q = graded.groupBy("query_id", "qlabel").agg(
        F.sum(F.col("rel").cast("long")).alias("n_relevant"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "rank",
                        F.when(F.col("rel"), F.element_at(disc, F.col("rank")))
                        .otherwise(0.0)
                        .alias("term"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["term"],
        ).alias("dcg"),
    )
    idcg = F.when(
        F.col("n_relevant") > 0,
        F.aggregate(
            F.slice(disc, 1, F.col("n_relevant").cast("int")),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )
    return per_q.select(
        "query_id",
        F.col("qlabel").alias("true_label"),
        F.col("n_relevant").cast("long").alias("n_relevant"),
        "dcg",
        idcg.alias("idcg"),
        (F.col("dcg") / idcg).alias("ndcg"),
    )


def _ndcg_oracle() -> str:
    disc = _duck_doubles(_ndcg_discounts())
    return f"""
WITH disc AS (SELECT {disc} AS d),
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT vec_id, label, v, {_VEC_NORM} AS nrm FROM e),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS qlabel, c.vec_id AS neighbor_id,
         c.label AS nl,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
           / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERY_VECS}
), topk AS (
  SELECT query_id, qlabel, nl,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored QUALIFY rank <= {NDCG_K}
), per_q AS (
  SELECT query_id, qlabel,
         CAST(sum(CASE WHEN nl = qlabel THEN 1 ELSE 0 END) AS BIGINT)
           AS n_relevant,
         list_sum(list(CASE WHEN nl = qlabel THEN (SELECT d FROM disc)[rank]
                            ELSE CAST(0.0 AS DOUBLE) END ORDER BY rank)) AS dcg
  FROM topk GROUP BY 1, 2
)
SELECT query_id, qlabel AS true_label, n_relevant, dcg,
       CASE WHEN n_relevant > 0
            THEN list_sum(((SELECT d FROM disc))[1:n_relevant]) END AS idcg,
       dcg / (CASE WHEN n_relevant > 0
                   THEN list_sum(((SELECT d FROM disc))[1:n_relevant]) END)
         AS ndcg
FROM per_q
"""


MATRYOSHKA_DIMS = (8, 16, 32)


def sim_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: Matryoshka truncation audit — for each vector, the cosine
    similarity between the full embedding and its d-dim prefix
    (zero-padded), for d ∈ {MATRYOSHKA_DIMS}: equals
    prefix_norm/full_norm, i.e. the fraction of the vector's energy the
    first d dimensions carry. The go/no-go table for serving truncated
    (MRL-style) embeddings at lower index cost: if p50 cosine at d=16
    is ≥0.95 you can cut the index 4×. All folds are sequential
    prefix-sums in dimension order — identical on both engines.

    Scale: zero shuffle — one scan, per-row array folds."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    full_sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cols = [F.col("vec_id"), F.sqrt(full_sq).alias("full_norm")]
    for d in MATRYOSHKA_DIMS:
        pre_sq = F.aggregate(
            F.transform(F.slice(v, 1, d), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        cols.append((F.sqrt(pre_sq) / F.sqrt(full_sq)).alias(f"cos_at_{d}"))
    return emb.select(*cols)


def _matryoshka_oracle() -> str:
    parts = ",\n       ".join(
        f"sqrt(list_sum(list_transform(v[1:{d}], x -> x * x)))"
        f" / sqrt(list_sum(list_transform(v, x -> x * x))) AS cos_at_{d}"
        for d in MATRYOSHKA_DIMS
    )
    return f"""
SELECT vec_id,
       sqrt(list_sum(list_transform(v, x -> x * x))) AS full_norm,
       {parts}
FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
"""


KAPPA_MOD_A = 97
KAPPA_MOD_B = 89
KAPPA_CLASSES = 3


def tp_annotation_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: inter-annotator agreement (Cohen's κ) — two deterministic
    synthetic annotators label each document ({KAPPA_CLASSES} classes,
    md5-hash-derived with different salts so they agree partly by
    chance), and the query computes the full agreement audit: the
    confusion matrix diagonal, observed agreement p_o, chance agreement
    p_e from the marginals, and κ = (p_o − p_e)/(1 − p_e). The labeling
    QA gate every human/LLM annotation pipeline runs before trusting
    its labels. Counts exact; p_o/p_e/κ pointwise doubles from exact
    integer ratios.

    Scale: one corpus scan → one {KAPPA_CLASSES}²-cell aggregate; the
    κ computation is driver-sized arithmetic kept in the plan as 1-row
    literals-free expressions."""
    docs = read_corpus(spark, sf_dir, "documents")

    def annot(salt: str, mod: int):
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(salt))), 1, 7), 16, 10).cast("long"),
            F.lit(mod),
        ) % KAPPA_CLASSES

    labeled = docs.select(
        "doc_id",
        annot(":annA", KAPPA_MOD_A).alias("label_a"),
        annot(":annB", KAPPA_MOD_B).alias("label_b"),
    )
    cells = labeled.groupBy("label_a", "label_b").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.when(F.col("label_a") == F.col("label_b"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    ma = cells.groupBy("label_a").agg(F.sum("n").cast("bigint").alias("n_a"))
    mb = cells.groupBy("label_b").agg(F.sum("n").cast("bigint").alias("n_b"))
    pe_terms = (
        ma.join(mb, ma.label_a == mb.label_b)
        .select(
            (F.col("n_a").cast("double") * F.col("n_b").cast("double")).alias("prod"),
            F.col("label_a").alias("cls"),
        )
    )
    # fold the K chance terms in class order (K is tiny and fixed)
    pe_sum = pe_terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("cls", "prod"))),
            F.lit(0.0),
            lambda a, x: a + x["prod"],
        ).alias("pe_num")
    )
    po = F.col("agree").cast("double") / F.col("total").cast("double")
    pe = F.col("pe_num") / (F.col("total").cast("double") * F.col("total").cast("double"))
    return (
        tot.crossJoin(F.broadcast(pe_sum))
        .select(
            "total",
            "agree",
            po.alias("p_observed"),
            pe.alias("p_chance"),
            ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
        )
    )


TP_KAPPA_ORACLE = f"""
WITH labeled AS (
  SELECT doc_id,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':annA'), 1, 7))::BIGINT
          % {KAPPA_MOD_A}) % {KAPPA_CLASSES} AS label_a,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':annB'), 1, 7))::BIGINT
          % {KAPPA_MOD_B}) % {KAPPA_CLASSES} AS label_b
  FROM documents
), cells AS (
  SELECT label_a, label_b, CAST(count(*) AS BIGINT) AS n
  FROM labeled GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total,
         CAST(sum(CASE WHEN label_a = label_b THEN n ELSE 0 END) AS BIGINT)
           AS agree
  FROM cells
), ma AS (SELECT label_a, CAST(sum(n) AS BIGINT) AS n_a FROM cells GROUP BY 1),
mb AS (SELECT label_b, CAST(sum(n) AS BIGINT) AS n_b FROM cells GROUP BY 1),
pe AS (
  SELECT list_sum(list(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       ORDER BY label_a)) AS pe_num
  FROM ma JOIN mb ON label_a = label_b
)
SELECT total, agree,
       CAST(agree AS DOUBLE) / CAST(total AS DOUBLE) AS p_observed,
       pe_num / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) AS p_chance,
       ((CAST(agree AS DOUBLE) / CAST(total AS DOUBLE))
        - pe_num / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)))
       / (1.0 - pe_num / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)))
         AS kappa
FROM tot, pe
"""


SWEEP_THRESHOLDS = ("0.02", "0.05", "0.1", "0.2", "0.4")


def dd_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: dedup-threshold sensitivity sweep — for each candidate
    Jaccard threshold, how many near-dup pairs survive, how many
    documents would drop (greedy larger-id policy) and the corpus drop
    rate: the tuning curve you read BEFORE committing a threshold to a
    multi-day 100 TB dedup run (the difference between 0.1 and 0.2 can
    be a double-digit percentage of the corpus). One LSH candidate pass
    feeds every threshold; the sweep is a literal explode over the
    verified pairs.

    Scale: candidates computed once (bucket-bounded); per-threshold
    rollups are threshold-cardinality aggregates."""
    from us_dot_flights_lakehouse_spark.llm.dedup import minhash_lsh_pairs

    docs = read_corpus(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.0)
    total = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    ths = F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
    swept = pairs.select(
        "doc_id_b", "jaccard", F.explode(ths).alias("threshold")
    ).filter(F.col("jaccard") >= F.col("threshold"))
    per_t = swept.groupBy("threshold").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_id_b").cast("bigint").alias("n_docs_dropped"),
    )
    return per_t.crossJoin(F.broadcast(total)).select(
        "threshold",
        "n_pairs",
        "n_docs_dropped",
        (
            F.col("n_docs_dropped").cast("double") / F.col("n_docs").cast("double")
        ).alias("drop_frac"),
    )


def _dd_sweep_oracle() -> str:
    ths = ", ".join(f"(CAST({t} AS DOUBLE))" for t in SWEEP_THRESHOLDS)
    return f"""
WITH d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), s AS (SELECT doc_id, unnest(shs) AS sh FROM d),
hashed AS (SELECT doc_id, {_HASH28.format(x='sh')} AS h FROM s),
sig AS (
  SELECT doc_id,
    {_sig_mins_sql()}
  FROM hashed GROUP BY doc_id
), bands AS (
  SELECT doc_id, b.band_id, b.band_key
  FROM sig, (VALUES {_band_keys_sql()}) AS b(band_id, band_key)
), cand AS (
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
), verified AS (
  SELECT ib,
         CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
           / CAST(len(da.shs) + len(db.shs)
                  - len(list_intersect(da.shs, db.shs)) AS DOUBLE) AS jaccard
  FROM cand JOIN d da ON ia = da.doc_id JOIN d db ON ib = db.doc_id
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT t.threshold,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT ib) AS BIGINT) AS n_docs_dropped,
       CAST(count(DISTINCT ib) AS DOUBLE) / CAST(any_value(n_docs) AS DOUBLE)
         AS drop_frac
FROM verified, (VALUES {ths}) AS t(threshold), tot
WHERE jaccard >= t.threshold
GROUP BY t.threshold
"""


def tp_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: one FULL BPE training step, distributed — take iteration 0's
    argmax pair (corpus-weighted, lexicographic tie-break), APPLY it
    across the vocabulary with the exact greedy left-to-right merge
    semantics ('aaaa' + (a,a) → 'aa','aa' — an output-driven fold, not
    a regex), and emit iteration 1's re-ranked pair counts alongside
    the merge that was applied. tp_bpe_pair_counts showed the counting;
    this certifies the REWRITE — the step the driver-iterative
    ``bpe_train`` repeats, here as one lazy distributed plan whose
    every post-merge count the oracle re-derives.

    Scale: vocabulary-sized after the one corpus word-count; the merge
    fold is per-word O(len); the argmax rides a 1-row broadcast."""
    docs = read_corpus(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    order = [F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym")]
    top1 = (
        tokenizer.merge_pair_counts(docs)
        .orderBy(*order)
        .limit(1)
        .select(
            F.col("left_sym").alias("ml"), F.col("right_sym").alias("mr")
        )
    )
    j = words.crossJoin(F.broadcast(top1))
    empty = F.expr("array()").cast("array<string>")
    syms = F.aggregate(
        F.split("w", ""),
        empty,
        lambda acc, c: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.col("ml"))
            & (c == F.col("mr")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.col("ml"), F.col("mr"))),
            ),
        ).otherwise(F.concat(acc, F.array(c))),
    )
    merged = j.select("freq", "ml", "mr", syms.alias("syms"))
    pairs = merged.select(
        "freq",
        "ml",
        "mr",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.expr("array()").cast("array<struct<l:string,r:string>>"))
        ).alias("p"),
    )
    counts = pairs.groupBy("ml", "mr", "p.l", "p.r").agg(
        F.sum("freq").cast("bigint").alias("pair_count")
    )
    ranked = (
        counts.orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
        .limit(BPE_TOPK)
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
    return ranked.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("ml").alias("merge_l"),
        F.col("mr").alias("merge_r"),
        F.col("l").alias("left_sym"),
        F.col("r").alias("right_sym"),
        "pair_count",
    )


TP_BPE_STEP_ORACLE = f"""
WITH words AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({{tokens}}) AS w FROM documents)
  GROUP BY w
), pairlists AS (
  SELECT freq,
    CASE WHEN length(word) >= 2
         THEN list_transform(range(1, length(word)),
                             i -> [substr(word, CAST(i AS INTEGER), 1),
                                   substr(word, CAST(i AS INTEGER) + 1, 1)])
         ELSE CAST([] AS VARCHAR[][]) END AS ps
  FROM words
), counts0 AS (
  SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS c
  FROM (SELECT freq, unnest(ps) AS p FROM pairlists) GROUP BY 1, 2
), top1 AS (
  SELECT l AS ml, r AS mr FROM counts0 ORDER BY c DESC, l, r LIMIT 1
), merged AS (
  SELECT freq, t.ml, t.mr,
         list_reduce(
           list_prepend(CAST([] AS VARCHAR[]),
                        list_transform(string_split(word, ''), ch -> [ch])),
           (acc, x) -> CASE
             WHEN len(acc) > 0 AND acc[len(acc)] = t.ml AND x[1] = t.mr
             THEN list_append(acc[1:len(acc)-1], t.ml || t.mr)
             ELSE list_append(acc, x[1]) END
         ) AS syms
  FROM words, top1 t
), pairs1 AS (
  SELECT freq, ml, mr, unnest(
    CASE WHEN len(syms) >= 2
         THEN list_transform(range(1, len(syms)),
                             i -> [syms[i], syms[i+1]])
         ELSE CAST([] AS VARCHAR[][]) END) AS p
  FROM merged
), counts1 AS (
  SELECT ml AS merge_l, mr AS merge_r, p[1] AS left_sym, p[2] AS right_sym,
         CAST(sum(freq) AS BIGINT) AS pair_count
  FROM pairs1 GROUP BY 1, 2, 3, 4
)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, left_sym,
                                 right_sym) AS INTEGER) AS rank,
         merge_l, merge_r, left_sym, right_sym, pair_count
  FROM counts1
) WHERE rank <= {{topk}}
"""


def _bpe_step_oracle() -> str:
    return TP_BPE_STEP_ORACLE.format(tokens=_TOKENS, topk=BPE_TOPK)


AUDIO_TARGET_PEAK = 30000


def mm_audio_normalize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: loudness-normalization audit — for each synthesized WAV (the
    mm_audio_stats fixture), the peak-normalization plan: current peak,
    exact integer energy (Σx², the RMS numerator), the gain that maps
    the peak to {AUDIO_TARGET_PEAK}, and how many samples a naive gain
    application would clip past int16 — the pre-flight every audio
    corpus normalization runs BEFORE rewriting terabytes of PCM. All
    closed-form from the deterministic fixture: peak and energy are
    exact integers; gain and clip tests are pointwise doubles.

    Scale: two chained Arrow kernels (synthesize → decode+audit), zero
    shuffle."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import wav_encode

        for pdf in batches:
            payloads = [
                wav_encode(
                    ((int(d) * 31 + np.arange(256) * 7919) % 4001 - 2000).astype(
                        np.int16
                    ),
                    8000,
                    extra_chunks=[(b"LIST", b"INFO" + b"\x00" * 12)],
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    wavs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_audio(wavs)

    def audit(batches):
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf["id"], pdf["samples"]):
                v = np.frombuffer(buf, "<i2").astype(np.int64)
                peak = int(np.abs(v).max())
                energy = int((v * v).sum())
                gain = float(AUDIO_TARGET_PEAK) / float(peak)
                clip = int((np.abs(v.astype(np.float64) * gain) > 32767.0).sum())
                rows.append((i, peak, energy, gain, clip))
            yield pd.DataFrame(
                rows, columns=["doc_id", "peak", "energy", "gain", "n_would_clip"]
            )

    return decoded.mapInPandas(
        audit,
        schema="doc_id long, peak long, energy long, gain double, n_would_clip long",
    )


MM_AUDIO_NORM_ORACLE = f"""
WITH samples AS (
  SELECT doc_id, i,
         (doc_id * 31 + i * 7919) % 4001 - 2000 AS x
  FROM documents,
       (SELECT unnest(generate_series(0, 255)) AS i)
), per_doc AS (
  SELECT doc_id,
         CAST(max(abs(x)) AS BIGINT) AS peak,
         CAST(sum(x * x) AS BIGINT) AS energy
  FROM samples GROUP BY doc_id
), gained AS (
  SELECT s.doc_id,
         CAST(sum(CASE WHEN abs(CAST(s.x AS DOUBLE)
                   * (CAST({AUDIO_TARGET_PEAK} AS DOUBLE) / CAST(p.peak AS DOUBLE)))
                   > 32767.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_would_clip
  FROM samples s JOIN per_doc p USING (doc_id)
  GROUP BY s.doc_id
)
SELECT p.doc_id, p.peak, p.energy,
       CAST({AUDIO_TARGET_PEAK} AS DOUBLE) / CAST(p.peak AS DOUBLE) AS gain,
       g.n_would_clip
FROM per_doc p JOIN gained g USING (doc_id)
"""


def sim_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: intrinsic-dimension estimate via the participation ratio —
    PR = (Σ_d λ_d)² / Σ_d λ_d² over the per-dimension variances (the
    diagonal-covariance approximation): how many dimensions the
    embedding REALLY uses (PR ≈ 64 isotropic, PR ≈ 1 collapsed). The
    one-number representation-health check next to the power-iteration
    spectrum and the CUR energy curve. Variances come from exact
    value-ordered folds; the two PR sums fold in dimension order.

    Scale: one shuffle to 64 dimension cells; the rest is 64-row
    arithmetic reduced to one row."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    cells = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "d", "x"
        )
    )
    dims = cells.groupBy("d").agg(
        F.count("*").cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list("x")), F.lit(0.0), lambda a, v: a + v
        ).alias("s1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.col("x") * F.col("x"))),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("s2"),
    )
    var = F.col("s2") / F.col("n").cast("double") - (
        F.col("s1") / F.col("n").cast("double")
    ) * (F.col("s1") / F.col("n").cast("double"))
    packed = dims.select("d", var.alias("lam")).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("d", "lam"))),
            F.lit(0.0),
            lambda a, x: a + x["lam"],
        ).alias("tr"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("d", "lam"))),
            F.lit(0.0),
            lambda a, x: a + x["lam"] * x["lam"],
        ).alias("tr2"),
        F.count("*").cast("bigint").alias("n_dims"),
    )
    return packed.select(
        "n_dims",
        F.col("tr").alias("total_variance"),
        (F.col("tr") * F.col("tr") / F.col("tr2")).alias("participation_ratio"),
        (F.col("tr") * F.col("tr") / F.col("tr2") / F.col("n_dims").cast("double")).alias(
            "isotropy_frac"
        ),
    )


SIM_INTRINSIC_ORACLE = """
WITH cells AS (
  SELECT unnest(generate_series(0, len(embedding) - 1)) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), dims AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n,
         list_sum(list(x ORDER BY x)) AS s1,
         list_sum(list(x * x ORDER BY x * x)) AS s2
  FROM cells GROUP BY d
), lam AS (
  SELECT d, s2 / CAST(n AS DOUBLE)
              - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS lam
  FROM dims
), packed AS (
  SELECT list_sum(list(lam ORDER BY d)) AS tr,
         list_sum(list(lam * lam ORDER BY d)) AS tr2,
         CAST(count(*) AS BIGINT) AS n_dims
  FROM lam
)
SELECT n_dims, tr AS total_variance,
       tr * tr / tr2 AS participation_ratio,
       tr * tr / tr2 / CAST(n_dims AS DOUBLE) AS isotropy_frac
FROM packed
"""


def dd_source_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: per-source dedup REPORT — the pipeline verdict
    (dd_pipeline_verdict) rolled up to the table a data-review meeting
    actually reads: per source, how many documents each action hit and
    the final keep rate. Certifies the composition end-to-end at the
    reporting grain.

    Scale: the verdict's own bounded stages plus one source-cardinality
    rollup."""
    docs = read_corpus(spark, sf_dir, "documents").select("doc_id", "source")
    verdict = dd_pipeline_verdict(spark, sf_dir).join(docs, "doc_id")
    return verdict.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("action") == "drop_exact").cast("long"))
        .cast("bigint")
        .alias("n_drop_exact"),
        F.sum((F.col("action") == "drop_near").cast("long"))
        .cast("bigint")
        .alias("n_drop_near"),
        F.sum((F.col("action") == "drop_mostly_dup").cast("long"))
        .cast("bigint")
        .alias("n_drop_span"),
        F.sum((F.col("action") == "strip_spans").cast("long"))
        .cast("bigint")
        .alias("n_strip"),
        (
            F.sum(F.col("action").isin("keep", "strip_spans").cast("long")).cast(
                "double"
            )
            / F.count("*").cast("double")
        ).alias("keep_rate"),
    )


def _dd_source_report_oracle() -> str:
    verdict = _dd_pipeline_oracle()
    return f"""
WITH verdict AS ({verdict})
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN action = 'drop_exact' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drop_exact,
       CAST(sum(CASE WHEN action = 'drop_near' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drop_near,
       CAST(sum(CASE WHEN action = 'drop_mostly_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_drop_span,
       CAST(sum(CASE WHEN action = 'strip_spans' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_strip,
       CAST(sum(CASE WHEN action IN ('keep', 'strip_spans') THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_rate
FROM verdict v JOIN documents d ON v.doc_id = d.doc_id
GROUP BY 1
"""


def tp_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: packing-strategy comparison — per source, the padding waste
    of the two packing operators this engine ships: concat-then-chunk
    (pack_sequences: waste only in the final sequence) vs
    first-fit-decreasing bins (pack_bestfit: no document straddles a
    boundary, waste in every bin's tail): the table that answers 'what
    does document integrity cost in padded tokens'. FFD bin counts come
    from the REAL operator; the concat side is closed-form
    ceil(total/budget).

    Scale: one length scan + the FFD grouped-map; the rollup is
    source-cardinality."""
    from us_dot_flights_lakehouse_spark.llm.curation import pack_bestfit

    docs = read_corpus(spark, sf_dir, "documents")
    with_len = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    ffd = pack_bestfit(with_len, PACK_BUDGET)
    per_src = ffd.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("bin_id").cast("bigint").alias("ffd_bins"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    concat_seqs = F.ceil(
        F.col("total_tokens").cast("double") / PACK_BUDGET
    ).cast("long")
    ffd_waste = F.col("ffd_bins") * PACK_BUDGET - F.col("total_tokens")
    concat_waste = concat_seqs * PACK_BUDGET - F.col("total_tokens")
    return per_src.select(
        "source",
        "n_docs",
        "total_tokens",
        concat_seqs.alias("concat_seqs"),
        concat_waste.cast("bigint").alias("concat_waste"),
        "ffd_bins",
        ffd_waste.cast("bigint").alias("ffd_waste"),
        (
            ffd_waste.cast("double") / (F.col("ffd_bins") * PACK_BUDGET).cast("double")
        ).alias("ffd_waste_frac"),
    )


def _tp_packing_eff_oracle() -> str:
    ffd = _tp_pack_bestfit_oracle()
    return f"""
WITH ffd AS ({ffd}),
per_src AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(max(bin_id) AS BIGINT) AS ffd_bins,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM ffd GROUP BY source
)
SELECT source, n_docs, total_tokens,
       CAST(ceil(CAST(total_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT)
         AS concat_seqs,
       CAST(CAST(ceil(CAST(total_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT)
            * {PACK_BUDGET} - total_tokens AS BIGINT) AS concat_waste,
       ffd_bins,
       CAST(ffd_bins * {PACK_BUDGET} - total_tokens AS BIGINT) AS ffd_waste,
       CAST(ffd_bins * {PACK_BUDGET} - total_tokens AS DOUBLE)
         / CAST(ffd_bins * {PACK_BUDGET} AS DOUBLE) AS ffd_waste_frac
FROM per_src
"""


def sim_fisher_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: per-dimension Fisher separability — between-class scatter
    over within-class scatter for every embedding dimension, from the
    labeled corpus: which dimensions actually separate the classes
    (feature-selection / probe-before-train audit; complements the
    energy-based CUR selection with a SUPERVISED criterion). Per-class
    sums fold value-ordered; cross-class combinations fold in label
    order — bit-stable.

    Scale: one shuffle to (label, dim) cells (map-side combined), one
    to dim cells; everything downstream is 64-row arithmetic."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    cells = emb.select(
        "label", F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("d", "x")
    )
    cls = cells.groupBy("label", "d").agg(
        F.count("*").cast("bigint").alias("n_c"),
        F.aggregate(
            F.array_sort(F.collect_list("x")), F.lit(0.0), lambda a, v: a + v
        ).alias("s1"),
        F.aggregate(
            F.array_sort(F.collect_list(F.col("x") * F.col("x"))),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("s2"),
    )
    mu_c = F.col("s1") / F.col("n_c").cast("double")
    dims = cls.select(
        "d", "label", "n_c", "s1", "s2", mu_c.alias("mu_c")
    ).groupBy("d").agg(
        F.sum("n_c").cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("label", "s1"))),
            F.lit(0.0),
            lambda a, x: a + x["s1"],
        ).alias("tot_s1"),
        F.array_sort(
            F.collect_list(F.struct("label", "n_c", "mu_c", "s2"))
        ).alias("per_class"),
    )
    mu = F.col("tot_s1") / F.col("n").cast("double")
    between = F.aggregate(
        F.col("per_class"),
        F.lit(0.0),
        lambda a, c: a
        + c["n_c"].cast("double") * (c["mu_c"] - mu) * (c["mu_c"] - mu),
    )
    within = F.aggregate(
        F.col("per_class"),
        F.lit(0.0),
        lambda a, c: a + (c["s2"] - c["n_c"].cast("double") * c["mu_c"] * c["mu_c"]),
    )
    return dims.select(
        F.col("d").cast("int").alias("dim"),
        "n",
        between.alias("between_scatter"),
        within.alias("within_scatter"),
        (between / within).alias("fisher_ratio"),
    )


SIM_FISHER_ORACLE = """
WITH cells AS (
  SELECT label,
         unnest(generate_series(0, len(embedding) - 1)) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cls AS (
  SELECT label, d, CAST(count(*) AS BIGINT) AS n_c,
         list_sum(list(x ORDER BY x)) AS s1,
         list_sum(list(x * x ORDER BY x * x)) AS s2
  FROM cells GROUP BY 1, 2
), dims AS (
  SELECT d, CAST(sum(n_c) AS BIGINT) AS n,
         list_sum(list(s1 ORDER BY label)) AS tot_s1,
         list(struct_pack(label := label, n_c := n_c,
                          mu_c := s1 / CAST(n_c AS DOUBLE), s2 := s2)
              ORDER BY label) AS per_class
  FROM cls GROUP BY d
)
SELECT CAST(d AS INTEGER) AS dim, n,
       list_sum(list_transform(per_class, c ->
         CAST(c.n_c AS DOUBLE)
           * (c.mu_c - tot_s1 / CAST(n AS DOUBLE))
           * (c.mu_c - tot_s1 / CAST(n AS DOUBLE)))) AS between_scatter,
       list_sum(list_transform(per_class, c ->
         c.s2 - CAST(c.n_c AS DOUBLE) * c.mu_c * c.mu_c)) AS within_scatter,
       list_sum(list_transform(per_class, c ->
         CAST(c.n_c AS DOUBLE)
           * (c.mu_c - tot_s1 / CAST(n AS DOUBLE))
           * (c.mu_c - tot_s1 / CAST(n AS DOUBLE))))
       / list_sum(list_transform(per_class, c ->
         c.s2 - CAST(c.n_c AS DOUBLE) * c.mu_c * c.mu_c)) AS fisher_ratio
FROM dims
"""


SPAN_DROP_FRAC = 0.5


def dd_pipeline_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: the END-TO-END dedup pipeline verdict — one query composing
    the whole stack the way a production corpus build runs it: exact
    dedup (normalized fingerprint, min-id keeper), MinHash-LSH near-dup
    (greedy one-pass policy: the larger id of every verified pair
    drops; dd_dup_clusters is the transitive alternative), and
    span-level dedup (cross-doc duplicated-token fraction), resolved
    into a single per-document action:
    drop_exact → drop_near → drop_mostly_dup (> {SPAN_DROP_FRAC}
    duplicated) → strip_spans → keep. THE table a curation run
    publishes; every contributing signal is itself an oracle-checked
    operator, and this query certifies their composition.

    Scale: each stage keeps its own bounded-join guarantees (hash
    groupBy / banded LSH / gram-window); the final assembly is three
    doc-keyed left joins."""
    from us_dot_flights_lakehouse_spark.functions.text import (
        normalized_fingerprint,
    )
    from us_dot_flights_lakehouse_spark.llm.dedup import (
        EXACT_SUBSTR_K,
        exact_substr_spans,
        minhash_lsh_pairs,
    )

    docs = read_corpus(spark, sf_dir, "documents")
    fpd = docs.select(
        "doc_id", normalized_fingerprint("text").alias("fingerprint")
    )
    keepers = fpd.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper"))
    exact = fpd.join(keepers, "fingerprint").select(
        "doc_id", (F.col("doc_id") != F.col("keeper")).alias("exact_dup")
    )
    near_ids = (
        minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    spans = exact_substr_spans(docs, EXACT_SUBSTR_K)
    span_frac = (
        docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("total_tokens")
        )
        .join(
            spans.groupBy("doc_id").agg(
                F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_toks")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            (
                F.coalesce("dup_toks", F.lit(0)).cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("span_frac"),
        )
    )
    merged = (
        exact.join(near_ids, "doc_id", "left")
        .join(span_frac, "doc_id")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
            "span_frac",
        )
    )
    action = (
        F.when(F.col("exact_dup"), "drop_exact")
        .when(F.col("near_dup"), "drop_near")
        .when(F.col("span_frac") > SPAN_DROP_FRAC, "drop_mostly_dup")
        .when(F.col("span_frac") > 0.0, "strip_spans")
        .otherwise("keep")
    )
    return merged.select(
        "doc_id", "exact_dup", "near_dup", "span_frac", action.alias("action")
    )


def _dd_pipeline_oracle() -> str:
    from us_dot_flights_lakehouse_spark.llm.dedup import EXACT_SUBSTR_K

    return f"""
WITH mh_d AS (
  SELECT doc_id, {_SHINGLES} AS shs
  FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
), mh_s AS (SELECT doc_id, unnest(shs) AS sh FROM mh_d),
mh_h AS (SELECT doc_id, {_HASH28.format(x='sh')} AS h FROM mh_s),
mh_sig AS (
  SELECT doc_id,
    {_sig_mins_sql()}
  FROM mh_h GROUP BY doc_id
), mh_b AS (
  SELECT doc_id, b.band_id, b.band_key
  FROM mh_sig, (VALUES {_band_keys_sql()}) AS b(band_id, band_key)
), mh_cand AS (
  SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
  FROM mh_b x JOIN mh_b y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
), near AS (
  SELECT DISTINCT ib AS doc_id FROM mh_cand
  JOIN mh_d da ON ia = da.doc_id JOIN mh_d db ON ib = db.doc_id
  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
          / CAST(len(da.shs) + len(db.shs)
                 - len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        >= {JACCARD_THRESHOLD}
), {_substr_spans_cte(EXACT_SUBSTR_K).lstrip()}, sfrac AS (
  SELECT w.doc_id,
         CAST(coalesce(p.dup_toks, 0) AS DOUBLE) / CAST(w.n AS DOUBLE)
           AS span_frac
  FROM words w LEFT JOIN (
    SELECT doc_id, sum(e - s + 1) AS dup_toks FROM spans GROUP BY 1
  ) p USING (doc_id)
), fpg AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         MIN(doc_id) AS keeper
  FROM documents GROUP BY 1
), exact AS (
  SELECT doc_id,
         doc_id != keeper AS exact_dup
  FROM (SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents) d JOIN fpg USING (fp)
)
SELECT e.doc_id, e.exact_dup,
       (n.doc_id IS NOT NULL) AS near_dup,
       sf.span_frac,
       CASE WHEN e.exact_dup THEN 'drop_exact'
            WHEN n.doc_id IS NOT NULL THEN 'drop_near'
            WHEN sf.span_frac > {SPAN_DROP_FRAC} THEN 'drop_mostly_dup'
            WHEN sf.span_frac > 0.0 THEN 'strip_spans'
            ELSE 'keep' END AS action
FROM exact e
LEFT JOIN near n USING (doc_id)
JOIN sfrac sf USING (doc_id)
"""


def tp_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: preference-pair assembly (DPO/RLHF data shape) — within each
    source, rank documents by a deterministic quality score (here the
    char-length proxy, tie-broken by id) and pair rank-i-from-top
    (chosen) with rank-i-from-bottom (rejected), dropping the crossover
    pair when counts are odd: the standard margin-maximizing pairing a
    preference-data build runs over scored candidates. Emits ids,
    scores and the score margin per pair — downstream DPO loss weights
    come straight off this table.

    Scale: two windows over the same source-keyed sort (one shuffle);
    the pair join is an equi-join on (source, i)."""
    docs = read_corpus(spark, sf_dir, "documents")
    scored = docs.select("source", "doc_id", F.col("n_chars").alias("score"))
    top = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id"))
    bot = Window.partitionBy("source").orderBy(F.col("score").asc(), F.col("doc_id").desc())
    ranked = scored.select(
        "source",
        "doc_id",
        "score",
        F.row_number().over(top).alias("i_top"),
        F.row_number().over(bot).alias("i_bot"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    chosen = ranked.filter(F.col("i_top") * 2 <= F.col("n")).select(
        "source",
        F.col("i_top").alias("i"),
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("chosen_score"),
    )
    rejected = ranked.filter(F.col("i_bot") * 2 <= F.col("n")).select(
        "source",
        F.col("i_bot").alias("i"),
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("rejected_score"),
    )
    return chosen.join(rejected, ["source", "i"]).select(
        "source",
        F.col("i").cast("long").alias("pair_rank"),
        "chosen_id",
        "rejected_id",
        F.col("chosen_score").cast("long").alias("chosen_score"),
        F.col("rejected_score").cast("long").alias("rejected_score"),
        (F.col("chosen_score") - F.col("rejected_score"))
        .cast("long")
        .alias("margin"),
    )


TP_PREF_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, n_chars AS score,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS i_top,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars ASC, doc_id DESC) AS i_bot,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT c.source, CAST(c.i_top AS BIGINT) AS pair_rank,
       c.doc_id AS chosen_id, r.doc_id AS rejected_id,
       CAST(c.score AS BIGINT) AS chosen_score,
       CAST(r.score AS BIGINT) AS rejected_score,
       CAST(c.score - r.score AS BIGINT) AS margin
FROM ranked c JOIN ranked r
  ON c.source = r.source AND c.i_top = r.i_bot
WHERE c.i_top * 2 <= c.n AND r.i_bot * 2 <= r.n
"""


POWER_ITERS = 3
EMB_DIM = 64


def sim_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: matrix-free power iteration — the top right-singular vector
    of the embedding matrix (principal PCA direction) via
    {POWER_ITERS} fixed iterations of v ← normalize(Aᵀ(Av)), composed
    entirely IN THE PLAN: each iteration is one broadcast of the 1-row
    current vector, one scan computing y=Av row-wise, and one 64-cell
    aggregate folding Aᵀy — no driver-side loop state, no collect. Init
    v⁰ = 1/8 (exact binary) on every dimension; folds are value-ordered
    (g1 lesson) so the result is bit-stable under any partitioning.
    Emits the eigenvector components with the Rayleigh-quotient
    eigenvalue estimate ‖Aᵀ(Av)‖/‖v‖=‖w‖ — the spectral summary
    (intrinsic-dimension / dominant-direction check) an embedding-
    quality report leads with.

    Scale: per iteration ONE wide scan + ONE dim-cardinality shuffle
    (map-side combined); the vector rides a 1-row broadcast. 100
    iterations would compose the same way — Catalyst folds the chain."""
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    emb = read_corpus(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
        )

    vdf = spark.range(1).select(lit_doubles([0.125] * EMB_DIM).alias("vec"))
    for _ in range(POWER_ITERS):
        j = emb.crossJoin(F.broadcast(vdf))
        cells = j.select(
            "vec_id", dot(F.col("v"), F.col("vec")).alias("y"), F.posexplode("v").alias("d", "x")
        )
        w = cells.groupBy("d").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.col("y") * F.col("x"))),
                F.lit(0.0),
                lambda a, t: a + t,
            ).alias("wd")
        )
        packed = w.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "wd"))), lambda s: s["wd"]
            ).alias("w")
        )
        vdf = packed.select(
            F.transform(
                "w",
                lambda x: x
                / F.sqrt(
                    F.aggregate(
                        F.transform("w", lambda t: t * t),
                        F.lit(0.0),
                        lambda a, t: a + t,
                    )
                ),
            ).alias("vec"),
            F.sqrt(
                F.aggregate(
                    F.transform("w", lambda t: t * t), F.lit(0.0), lambda a, t: a + t
                )
            ).alias("eigenvalue"),
        )
    final = vdf
    return final.select(
        F.posexplode("vec").alias("dim", "component"), "eigenvalue"
    ).select(F.col("dim").cast("int").alias("dim"), "component", "eigenvalue")


def _power_iteration_oracle() -> str:
    v0 = _duck_doubles([0.125] * EMB_DIM)
    core = """
cells{n} AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, {dimp}), i -> e.v[i] * vv.v[i])) AS y,
         unnest(generate_series(0, {dimm})) AS d,
         unnest(e.v) AS x
  FROM e, v{p} vv
), w{n} AS (
  SELECT d, list_sum(list(y * x ORDER BY y * x)) AS wd
  FROM cells{n} GROUP BY d
), l{n} AS (SELECT list(wd ORDER BY d) AS w FROM w{n}),
v{n} AS (
  SELECT list_transform(w, x -> x
           / sqrt(list_sum(list_transform(w, t -> t * t)))) AS v,
         sqrt(list_sum(list_transform(w, t -> t * t))) AS eigenvalue
  FROM l{n}
)"""
    its = ",".join(
        core.format(n=i + 1, p=i if i else 0, dimp=EMB_DIM + 1, dimm=EMB_DIM - 1)
        for i in range(POWER_ITERS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), v0 AS (SELECT {v0} AS v),
{its}
SELECT CAST(u.i - 1 AS INTEGER) AS dim, v[u.i] AS component, eigenvalue
FROM v{POWER_ITERS},
     (SELECT unnest(generate_series(1, {EMB_DIM})) AS i) u
"""


CUR_TOP_DIMS = 16


def sim_cur_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: CUR-style column (dimension) selection by leverage-score
    proxy — rank embedding dimensions by their energy share
    Σᵢ vᵢ𝒹² / Σ‖v‖² and keep the top {CUR_TOP_DIMS} with their
    cumulative retained energy: the interpretable low-rank
    column-subset step (CUR decomposition's column phase with column
    norms standing in for true leverage scores, the standard cheap
    surrogate) used to shrink embedding width before an index build.
    All float folds are value-ordered (ties are equal doubles —
    order-free), the cumulative curve folds explicit prefixes of the
    descending energy array, so every number is bit-stable.

    Scale: one shuffle to 64 dimension cells (map-side combined);
    ranking and the cumulative fold run on the 64-row result with a
    1-row broadcast total."""
    emb = read_corpus(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    cells = emb.select("vec_id", F.posexplode("embedding").alias("d", "x"))
    dim_e = cells.groupBy("d").agg(
        F.aggregate(
            F.array_sort(F.collect_list(x * x)),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("energy")
    )
    one = dim_e.agg(
        F.aggregate(
            F.array_sort(F.collect_list("energy")), F.lit(0.0), lambda a, v: a + v
        ).alias("total"),
        F.reverse(F.array_sort(F.collect_list("energy"))).alias("arr_desc"),
    )
    wr = Window.orderBy(F.col("energy").desc(), F.col("d"))
    ranked = dim_e.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= CUR_TOP_DIMS
    )
    j = ranked.crossJoin(F.broadcast(one))
    cum = F.aggregate(
        F.slice("arr_desc", 1, F.col("rank")), F.lit(0.0), lambda a, v: a + v
    )
    return j.select(
        F.col("rank").cast("long").alias("rank"),
        F.col("d").cast("int").alias("dim"),
        "energy",
        (F.col("energy") / F.col("total")).alias("energy_share"),
        (cum / F.col("total")).alias("cum_share"),
    )


SIM_CUR_ORACLE = f"""
WITH cells AS (
  SELECT vec_id,
         unnest(generate_series(0, len(embedding) - 1)) AS d,
         unnest(embedding) AS x
  FROM embeddings
), dim_e AS (
  SELECT d,
         list_sum(list(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                       ORDER BY CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
           AS energy
  FROM cells GROUP BY d
), one AS (
  SELECT list_sum(list(energy ORDER BY energy)) AS total,
         list(energy ORDER BY energy DESC) AS arr_desc
  FROM dim_e
), ranked AS (
  SELECT d, energy,
         row_number() OVER (ORDER BY energy DESC, d) AS rank
  FROM dim_e
)
SELECT CAST(rank AS BIGINT) AS rank, CAST(d AS INTEGER) AS dim, energy,
       energy / total AS energy_share,
       list_sum(arr_desc[1:rank]) / total AS cum_share
FROM ranked, one
WHERE rank <= {CUR_TOP_DIMS}
"""


PACK_BUDGET = 256


def tp_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: first-fit-decreasing bin packing of documents into
    {PACK_BUDGET}-token context windows (llm/curation.pack_bestfit) —
    the no-split packing SFT builds use so no example straddles a
    sequence boundary. The DuckDB oracle re-derives the ENTIRE
    sequential FFD placement as a list_reduce fold over the
    (length DESC, id ASC) item stream — every bin assignment is
    certified, not just the bin count.

    Scale: sequential within a shard by nature; parallelism = shard
    cardinality (see operator docstring for the shard-key sizing
    rule)."""
    from us_dot_flights_lakehouse_spark.llm.curation import pack_bestfit

    docs = read_corpus(spark, sf_dir, "documents")
    with_len = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.lower("text")), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    return pack_bestfit(with_len, PACK_BUDGET)


def _tp_pack_bestfit_oracle() -> str:
    c = PACK_BUDGET
    # current fill of bin k, computed from the assignment history `acc`
    fills = (
        "list_transform(generate_series(1, "
        "coalesce(list_max(list_transform(acc, e -> e.b)), 0)), "
        "k -> list_sum(list_transform(acc, e -> CASE WHEN e.b = k "
        f"THEN e.ln ELSE 0 END)) + x[1].ln <= {c})"
    )
    return f"""
WITH items AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS BIGINT)
           AS n
  FROM documents
), folded AS (
  SELECT source,
         list_reduce(
           list_prepend([struct_pack(id := CAST(0 AS BIGINT),
                                     ln := CAST(0 AS BIGINT), b := 0)],
                        list(
                          [struct_pack(id := doc_id, ln := n, b := 0)]
                          ORDER BY n DESC, doc_id)),
           (acc, x) -> list_append(acc, struct_pack(
             id := x[1].id, ln := x[1].ln,
             -- DuckDB list_position returns 0 (not NULL) when absent
             b := CASE WHEN list_position({fills}, true) = 0
                       THEN coalesce(list_max(list_transform(acc, e -> e.b)), 0) + 1
                       ELSE list_position({fills}, true) END))
         ) AS st
  FROM items GROUP BY source
)
SELECT source, u.id AS doc_id, u.ln AS n_tokens,
       CAST(u.b AS BIGINT) AS bin_id, u.ln > {c} AS overflow
FROM (SELECT source, unnest(st) AS u FROM folded)
WHERE u.b > 0
"""


#: integer-log2 lookup domain for the entropy gates: counts and totals
#: must stay ≤ this (sf0.1 maxima: 61 per-symbol, 577 per-doc — 3.5×
#: headroom; the query null-guards via element_at semantics if exceeded)
ENTROPY_TAB_N = 2048


def _log2_vals() -> list[float]:
    import math

    return [math.log2(i) for i in range(1, ENTROPY_TAB_N + 1)]


def ts_entropy_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: Shannon character/word entropy quality gates — the classic
    gibberish + keyword-stuffing detector pair (low char entropy =
    repeated characters; low normalized word entropy = few distinct
    words dominating). Engine logarithms are NOT correctly rounded and
    differ across engines, so H is computed log-free from EXACT integer
    counts: H = log2(n) − (Σ c·log2 c)/n, with log2 of INTEGERS looked
    up from a shared shortest-repr literal table — both engines fold the
    identical doubles in identical (sorted-symbol) order, so the result
    is bit-stable. Complements ts_char_gini (1−Σp², the log-free proxy)
    with the true-entropy number quality reports quote.

    Scale: zero shuffle — both folds are per-row run-length passes over
    sorted arrays (O(L log L)); the 2048-double table is one parsed
    literal, evaluated scan-side."""
    from us_dot_flights_lakehouse_spark.functions.vectors import lit_doubles

    docs = read_corpus(spark, sf_dir, "documents")
    tab = lit_doubles(_log2_vals())

    def sum_c_log2c(sorted_arr):
        """Run-length fold over a sorted array: Σ run·log2(run), terms
        added in sorted-symbol order (bit-stable)."""
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("s"),
        )

        def flush(acc):
            return F.when(acc["run"] == 0, acc["s"]).otherwise(
                acc["s"]
                + acc["run"].cast("double") * F.element_at(tab, acc["run"].cast("int"))
            )

        return F.aggregate(
            sorted_arr,
            init,
            lambda acc, x: F.when(
                x.eqNullSafe(acc["prev"]),
                F.struct(
                    acc["prev"].alias("prev"),
                    (acc["run"] + 1).alias("run"),
                    acc["s"].alias("s"),
                ),
            ).otherwise(
                F.struct(
                    x.alias("prev"),
                    F.lit(1).cast("long").alias("run"),
                    flush(acc).alias("s"),
                )
            ),
            flush,
        )

    cs = F.regexp_replace(F.lower(F.col("text")), r"\s+", "")
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    base = docs.select(
        "doc_id",
        F.length(cs).cast("long").alias("n_chars_nospace"),
        sum_c_log2c(F.array_sort(F.split(cs, ""))).alias("cterm"),
        F.size(words).cast("long").alias("n_words"),
        sum_c_log2c(F.array_sort(words)).alias("wterm"),
    ).filter((F.col("n_chars_nospace") > 0) & (F.col("n_words") > 0))
    char_h = F.element_at(tab, F.col("n_chars_nospace").cast("int")) - F.col(
        "cterm"
    ) / F.col("n_chars_nospace").cast("double")
    word_h = F.element_at(tab, F.col("n_words").cast("int")) - F.col(
        "wterm"
    ) / F.col("n_words").cast("double")
    return base.select(
        "doc_id",
        "n_chars_nospace",
        "n_words",
        char_h.alias("char_entropy"),
        word_h.alias("word_entropy"),
        F.when(
            F.col("n_words") > 1,
            word_h / F.element_at(tab, F.col("n_words").cast("int")),
        ).alias("norm_word_entropy"),
        (char_h < 3.0).alias("low_char_entropy"),
        (word_h < 3.0).alias("low_word_entropy"),
    )


def _ts_entropy_oracle() -> str:
    vals = _duck_doubles(_log2_vals())
    return f"""
WITH lg AS (
  SELECT unnest(generate_series(1, {ENTROPY_TAB_N})) AS v,
         unnest({vals}) AS l
), s AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS cs,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS w
  FROM documents
), cc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(string_split(cs, '')) AS ch
        FROM s WHERE len(cs) > 0)
  GROUP BY 1, 2
), cagg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
         list_sum(list(CAST(cnt AS DOUBLE) * l ORDER BY ch)) AS cterm
  FROM cc JOIN lg ON cc.cnt = lg.v GROUP BY doc_id
), wc AS (
  SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest(w) AS wd FROM s) GROUP BY 1, 2
), wagg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
         list_sum(list(CAST(cnt AS DOUBLE) * l ORDER BY wd)) AS wterm
  FROM wc JOIN lg ON wc.cnt = lg.v GROUP BY doc_id
), joined AS (
  SELECT c.doc_id, c.n AS nc, c.cterm, wa.n AS nw, wa.wterm,
         lc.l AS log2nc, lw.l AS log2nw
  FROM cagg c JOIN wagg wa USING (doc_id)
  JOIN lg lc ON c.n = lc.v
  JOIN lg lw ON wa.n = lw.v
)
SELECT doc_id, nc AS n_chars_nospace, nw AS n_words,
       log2nc - cterm / CAST(nc AS DOUBLE) AS char_entropy,
       log2nw - wterm / CAST(nw AS DOUBLE) AS word_entropy,
       CASE WHEN nw > 1
            THEN (log2nw - wterm / CAST(nw AS DOUBLE)) / log2nw
       END AS norm_word_entropy,
       (log2nc - cterm / CAST(nc AS DOUBLE)) < 3.0 AS low_char_entropy,
       (log2nw - wterm / CAST(nw AS DOUBLE)) < 3.0 AS low_word_entropy
FROM joined
"""


def dd_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: cross-document repeated-SPAN detection (the ExactSubstr family
    — Lee et al. 2022) rolled up per document: spans in which every
    K-token window occurs verbatim in ≥ 2 distinct documents, merged
    into maximal islands (llm/dedup.exact_substr_spans). Emits per doc
    the span count, duplicated-token total, longest span and duplicated
    fraction — the triage table a curation run reads before deciding
    span removal vs doc drop. Documents with no duplicated spans report
    zeros, so the output is corpus-complete.

    Scale: two shuffles (gram-hash window for the cross-doc test — a
    min≠max window aggregate, NOT a gram self-join — then doc-keyed
    island merge); the gram stream carries md5+position per token."""
    from us_dot_flights_lakehouse_spark.llm.dedup import (
        EXACT_SUBSTR_K,
        exact_substr_spans,
    )

    docs = read_corpus(spark, sf_dir, "documents")
    spans = exact_substr_spans(docs, EXACT_SUBSTR_K)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
        F.max(F.col("span_end") - F.col("span_start") + 1).alias("longest_span"),
    )
    n_tokens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("total_tokens")
    )
    return (
        n_tokens.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("longest_span", F.lit(0))
            .cast("long")
            .alias("longest_span"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("dup_frac"),
        )
    )


def _substr_spans_cte(k: int) -> str:
    """Shared oracle CTE chain re-deriving exact_substr_spans in DuckDB:
    identical md5 gram keys, min≠max cross-doc window test, gap≤k island
    merge."""
    return f"""
words AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
), posn AS (
  SELECT doc_id, w, n, unnest(generate_series(1, n-{k}+1)) AS i
  FROM words WHERE n >= {k}
), grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+{k}-1], ' ')) AS g
  FROM posn
), flagged AS (
  SELECT doc_id, pos,
         min(doc_id) OVER (PARTITION BY g)
           != max(doc_id) OVER (PARTITION BY g) AS dup
  FROM grams
), seeds AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {k}
              THEN 0 ELSE 1 END AS brk
  FROM flagged WHERE dup
), islands AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM seeds
), spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {k} - 1 AS e
  FROM islands GROUP BY doc_id, island
)"""


def _dd_exact_substr_oracle() -> str:
    from us_dot_flights_lakehouse_spark.llm.dedup import EXACT_SUBSTR_K

    return f"""
WITH {_substr_spans_cte(EXACT_SUBSTR_K)}, per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_tokens,
         max(e - s + 1) AS longest_span
  FROM spans GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(w.n AS BIGINT) AS total_tokens,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(p.longest_span, 0) AS BIGINT) AS longest_span,
       CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / CAST(w.n AS DOUBLE)
         AS dup_frac
FROM words w LEFT JOIN per_doc p USING (doc_id)
"""


def dd_span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: APPLY span-level dedup — strip every token covered by a
    cross-document duplicate span (dd_exact_substr's spans) and
    reassemble the cleaned text (llm/dedup.exact_substr_apply). Emits
    per doc the kept/removed token counts and an md5 over the rebuilt
    text, so the oracle certifies byte-exact reassembly, including the
    fully-duplicated documents that come back empty.

    Scale: covered indices explode from spans (short), anti-join and
    ordered reassembly are doc_id-keyed single shuffles."""
    from us_dot_flights_lakehouse_spark.llm.dedup import exact_substr_apply

    docs = read_corpus(spark, sf_dir, "documents")
    return exact_substr_apply(docs).select(
        "doc_id",
        "total_tokens",
        "kept_tokens",
        "removed_tokens",
        F.md5("clean_text").alias("clean_md5"),
    )


def _dd_span_apply_oracle() -> str:
    from us_dot_flights_lakehouse_spark.llm.dedup import EXACT_SUBSTR_K

    return f"""
WITH {_substr_spans_cte(EXACT_SUBSTR_K)}, tokens AS (
  SELECT doc_id, unnest(w) AS word, unnest(generate_series(1, n)) AS idx
  FROM words
), covered AS (
  SELECT DISTINCT doc_id, unnest(generate_series(s, e)) AS idx FROM spans
), kept AS (
  SELECT t.doc_id, t.word, t.idx
  FROM tokens t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
), clean AS (
  SELECT doc_id, count(*) AS kept_tokens,
         string_agg(word, ' ' ORDER BY idx) AS txt
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(w.n AS BIGINT) AS total_tokens,
       CAST(coalesce(c.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(w.n - coalesce(c.kept_tokens, 0) AS BIGINT) AS removed_tokens,
       md5(coalesce(c.txt, '')) AS clean_md5
FROM words w LEFT JOIN clean c USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Round 7: soft dedup, truncation audit, dedup-aware mixture, XML source
# ---------------------------------------------------------------------------


def dd_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: SoftDeDup — instead of DROPPING duplicates, every doc gets a
    training-sampling weight 1/|its exact-dup cluster| so each distinct
    text contributes ONE unit of expected gradient mass regardless of
    copy count (the down-weighting alternative to hard dedup from the
    SoftDeDup line of work; hard dedup = this weight rounded to
    {{0, 1}}). Output per doc: cluster size, weight, and whether hard
    dedup would have kept it (min-id canonical).

    Scale: one fingerprint groupBy (the exact-dedup shuffle) + one join
    back on the fingerprint — both map-side combinable; the weight is
    one exact-integer double division."""
    docs = read_corpus(spark, sf_dir, "documents")
    groups = dedup.exact_dedup_groups(docs)  # fingerprint, keeper, n_copies
    fp = dedup.normalized_fingerprint("text").alias("fingerprint")
    return (
        docs.select("doc_id", "source", fp)
        .join(groups, "fingerprint")
        .select(
            "doc_id",
            "source",
            F.col("n_copies").cast("bigint").alias("cluster_size"),
            (F.lit(1.0) / F.col("n_copies").cast("double")).alias(
                "soft_weight"
            ),
            (F.col("doc_id") == F.col("keeper_doc_id")).alias(
                "hard_dedup_keeps"
            ),
        )
    )


DD_SOFT_DEDUP_ORACLE = """
WITH fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
), groups AS (
  SELECT fingerprint, MIN(doc_id) AS keeper_doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM fp GROUP BY 1
)
SELECT f.doc_id, f.source,
       g.n_copies AS cluster_size,
       1.0 / CAST(g.n_copies AS DOUBLE) AS soft_weight,
       f.doc_id = g.keeper_doc_id AS hard_dedup_keeps
FROM fp f JOIN groups g USING (fingerprint)
"""


def tp_context_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: context-window truncation audit — per source, how much text a
    head-truncation policy at {SEQ_BUDGET} whitespace tokens would throw
    away: docs over budget, total vs kept tokens, and the waste share.
    The go/no-go report a pipeline runs BEFORE choosing truncate-vs-
    chunk (tp_doc_chunking is the chunk alternative; this prices the
    cheap option).

    Scale: one scan + one source-cardinality aggregate; exact BIGINT
    token sums, one double division."""
    docs = read_corpus(spark, sf_dir, "documents")
    n = F.size(tokenize("text")).cast("bigint")
    per_doc = docs.select(
        "source",
        n.alias("n_tokens"),
        F.least(n, F.lit(SEQ_BUDGET).cast("bigint")).alias("kept"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("n_tokens") > SEQ_BUDGET).cast("int"))
        .cast("bigint")
        .alias("docs_truncated"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("kept").cast("bigint").alias("kept_tokens"),
    )
    return agg.select(
        "source",
        "n_docs",
        "docs_truncated",
        "total_tokens",
        "kept_tokens",
        (
            (F.col("total_tokens") - F.col("kept_tokens")).cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("waste_share"),
    )


TP_TRUNCATION_ORACLE = f"""
WITH t AS (
  SELECT source, CAST(len({_TOKENS}) AS BIGINT) AS n FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n > {SEQ_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_truncated,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(least(n, {SEQ_BUDGET})) AS BIGINT) AS kept_tokens,
       CAST(sum(n) - sum(least(n, {SEQ_BUDGET})) AS DOUBLE)
         / CAST(sum(n) AS DOUBLE) AS waste_share
FROM t GROUP BY source
"""


def tp_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: dedup-aware temperature mixture — the tp_temperature_mix
    recipe (w ∝ √n, α=0.5) recomputed over exact-dedup SURVIVORS
    instead of raw rows: duplicate-heavy sources otherwise buy sampling
    weight with copies. Reports raw vs surviving counts, the dedup-aware
    weight, and the weight shift vs the naive mix — the number that
    tells a data engineer which sources were gaming the mixture.

    Scale: the exact-dedup groupBy + a source-cardinality aggregate;
    both normalizers fold source-ordered (bit-stable, the temperature-
    mix technique)."""
    docs = read_corpus(spark, sf_dir, "documents")
    fp = dedup.normalized_fingerprint("text").alias("fingerprint")
    tagged = docs.select("doc_id", "source", fp)
    keepers = tagged.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keeper_doc_id")
    )
    per_src = (
        tagged.join(keepers, "fingerprint")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.sum((F.col("doc_id") == F.col("keeper_doc_id")).cast("int"))
            .cast("bigint")
            .alias("n_surviving"),
        )
    )

    def z_of(col_name: str):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("source", col_name))),
                lambda s: F.sqrt(s[col_name].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norm = per_src.agg(
        z_of("n_raw").alias("z_raw"), z_of("n_surviving").alias("z_surv")
    )
    return per_src.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_raw",
        "n_surviving",
        (F.sqrt(F.col("n_surviving").cast("double")) / F.col("z_surv")).alias(
            "weight"
        ),
        (
            F.sqrt(F.col("n_surviving").cast("double")) / F.col("z_surv")
            - F.sqrt(F.col("n_raw").cast("double")) / F.col("z_raw")
        ).alias("weight_shift_vs_raw"),
    )


TP_DEDUP_MIX_ORACLE = """
WITH fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
), keep AS (
  SELECT fingerprint, MIN(doc_id) AS keeper_doc_id FROM fp GROUP BY 1
), per_src AS (
  SELECT f.source,
         CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(CASE WHEN f.doc_id = k.keeper_doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_surviving
  FROM fp f JOIN keep k USING (fingerprint)
  GROUP BY 1
), norm AS (
  SELECT list_sum(list_transform(
           list(struct_pack(s := source, n := n_raw) ORDER BY source),
           e -> sqrt(CAST(e.n AS DOUBLE)))) AS z_raw,
         list_sum(list_transform(
           list(struct_pack(s := source, n := n_surviving) ORDER BY source),
           e -> sqrt(CAST(e.n AS DOUBLE)))) AS z_surv
  FROM per_src
)
SELECT source, n_raw, n_surviving,
       sqrt(CAST(n_surviving AS DOUBLE)) / z_surv AS weight,
       sqrt(CAST(n_surviving AS DOUBLE)) / z_surv
         - sqrt(CAST(n_raw AS DOUBLE)) / z_raw AS weight_shift_vs_raw
FROM per_src CROSS JOIN norm
"""


def ts_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: code-vs-prose detection signals — the heuristics a pretraining
    pipeline uses to ROUTE documents (code to the code pipeline, prose
    to the text one) rather than drop them: brace/bracket density,
    semicolon-per-line rate, indented-line share, assignment-operator
    density, and an ``is_codelike`` composite verdict. All exact integer
    counts with single double divisions — bit-stable, zero shuffle,
    regexp work fused into the scan projection."""
    docs = read_corpus(spark, sf_dir, "documents")
    txt = F.col("text")
    n_chars = F.greatest(F.length(txt), F.lit(1)).cast("double")
    lines = F.split(txt, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    n_brace = F.regexp_count(txt, F.lit(r"[{}()\[\]]")).cast("bigint")
    n_semi = F.regexp_count(txt, F.lit(";")).cast("bigint")
    n_assign = F.regexp_count(txt, F.lit(r"[=:]=?")).cast("bigint")
    n_indent = F.size(
        F.filter(lines, lambda l: l.startswith("    ") | l.startswith("\t"))
    ).cast("bigint")
    brace_density = n_brace.cast("double") / n_chars
    semi_rate = n_semi.cast("double") / n_lines
    indent_share = n_indent.cast("double") / n_lines
    assign_density = n_assign.cast("double") / n_chars
    return docs.select(
        "doc_id",
        n_brace.alias("n_brackets"),
        n_semi.alias("n_semicolons"),
        n_indent.alias("n_indented_lines"),
        brace_density.alias("bracket_density"),
        semi_rate.alias("semicolons_per_line"),
        indent_share.alias("indented_share"),
        assign_density.alias("assign_density"),
        (
            (brace_density > 0.01)
            | (semi_rate > 0.3)
            | (indent_share > 0.3)
        ).alias("is_codelike"),
    )


TS_CODE_DETECT_ORACLE = r"""
WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[{}()\[\]]')) AS BIGINT)
           AS n_brackets,
         CAST(len(regexp_extract_all(text, ';')) AS BIGINT) AS n_semicolons,
         CAST(len(list_filter(string_split(text, chr(10)),
                              l -> l LIKE '    %' OR l LIKE chr(9) || '%'))
              AS BIGINT) AS n_indented_lines,
         CAST(greatest(length(text), 1) AS DOUBLE) AS n_chars,
         CAST(greatest(len(string_split(text, chr(10))), 1) AS DOUBLE)
           AS n_lines,
         CAST(len(regexp_extract_all(text, '[=:]=?')) AS BIGINT) AS n_assign
  FROM documents
)
SELECT doc_id, n_brackets, n_semicolons, n_indented_lines,
       CAST(n_brackets AS DOUBLE) / n_chars AS bracket_density,
       CAST(n_semicolons AS DOUBLE) / n_lines AS semicolons_per_line,
       CAST(n_indented_lines AS DOUBLE) / n_lines AS indented_share,
       CAST(n_assign AS DOUBLE) / n_chars AS assign_density,
       (CAST(n_brackets AS DOUBLE) / n_chars > 0.01
        OR CAST(n_semicolons AS DOUBLE) / n_lines > 0.3
        OR CAST(n_indented_lines AS DOUBLE) / n_lines > 0.3) AS is_codelike
FROM m
"""


def dd_shingle_df_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: shingle document-frequency profile — how Zipf-heavy is the
    3-gram tail: distinct shingles and total postings per df bucket
    (df=1, 2-10, 11-100, >100). This is the EVIDENCE behind every
    stop-shingle cap in the dedup family (a shingle in f docs emits f²
    candidate pairs, so the >100 bucket is the quadratic threat); run it
    before tuning `max_shingle_freq`. Exact BIGINT counts; shares are
    single double divisions.

    Scale: one explode + two tiny aggregates — the same inverted-index
    shuffle the dedup operators pay anyway."""
    docs = read_corpus(spark, sf_dir, "documents")
    idx = docs.select(
        "doc_id", F.explode(shingles(tokenize("text"), 3)).alias("sh")
    )
    df_per_sh = idx.groupBy("sh").agg(F.count("*").cast("bigint").alias("df"))
    bucket = (
        F.when(F.col("df") == 1, "1_unique")
        .when(F.col("df") <= 10, "2_low")
        .when(F.col("df") <= 100, "3_mid")
        .otherwise("4_hot")
    )
    per_bucket = df_per_sh.groupBy(bucket.alias("df_bucket")).agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum("df").cast("bigint").alias("n_postings"),
    )
    tot = df_per_sh.agg(
        F.count("*").cast("bigint").alias("t_sh"),
        F.sum("df").cast("bigint").alias("t_po"),
    )
    return per_bucket.crossJoin(F.broadcast(tot)).select(
        "df_bucket",
        "n_shingles",
        "n_postings",
        (F.col("n_shingles").cast("double") / F.col("t_sh").cast("double")).alias(
            "shingle_share"
        ),
        (F.col("n_postings").cast("double") / F.col("t_po").cast("double")).alias(
            "posting_share"
        ),
    )


DD_SHINGLE_DF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), idx AS (
  SELECT doc_id, unnest({_SHINGLES}) AS sh FROM toks
), dfs AS (
  SELECT sh, CAST(count(*) AS BIGINT) AS df FROM idx GROUP BY 1
), bucketed AS (
  SELECT CASE WHEN df = 1 THEN '1_unique'
              WHEN df <= 10 THEN '2_low'
              WHEN df <= 100 THEN '3_mid'
              ELSE '4_hot' END AS df_bucket,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(df) AS BIGINT) AS n_postings
  FROM dfs GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t_sh, CAST(sum(df) AS BIGINT) AS t_po
  FROM dfs
)
SELECT df_bucket, n_shingles, n_postings,
       CAST(n_shingles AS DOUBLE) / CAST(t_sh AS DOUBLE) AS shingle_share,
       CAST(n_postings AS DOUBLE) / CAST(t_po AS DOUBLE) AS posting_share
FROM bucketed CROSS JOIN tot
"""


def sim_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIM: pairwise cosine-similarity histogram over a DETERMINISTIC
    pair sample (vector i paired with (31·i+7) mod N) — the
    concentration-of-distances audit run before trusting ANN on a new
    embedding space: if most random-pair similarities crowd one bucket,
    neighbors are not meaningfully closer than strangers and recall
    targets need revisiting. One cosine per sampled pair (N pairs, not
    N²); exact BIGINT bucket counts over floor(10·cos).

    Scale: one self-join on the derived partner id (equi-join, AQE
    broadcasts the smaller projection) + a ≤21-bucket aggregate."""
    from us_dot_flights_lakehouse_spark.functions import vectors as V

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.to_double_array("embedding").alias("v")
    )
    n = emb.agg(F.count("*").cast("bigint").alias("n"))
    left = emb.crossJoin(F.broadcast(n)).select(
        "vec_id",
        F.col("v").alias("va"),
        F.pmod(F.col("vec_id") * 31 + 7, F.col("n")).alias("partner"),
    )
    right = emb.select(F.col("vec_id").alias("partner"), F.col("v").alias("vb"))
    pairs = left.join(right, "partner").filter(
        F.col("vec_id") != F.col("partner")
    )
    cos = V.cosine(F.col("va"), F.col("vb"))
    hist = pairs.select(
        F.floor(cos * 10).cast("int").alias("cos_bucket")
    ).groupBy("cos_bucket").agg(F.count("*").cast("bigint").alias("n_pairs"))
    tot = hist.agg(F.sum("n_pairs").cast("bigint").alias("t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "cos_bucket",
        "n_pairs",
        (F.col("n_pairs").cast("double") / F.col("t").cast("double")).alias(
            "pair_share"
        ),
    )


SIM_DIST_HIST_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
pairs AS (
  SELECT a.vec_id,
         list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                                           i -> a.v[i] * a.v[i])))
              * sqrt(list_sum(list_transform(range(1, 65),
                                             i -> b.v[i] * b.v[i])))) AS cos
  FROM e a CROSS JOIN n
  JOIN e b ON b.vec_id = (a.vec_id * 31 + 7) % n.n
  WHERE a.vec_id != b.vec_id
), hist AS (
  SELECT CAST(floor(cos * 10) AS INTEGER) AS cos_bucket,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
), tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM hist)
SELECT cos_bucket, n_pairs,
       CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE) AS pair_share
FROM hist CROSS JOIN tot
"""


def dd_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: corpus-version diff — given two dataset snapshots (derived
    here in closed modular form: v0 drops doc_id ≡0 mod 7, v1 drops
    ≡0 mod 11 and rewrites the text of ≡0 mod 13), classify every
    differing doc as added / removed / changed by comparing text md5
    across a FULL OUTER join on doc_id. This is the dataset-card diff a
    training team reviews between corpus releases (x8_snapshot_diff is
    the relational twin through the real versioned-table protocol; this
    one needs NO fixture write — both sides derive in-plan, so the
    oracle states every verdict in closed form).

    Scale: one full-outer join on doc_id with only (id, md5) moving —
    the minimum a corpus diff fundamentally shuffles."""
    docs = read_corpus(spark, sf_dir, "documents")
    k = F.col("doc_id")
    v0 = docs.filter(k % 7 != 0).select(
        "doc_id", F.md5("text").alias("fp0")
    )
    v1 = docs.filter(k % 11 != 0).select(
        "doc_id",
        F.md5(
            F.when(k % 13 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
            .otherwise(F.col("text"))
        ).alias("fp1"),
    )
    joined = v0.join(v1, "doc_id", "full_outer")
    verdict = (
        F.when(F.col("fp0").isNull(), F.lit("added"))
        .when(F.col("fp1").isNull(), F.lit("removed"))
        .when(F.col("fp0") != F.col("fp1"), F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", verdict)
        .filter(F.col("change_type").isNotNull())
        .select("doc_id", "change_type")
    )


DD_CORPUS_DIFF_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'added'
            WHEN doc_id % 11 = 0 THEN 'removed'
            ELSE 'changed' END AS change_type
FROM documents
WHERE (doc_id % 7 = 0 AND doc_id % 11 != 0)
   OR (doc_id % 11 = 0 AND doc_id % 7 != 0)
   OR (doc_id % 13 = 0 AND doc_id % 7 != 0 AND doc_id % 11 != 0)
"""


BOILERPLATE_TOPK = 20


def ts_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS: top cross-document boilerplate lines — the normalized lines
    (trimmed, lowercased) that appear in the MOST distinct documents,
    with document-frequency and corpus share: the report a data engineer
    reads BEFORE tuning line-level dedup (``dd_line_dedup`` applies the
    removal; this shows what would be removed and how much). Counts are
    exact distinct-doc BIGINTs; top-{BOILERPLATE_TOPK} with
    deterministic tie-break.

    Scale: explode → distinct → one groupBy(line) with map-side
    combine; the global top-k is a TakeOrdered merge of k rows."""
    docs = read_corpus(spark, sf_dir, "documents")
    line = F.lower(F.trim(F.col("line")))
    exploded = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), "\n")).alias("line")
        )
        .select("doc_id", line.alias("line"))
        .filter(F.length("line") > 0)
        .distinct()
    )
    n_docs = docs.select(F.count("*").cast("bigint").alias("n_docs"))
    counts = exploded.groupBy("line").agg(
        F.count("*").cast("bigint").alias("df_docs")
    )
    return (
        counts.crossJoin(F.broadcast(n_docs))
        .select(
            "line",
            "df_docs",
            (
                F.col("df_docs").cast("double") / F.col("n_docs").cast("double")
            ).alias("doc_share"),
        )
        .orderBy(F.desc("df_docs"), F.asc("line"))
        .limit(BOILERPLATE_TOPK)
    )


TS_BOILERPLATE_ORACLE = f"""
WITH lines AS (
  SELECT DISTINCT doc_id, lower(trim(l.line)) AS line
  FROM documents, unnest(string_split(text, chr(10))) AS l(line)
  WHERE length(lower(trim(l.line))) > 0
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT line, CAST(count(*) AS BIGINT) AS df_docs,
       CAST(count(*) AS DOUBLE) / CAST(any_value(n.n_docs) AS DOUBLE)
         AS doc_share
FROM lines CROSS JOIN n
GROUP BY line
ORDER BY df_docs DESC, line ASC
LIMIT {BOILERPLATE_TOPK}
"""


def tp_final_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP: the capstone composition — ONE per-doc training sampling
    weight from the three curation signals the catalog computes
    separately: quality gate (keep iff quality_score ≥ {QUALITY_CUTOFF},
    ts_quality family), SoftDeDup down-weighting (1/exact-dup-cluster
    size, dd_soft_dedup_weights), and the √n temperature source weight
    (tp_temperature_mix). final_weight = gate · soft · source_weight —
    the number a data loader actually samples by, produced as one lazy
    Catalyst plan (scan-fused stats, one fingerprint groupBy, two tiny
    broadcast aggregates).

    Scale: the exact-dedup shuffle dominates; everything else is
    broadcast against it."""
    docs = read_corpus(spark, sf_dir, "documents")
    stats = textstats.text_stats(docs).select(
        "doc_id", "quality_score", "fingerprint"
    )
    sizes = stats.groupBy("fingerprint").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    src = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    z = src.agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("source", "n_docs"))),
                lambda s: F.sqrt(s["n_docs"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z")
    )
    srcw = src.crossJoin(F.broadcast(z)).select(
        "source",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("z")).alias(
            "source_weight"
        ),
    )
    gate = (F.col("quality_score") >= QUALITY_CUTOFF).cast("double")
    soft = F.lit(1.0) / F.col("cluster_size").cast("double")
    return (
        docs.select("doc_id", "source")
        .join(stats, "doc_id")
        .join(sizes, "fingerprint")
        .join(F.broadcast(srcw), "source")
        .select(
            "doc_id",
            "source",
            "quality_score",
            "cluster_size",
            F.col("source_weight"),
            (gate * soft * F.col("source_weight")).alias("final_weight"),
        )
    )


TP_FINAL_WEIGHTS_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source,
    CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
    CAST(len(list_distinct({_TOKENS})) AS INTEGER) AS n_unique_tokens,
    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS INTEGER)
      AS n_punct,
    CAST(length(text) AS INTEGER) AS n_chars,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM documents
), scored AS (
  SELECT doc_id, source, fingerprint,
    (CASE WHEN n_tokens >= 20 AND n_tokens <= 80 THEN CAST(0.4 AS DOUBLE)
          ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 >= 0.3 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
     + CASE WHEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) < 0.1
            THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    ) AS quality_score
  FROM base
), sizes AS (
  SELECT fingerprint, CAST(count(*) AS BIGINT) AS cluster_size
  FROM scored GROUP BY 1
), src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), z AS (
  SELECT list_sum(list_transform(
           list(struct_pack(s := source, n := n_docs) ORDER BY source),
           e -> sqrt(CAST(e.n AS DOUBLE)))) AS z
  FROM src
), srcw AS (
  SELECT source, sqrt(CAST(n_docs AS DOUBLE)) / z.z AS source_weight
  FROM src CROSS JOIN z
)
SELECT s.doc_id, s.source, s.quality_score, c.cluster_size, w.source_weight,
       (CASE WHEN s.quality_score >= {QUALITY_CUTOFF} THEN 1.0 ELSE 0.0 END)
         * (1.0 / CAST(c.cluster_size AS DOUBLE)) * w.source_weight
         AS final_weight
FROM scored s
JOIN sizes c USING (fingerprint)
JOIN srcw w USING (source)
"""


INCR_GRAM_SHARE = 0.5


def dd_incremental_span_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: incremental SPAN-level dedup probe — completes the incremental
    tier (exact ✓ Bloom-prefiltered, fuzzy ✓ band-key probe, clusters ✓
    frozen-label attach, spans: THIS): each new-batch doc's distinct
    3-token shingles probe the PUBLISHED history gram set, and the doc
    is flagged boilerplate_from_history when ≥ {INCR_GRAM_SHARE} of its
    grams already exist in history — the nightly "how much of today's
    crawl is re-crawled text" report, at gram granularity where exact
    dedup sees nothing (partial overlaps, stitched pages).

    Scale: ONE equi-join of the batch gram index against the distinct
    history gram set (batch-sized left side; at 100 TB publish the
    history grams bucketed by gram — the dd_incremental_minhash layout —
    and the probe is exchange-free on the history side; a Bloom prefilter
    composes for mostly-novel batches). Docs with < 3 tokens have no
    grams and are absent by construction on both engines."""
    docs = read_corpus(spark, sf_dir, "documents")
    grams = shingles(tokenize("text"), 3)
    hist = (
        docs.filter(F.col("doc_id") < INCR_HISTORY_CUTOFF)
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") >= INCR_HISTORY_CUTOFF).select(
        "doc_id", F.explode(grams).alias("g")
    )
    per_doc = (
        batch.join(hist.withColumn("_h", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("_h"), F.lit(0)))
            .cast("bigint")
            .alias("n_hist_grams"),
        )
    )
    share = F.col("n_hist_grams").cast("double") / F.col("n_grams").cast(
        "double"
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_hist_grams",
        share.alias("hist_share"),
        (share >= INCR_GRAM_SHARE).alias("boilerplate_from_history"),
    )


DD_INCR_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
), grams AS (
  SELECT doc_id, unnest({_SHINGLES}) AS g FROM toks
), hist AS (
  SELECT DISTINCT g FROM grams WHERE doc_id < {INCR_HISTORY_CUTOFF}
), batch AS (
  SELECT doc_id, g FROM grams WHERE doc_id >= {INCR_HISTORY_CUTOFF}
), per_doc AS (
  SELECT b.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hist_grams
  FROM batch b LEFT JOIN hist h ON b.g = h.g
  GROUP BY 1
)
SELECT doc_id, n_grams, n_hist_grams,
       CAST(n_hist_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS hist_share,
       CAST(n_hist_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
         >= {INCR_GRAM_SHARE} AS boilerplate_from_history
FROM per_doc
"""


def mm_hist_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MM: histogram equalization — the classic contrast-normalization
    pre-processing step an image pipeline runs before feature
    extraction: per image, map each gray level v to
    (cdf(v) − cdf_min) · 255 // (n − cdf_min) (integer floor division —
    NO floats anywhere, so the kernel is bit-reproducible). The synth
    plants DUPLICATE-heavy histograms (pixel i = (5·doc_id + i²//3) mod
    256 on an 8×8 gray PNG), and the oracle re-derives every image's
    full histogram → CDF → remap → stats chain from the closed form in
    SQL, so a bug in encode → decode → equalize hash-fails.

    Scale: synth, decode, equalize and the per-image stats all fuse into
    one Arrow-batched mapInPandas chain — zero shuffle, scan parallel."""
    import numpy as np

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        from us_dot_flights_lakehouse_spark.llm.multimodal import png_encode

        i = np.arange(64)
        base = (i * i) // 3
        for pdf in batches:
            payloads = [
                png_encode(
                    ((5 * int(d) + base) % 256).astype(np.uint8).reshape(8, 8),
                    "L",
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(synth, schema="id long, payload binary")
    decoded = multimodal.decode_image(imgs)

    def equalize(batches):
        for pdf in batches:
            rows = []
            for i, px in zip(pdf["id"], pdf["pixels"]):
                a = np.frombuffer(px, np.uint8).astype(np.int64)
                n = a.size
                vals, counts = np.unique(a, return_counts=True)
                cdf = np.cumsum(counts)
                cmin = int(cdf[0])
                if n == cmin:  # constant image: everything maps to 0
                    m = np.zeros_like(vals)
                else:
                    m = (cdf - cmin) * 255 // (n - cmin)
                rows.append(
                    (
                        int(i),
                        float(int((vals * counts).sum()) / n),
                        float(int((m * counts).sum()) / n),
                        int(len(vals)),
                        int(len(np.unique(m))),
                        int(m.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "mean_before",
                    "mean_after",
                    "n_levels_before",
                    "n_levels_after",
                    "max_after",
                ],
            )

    return decoded.mapInPandas(
        equalize,
        schema=(
            "doc_id long, mean_before double, mean_after double, "
            "n_levels_before long, n_levels_after long, max_after long"
        ),
    )


MM_HIST_EQ_ORACLE = """
WITH px AS (
  SELECT d.doc_id, (5 * d.doc_id + (i.i * i.i) // 3) % 256 AS v
  FROM documents d, (SELECT unnest(range(0, 64)) AS i) i
), hist AS (
  SELECT doc_id, v, CAST(count(*) AS BIGINT) AS c FROM px GROUP BY 1, 2
), cdf AS (
  SELECT doc_id, v, c,
         CAST(sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS BIGINT) AS f,
         CAST(first_value(c) OVER (PARTITION BY doc_id ORDER BY v)
              AS BIGINT) AS cmin
  FROM hist
), mapped AS (
  SELECT doc_id, v, c,
         CASE WHEN cmin = 64 THEN 0
              ELSE ((f - cmin) * 255) // (64 - cmin) END AS m
  FROM cdf
)
SELECT doc_id,
       CAST(sum(v * c) AS DOUBLE) / 64 AS mean_before,
       CAST(sum(m * c) AS DOUBLE) / 64 AS mean_after,
       CAST(count(*) AS BIGINT) AS n_levels_before,
       CAST(count(DISTINCT m) AS BIGINT) AS n_levels_after,
       CAST(max(m) AS BIGINT) AS max_after
FROM mapped GROUP BY doc_id
"""


def src_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRC: XML round-trip through Spark 4's BUILT-IN xml data source
    (the spark-xml package merged upstream) — export the documents table
    as row-tagged XML, scan it back with an explicit schema, and certify
    fidelity with an md5 over the text (XML entity escaping of &/</> and
    newline preservation are exactly what this catches).

    Scale: the XML reader splits per file like json; for 100 TB prefer
    columnar, but feeds ARRIVE as XML — this is the ingest edge."""
    import os
    import tempfile

    from us_dot_flights_lakehouse_spark.fixtures import source_fingerprint

    docs = read_table(spark, sf_dir, "documents")
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    fp = source_fingerprint(sf_dir, "documents")
    out = f"{tempfile.gettempdir()}/us_dot_xml_{sf_tag}_{fp}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.isfile(marker):  # write-once fixture, fingerprint-keyed
        # x10 pattern (ADVICE r7): export to a pid-suffixed temp dir and
        # atomically rename into place, so repeat runs skip the export
        # and a killed run can never leave a torn directory that later
        # reads would treat as a valid fixture. Validity is keyed on
        # Spark's _SUCCESS commit marker, not bare existence (ADVICE r8):
        # a torn directory at `out` — left by pre-fix code or external
        # interference — is evicted and rebuilt, never trusted.
        tmp = f"{out}.tmp.{os.getpid()}"
        docs.write.format("xml").option("rootTag", "docs").option(
            "rowTag", "doc"
        ).mode("overwrite").save(tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil

            if os.path.isfile(marker):
                # a concurrent run committed first — keep theirs
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # torn/markerless directory squatting at out: evict it.
                # The post-eviction rename can still race a concurrent
                # run recreating `out` (ADVICE r9) — re-check the marker
                # and fall back to that run's fixture instead of failing.
                # The concurrent run may have recreated `out` without
                # having written its marker YET (mid-build), so the
                # re-check waits for theirs: fingerprint-keyed fixtures
                # are byte-equivalent, so adopting it is always safe
                # (ADVICE r10). The wait is LIVENESS-bounded, not a
                # fixed budget (ADVICE r11: a 10 s constant tuned to
                # sf_small's ~1 s export spuriously expires at larger
                # scale factors): keep waiting while the concurrent
                # builder shows progress — its pid-suffixed tmp export
                # dir or the recreated `out` advancing its mtime — and
                # expire only after a progress-free grace period.
                import glob
                import time

                shutil.rmtree(out, ignore_errors=True)
                try:
                    os.rename(tmp, out)
                except OSError:

                    def progress_stamp() -> float:
                        # newest mtime across the OTHER builders' tmp
                        # dirs and the (possibly markerless) out dir;
                        # our own tmp must not count as liveness. Walk
                        # the whole SUBTREE's directories, not just the
                        # top level: Spark stages task files under
                        # _temporary/.../attempt_*/, and POSIX only
                        # bumps a dir's mtime on DIRECT-entry changes —
                        # a top-level-only probe is blind for the whole
                        # export stage (review r12). Directory mtimes
                        # alone suffice (every staged file creation
                        # bumps its parent dir) and keep the walk cheap.
                        stamps = [0.0]
                        for d in glob.glob(f"{out}.tmp.*") + [out]:
                            if d == tmp:
                                continue
                            for root, _dirs, _files in os.walk(d):
                                try:
                                    stamps.append(os.path.getmtime(root))
                                except OSError:
                                    pass
                        return max(stamps)

                    grace = 10.0  # seconds WITHOUT progress, not total
                    last, deadline = progress_stamp(), time.monotonic() + grace
                    while not os.path.isfile(marker):
                        if time.monotonic() > deadline:
                            raise
                        time.sleep(0.25)
                        cur = progress_stamp()
                        if cur > last:  # builder alive: extend the wait
                            last, deadline = cur, time.monotonic() + grace
                    shutil.rmtree(tmp, ignore_errors=True)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(docs.schema)
        .load(out)
    )
    return back.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5("text").alias("text_md5"),
    )


SRC_XML_ORACLE = """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 FROM documents
"""


KMV_OVERLAP_K = 128
#: (K - 1) * 2**60 as an EXACT double (127 fits in 7 mantissa bits)
KMV_OVERLAP_NUM = float((KMV_OVERLAP_K - 1) << 60)


def dd_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DD: corpus-overlap estimation from MERGEABLE KMV sketches — the
    set-operation payoff of the bottom-k kernel (operators/sketches.py)
    and the estimator Spark's built-in HLL family cannot give: HLL blobs
    union but never INTERSECT, while the k smallest hashes of A ∪ B are
    a uniform sample of the union, so the fraction of them present in
    both sides estimates Jaccard directly. Per source: one ≤k-hash blob
    over its distinct 3-token shingles (task partials → merge, md5 stays
    JVM-side). Per source pair (all 190): combine the two blobs
    JVM-side (explode + flag-union + row_number ≤ k) into the union's
    bottom-k → est_jaccard = |in both| / k, est_union = (k-1)·2^60/kth.
    This is the planning query a dedup pipeline runs BEFORE the
    expensive pairwise pass: which source pairs overlap enough to gate.

    Oracle contract (a40 pattern — stronger than bound-pinning): every
    estimate is a pure deterministic function of the input set via the
    fixed md5 60-bit prefix, so DuckDB reproduces est_jaccard/est_union
    bit-for-bit from the same hashes, next to the exact
    intersection/union/Jaccard companions computed by a shingle
    self-join.

    Scale: sketch path ships one KB blob per source and compares pairs
    over k-sized hash lists — 100 TB sources reduce to a dim-table-sized
    problem (the exact shingle self-join companion is the CHECK and is
    droppable; its per-shingle expansion is already df-bounded by the
    source count)."""
    from us_dot_flights_lakehouse_spark.operators.sketches import (
        make_kmv_merger,
        make_kmv_partial_builder,
    )

    K = KMV_OVERLAP_K
    docs = read_corpus(spark, sf_dir, "documents")
    sh = docs.select(
        "source", F.explode(shingles(tokenize("text"), 3)).alias("sh")
    )
    hashed = sh.select(
        "source",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv:"), F.col("sh"))), 1, 15
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    partials = hashed.mapInPandas(
        make_kmv_partial_builder("source", "h", K),
        schema="source string, payload string",
    )
    merged = partials.groupBy("source").applyInPandas(
        make_kmv_merger("source", K),
        schema="source string, payload string, n_hashes long, kth long",
    )
    blobs = merged.select(
        "source", F.explode(F.from_json("payload", "array<bigint>")).alias("h")
    )
    pairs = merged.select(F.col("source").alias("src_a")).join(
        F.broadcast(merged.select(F.col("source").alias("src_b"))),
        F.col("src_a") < F.col("src_b"),
    )
    a_side = pairs.join(
        F.broadcast(blobs.withColumnRenamed("source", "src_a")), "src_a"
    ).select(
        "src_a", "src_b", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    b_side = pairs.join(
        F.broadcast(blobs.withColumnRenamed("source", "src_b")), "src_b"
    ).select(
        "src_a", "src_b", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    u = (
        a_side.unionByName(b_side)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    sketch = (
        u.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") <= K)
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("bigint").alias("n_union_k"),
            F.max("h").alias("kth_u"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both_k"),
        )
    )
    # exact companions: distinct shingle sets per source
    ss = sh.distinct()
    sizes = ss.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    inter = (
        ss.alias("x")
        .join(
            ss.alias("y"),
            (F.col("x.sh") == F.col("y.sh"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    base = (
        pairs.join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
            ),
            "src_b",
        )
        .join(inter, ["src_a", "src_b"], "left")
        .withColumn(
            "n_inter", F.coalesce("n_inter", F.lit(0).cast("bigint"))
        )
        .withColumn(
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
    )
    est_u = F.when(
        F.col("n_union_k") < K, F.col("n_union_k").cast("double")
    ).otherwise(F.lit(KMV_OVERLAP_NUM) / F.col("kth_u").cast("double"))
    return (
        base.join(F.broadcast(sketch), ["src_a", "src_b"])
        .withColumn(
            "est_jaccard",
            F.col("n_both_k").cast("double") / F.col("n_union_k").cast("double"),
        )
        .select(
            "src_a",
            "src_b",
            "n_inter",
            "n_union",
            "jaccard",
            "est_jaccard",
            est_u.alias("est_union"),
            (F.col("est_jaccard") - F.col("jaccard")).alias("jac_err"),
        )
    )


DD_KMV_OVERLAP_ORACLE = f"""
WITH t AS (
  SELECT source, {_TOKENS} AS t FROM documents
), sh AS (
  SELECT DISTINCT source, unnest({_SHINGLES}) AS sh FROM t
), hashed AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5('kmv:' || sh), 1, 15))::BIGINT AS h
  FROM sh
), rk AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS r
  FROM hashed
), bk AS (
  SELECT source, h FROM rk WHERE r <= {KMV_OVERLAP_K}
), srcs AS (
  SELECT DISTINCT source FROM sh
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a JOIN srcs b ON a.source < b.source
), u AS (
  SELECT p.src_a, p.src_b, x.h,
         max(CASE WHEN x.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN x.source = p.src_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN bk x ON x.source IN (p.src_a, p.src_b)
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
  FROM u
), sk AS (
  SELECT src_a, src_b,
         CAST(count(*) AS BIGINT) AS n_union_k,
         max(h) AS kth_u,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both_k
  FROM ranked WHERE r <= {KMV_OVERLAP_K} GROUP BY 1, 2
), inter AS (
  SELECT x.source AS src_a, y.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
  GROUP BY 1, 2
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1
), base AS (
  SELECT p.src_a, p.src_b,
         COALESCE(i.n_inter, CAST(0 AS BIGINT)) AS n_inter,
         CAST(sa.n + sb.n - COALESCE(i.n_inter, CAST(0 AS BIGINT)) AS BIGINT)
           AS n_union
  FROM pairs p
  JOIN sizes sa ON sa.source = p.src_a
  JOIN sizes sb ON sb.source = p.src_b
  LEFT JOIN inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
)
SELECT b.src_a, b.src_b, b.n_inter, b.n_union,
       CAST(b.n_inter AS DOUBLE) / CAST(b.n_union AS DOUBLE) AS jaccard,
       CAST(s.n_both_k AS DOUBLE) / CAST(s.n_union_k AS DOUBLE)
         AS est_jaccard,
       CASE WHEN s.n_union_k < {KMV_OVERLAP_K}
            THEN CAST(s.n_union_k AS DOUBLE)
            ELSE CAST({KMV_OVERLAP_NUM!r} AS DOUBLE) / CAST(s.kth_u AS DOUBLE)
       END AS est_union,
       CAST(s.n_both_k AS DOUBLE) / CAST(s.n_union_k AS DOUBLE)
         - CAST(b.n_inter AS DOUBLE) / CAST(b.n_union AS DOUBLE) AS jac_err
FROM base b JOIN sk s ON s.src_a = b.src_a AND s.src_b = b.src_b
"""


QUERIES = {
    "ts_entropy_gates": ts_entropy_gates,
    "o8_reservoir_sample": o8_reservoir_sample,
    "tp_pack_bestfit": tp_pack_bestfit,
    "mm_exif_strip": mm_exif_strip,
    "sim_cur_decomposition": sim_cur_decomposition,
    "dd_minhash_calibration": dd_minhash_calibration,
    "sim_matryoshka_truncation": sim_matryoshka_truncation,
    "tp_annotation_agreement": tp_annotation_agreement,
    "sim_power_iteration": sim_power_iteration,
    "tp_preference_pairs": tp_preference_pairs,
    "dd_pipeline_verdict": dd_pipeline_verdict,
    "tp_packing_efficiency": tp_packing_efficiency,
    "sim_intrinsic_dimension": sim_intrinsic_dimension,
    "mm_audio_normalize_audit": mm_audio_normalize_audit,
    "tp_bpe_merge_step": tp_bpe_merge_step,
    "dd_threshold_sweep": dd_threshold_sweep,
    "dd_soft_dedup_weights": dd_soft_dedup_weights,
    "tp_context_truncation": tp_context_truncation,
    "tp_dedup_aware_mixture": tp_dedup_aware_mixture,
    "src_xml_roundtrip": src_xml_roundtrip,
    "dd_kmv_source_overlap": dd_kmv_source_overlap,
    "mm_hist_equalize": mm_hist_equalize,
    "dd_incremental_span_probe": dd_incremental_span_probe,
    "ts_code_detect": ts_code_detect,
    "ts_boilerplate_lines": ts_boilerplate_lines,
    "dd_corpus_snapshot_diff": dd_corpus_snapshot_diff,
    "dd_shingle_df_profile": dd_shingle_df_profile,
    "sim_distance_histogram": sim_distance_histogram,
    "tp_final_sample_weights": tp_final_sample_weights,
    "dd_source_dedup_report": dd_source_dedup_report,
    "sim_fisher_separability": sim_fisher_separability,
    "ts_zipf_audit": ts_zipf_audit,
    "tp_loss_masking": tp_loss_masking,
    "sim_ndcg_eval": sim_ndcg_eval,
    "ts_source_containment": ts_source_containment,
    "q_schema_drift": q_schema_drift,
    "tp_chat_lint": tp_chat_lint,
    "dd_exact_substr": dd_exact_substr,
    "dd_span_dedup_apply": dd_span_dedup_apply,
    "dd_exact_dedup": dd_exact_dedup,
    "dd_ngram_jaccard": dd_ngram_jaccard,
    "dd_containment": dd_containment,
    "dd_minhash_lsh": dd_minhash_lsh,
    "dd_simhash_values": dd_simhash_values,
    "dd_simhash_pairs": dd_simhash_pairs,
    "dd_embedding_neardup": dd_embedding_neardup,
    "sim_topk_cosine": sim_topk_cosine,
    "sim_hard_negatives": sim_hard_negatives,
    "sim_mips_topk": sim_mips_topk,
    "tp_label_balance": tp_label_balance,
    "sim_lsh_topk": sim_lsh_topk,
    "sim_lsh_multiprobe": sim_lsh_multiprobe,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_pq_topk": sim_pq_topk,
    "sim_random_projection": sim_random_projection,
    "sim_quantize_int8": sim_quantize_int8,
    "ts_text_stats": ts_text_stats,
    "ts_lang_id": ts_lang_id,
    "tp_corpus_curation": tp_corpus_curation,
    "mm_media_manifest": mm_media_manifest,
    "mm_byte_features": mm_byte_features,
    "mm_image_dims": mm_image_dims,
    "mm_pixel_stats": mm_pixel_stats,
    "mm_jpeg_roundtrip": mm_jpeg_roundtrip,
    "mm_image_resize": mm_image_resize,
    "mm_image_crop": mm_image_crop,
    "mm_image_augment": mm_image_augment,
    "mm_frame_stats": mm_frame_stats,
    "mm_video_motion": mm_video_motion,
    "mm_scene_cuts": mm_scene_cuts,
    "mm_frame_dedup": mm_frame_dedup,
    "mm_audio_resample": mm_audio_resample,
    "mm_mjpeg_frame_stats": mm_mjpeg_frame_stats,
    "src_wds_roundtrip": src_wds_roundtrip,
    "src_jsonl_roundtrip": src_jsonl_roundtrip,
    "src_orc_roundtrip": src_orc_roundtrip,
    "ts_heavy_hitters": ts_heavy_hitters,
    "tp_incremental_dedup": tp_incremental_dedup,
    "tp_bloom_incremental_dedup": tp_bloom_incremental_dedup,
    "dd_incremental_minhash": dd_incremental_minhash,
    "dd_incremental_clusters": dd_incremental_clusters,
    "tp_ranker_auc": tp_ranker_auc,
    "ts_ttr_diversity": ts_ttr_diversity,
    "ts_quality_classifier": ts_quality_classifier,
    "ts_heaps_law": ts_heaps_law,
    "sim_lsh_recall_audit": sim_lsh_recall_audit,
    "sim_index_drift": sim_index_drift,
    "tp_neyman_allocation": tp_neyman_allocation,
    "dd_lsh_tuning_curve": dd_lsh_tuning_curve,
    "tp_sequence_packing": tp_sequence_packing,
    "tp_training_mix": tp_training_mix,
    "ts_pii_scrub": ts_pii_scrub,
    "ts_tfidf_keywords": ts_tfidf_keywords,
    "dd_dup_clusters": dd_dup_clusters,
    "dd_line_dedup": dd_line_dedup,
    "tp_contamination": tp_contamination,
    "ts_quality_filters": ts_quality_filters,
    "ts_repetition_filters": ts_repetition_filters,
    "ts_unicode_normalize": ts_unicode_normalize,
    "ts_html_extract": ts_html_extract,
    "ts_url_parse": ts_url_parse,
    "sim_feature_hash": sim_feature_hash,
    "ts_countmin_sketch": ts_countmin_sketch,
    "tp_rag_pipeline": tp_rag_pipeline,
    "ts_ngram_lm": ts_ngram_lm,
    "tp_dataset_card": tp_dataset_card,
    "tp_curriculum_order": tp_curriculum_order,
    "ts_source_similarity": ts_source_similarity,
    "tp_bpe_pair_counts": tp_bpe_pair_counts,
    "tp_token_ids": tp_token_ids,
    "tp_doc_chunking": tp_doc_chunking,
    "tp_source_caps": tp_source_caps,
    "mm_wav_meta": mm_wav_meta,
    "mm_audio_stats": mm_audio_stats,
    "mm_audio_spectral": mm_audio_spectral,
    "mm_gif_roundtrip": mm_gif_roundtrip,
    "mm_mp4_frame_stats": mm_mp4_frame_stats,
    "ts_lm_doc_score": ts_lm_doc_score,
    "tp_vocab_coverage": tp_vocab_coverage,
    "tp_temperature_mix": tp_temperature_mix,
    "mm_phash_dedup": mm_phash_dedup,
    "tp_span_corruption": tp_span_corruption,
    "tp_detokenize_roundtrip": tp_detokenize_roundtrip,
    "mm_silence_trim": mm_silence_trim,
    "dd_url_canonical": dd_url_canonical,
    "tp_length_buckets": tp_length_buckets,
    "tp_train_val_split": tp_train_val_split,
    "ts_novel_ngrams": ts_novel_ngrams,
    "mm_patchify": mm_patchify,
    "mm_image_norm": mm_image_norm,
    "ts_c4_filters": ts_c4_filters,
    "ts_char_gini": ts_char_gini,
    "tp_tokenizer_fertility": tp_tokenizer_fertility,
    "dd_prefix_clusters": dd_prefix_clusters,
    "sim_knn_accuracy": sim_knn_accuracy,
    "tp_dsir_weights": tp_dsir_weights,
    "sim_label_centroids": sim_label_centroids,
    "src_binary_ingest": src_binary_ingest,
    "dd_cluster_keep_best": dd_cluster_keep_best,
    "tp_mixture_epochs": tp_mixture_epochs,
    "ts_lang_confusion": ts_lang_confusion,
    "sim_ivf_recall_audit": sim_ivf_recall_audit,
    "sim_kmeans_inertia": sim_kmeans_inertia,
    "j16_point_in_time_join": j16_point_in_time_join,
    "tp_sft_format": tp_sft_format,
    "mm_audio_vad_segments": mm_audio_vad_segments,
    "sim_kcenter_diversity": sim_kcenter_diversity,
    "sim_pq_recall_audit": sim_pq_recall_audit,
    "dd_semantic_dedup": dd_semantic_dedup,
    "tp_shard_shuffle": tp_shard_shuffle,
    "ts_bigram_commonality": ts_bigram_commonality,
    "mm_mp4_meta": mm_mp4_meta,
}

ORACLES = {
    "ts_entropy_gates": _ts_entropy_oracle,
    "o8_reservoir_sample": O8_RESERVOIR_ORACLE,
    "tp_pack_bestfit": _tp_pack_bestfit_oracle,
    "mm_exif_strip": MM_EXIF_ORACLE,
    "sim_cur_decomposition": SIM_CUR_ORACLE,
    "dd_minhash_calibration": _minhash_cal_oracle,
    "sim_matryoshka_truncation": _matryoshka_oracle,
    "tp_annotation_agreement": TP_KAPPA_ORACLE,
    "sim_power_iteration": _power_iteration_oracle,
    "tp_preference_pairs": TP_PREF_ORACLE,
    "dd_pipeline_verdict": _dd_pipeline_oracle,
    "tp_packing_efficiency": _tp_packing_eff_oracle,
    "sim_intrinsic_dimension": SIM_INTRINSIC_ORACLE,
    "mm_audio_normalize_audit": MM_AUDIO_NORM_ORACLE,
    "tp_bpe_merge_step": _bpe_step_oracle,
    "dd_threshold_sweep": _dd_sweep_oracle,
    "dd_soft_dedup_weights": DD_SOFT_DEDUP_ORACLE,
    "tp_context_truncation": TP_TRUNCATION_ORACLE,
    "tp_dedup_aware_mixture": TP_DEDUP_MIX_ORACLE,
    "src_xml_roundtrip": SRC_XML_ORACLE,
    "dd_kmv_source_overlap": DD_KMV_OVERLAP_ORACLE,
    "mm_hist_equalize": MM_HIST_EQ_ORACLE,
    "dd_incremental_span_probe": DD_INCR_SPAN_ORACLE,
    "ts_code_detect": TS_CODE_DETECT_ORACLE,
    "ts_boilerplate_lines": TS_BOILERPLATE_ORACLE,
    "dd_corpus_snapshot_diff": DD_CORPUS_DIFF_ORACLE,
    "dd_shingle_df_profile": DD_SHINGLE_DF_ORACLE,
    "sim_distance_histogram": SIM_DIST_HIST_ORACLE,
    "tp_final_sample_weights": TP_FINAL_WEIGHTS_ORACLE,
    "dd_source_dedup_report": _dd_source_report_oracle,
    "sim_fisher_separability": SIM_FISHER_ORACLE,
    "ts_zipf_audit": TS_ZIPF_ORACLE,
    "tp_loss_masking": TP_LOSS_MASK_ORACLE,
    "sim_ndcg_eval": _ndcg_oracle,
    "ts_source_containment": TS_SRC_CONTAIN_ORACLE,
    "q_schema_drift": Q_SCHEMA_DRIFT_ORACLE,
    "tp_chat_lint": TP_CHAT_LINT_ORACLE,
    "dd_exact_substr": _dd_exact_substr_oracle,
    "dd_span_dedup_apply": _dd_span_apply_oracle,
    "dd_exact_dedup": DD_EXACT_ORACLE,
    "dd_ngram_jaccard": DD_NGRAM_ORACLE,
    "dd_containment": DD_CONTAIN_ORACLE,
    "dd_minhash_lsh": DD_MINHASH_ORACLE,
    "dd_simhash_values": _simhash_oracle(),
    "dd_simhash_pairs": _simhash_pairs_oracle(),
    "dd_embedding_neardup": DD_EMB_ORACLE,
    "sim_topk_cosine": SIM_TOPK_ORACLE,
    "sim_hard_negatives": SIM_HARDNEG_ORACLE,
    "sim_mips_topk": SIM_MIPS_ORACLE,
    "tp_label_balance": TP_BALANCE_ORACLE,
    "sim_lsh_topk": SIM_LSH_ORACLE,
    "sim_lsh_multiprobe": SIM_LSH_MP_ORACLE,
    "sim_ivf_topk": _ivf_oracle,
    "sim_pq_topk": _pq_oracle,
    "sim_random_projection": _rp_oracle,
    "sim_quantize_int8": SIM_QUANT_ORACLE,
    "ts_text_stats": TS_STATS_ORACLE,
    "ts_lang_id": _lang_oracle(),
    "tp_corpus_curation": _curation_oracle(),
    "mm_media_manifest": _mm_manifest_oracle(),
    "mm_byte_features": MM_BYTES_ORACLE,
    "mm_image_dims": MM_DIMS_ORACLE,
    "mm_pixel_stats": MM_PIXEL_ORACLE,
    "mm_jpeg_roundtrip": MM_JPEG_ORACLE,
    "mm_image_resize": MM_RESIZE_ORACLE,
    "mm_image_crop": MM_CROP_ORACLE,
    "mm_image_augment": MM_AUGMENT_ORACLE,
    "mm_frame_stats": MM_FRAME_ORACLE,
    "mm_video_motion": MM_MOTION_ORACLE,
    "mm_scene_cuts": MM_SCENE_CUTS_ORACLE,
    "mm_frame_dedup": _frame_dedup_oracle(),
    "mm_audio_resample": MM_RESAMPLE_ORACLE,
    "mm_mjpeg_frame_stats": MM_MJPEG_ORACLE,
    "src_wds_roundtrip": SRC_WDS_ORACLE,
    "src_jsonl_roundtrip": SRC_JSONL_ORACLE,
    "src_orc_roundtrip": SRC_ORC_ORACLE,
    "ts_heavy_hitters": TS_HH_ORACLE,
    "tp_incremental_dedup": TP_INCR_ORACLE,
    "tp_bloom_incremental_dedup": TP_INCR_ORACLE,
    "dd_incremental_minhash": _dd_incr_minhash_oracle(),
    "dd_incremental_clusters": DD_INCR_CLUSTERS_ORACLE.format(minhash_pairs=DD_MINHASH_ORACLE),
    "tp_ranker_auc": TP_AUC_ORACLE,
    "ts_ttr_diversity": TS_TTR_ORACLE,
    "ts_quality_classifier": _quality_clf_oracle(),
    "ts_heaps_law": TS_HEAPS_ORACLE,
    "sim_lsh_recall_audit": _lsh_recall_oracle(),
    "sim_index_drift": _index_drift_oracle,
    "tp_neyman_allocation": TP_NEYMAN_ORACLE,
    "dd_lsh_tuning_curve": _lsh_tuning_oracle(),
    "tp_sequence_packing": TP_PACK_ORACLE,
    "tp_training_mix": TP_MIX_ORACLE,
    "ts_pii_scrub": _pii_oracle(),
    "ts_tfidf_keywords": TS_TFIDF_ORACLE,
    "dd_dup_clusters": DD_CLUSTERS_ORACLE,
    "dd_line_dedup": DD_LINE_ORACLE,
    "tp_contamination": TP_CONTAM_ORACLE,
    "ts_quality_filters": _quality_filters_oracle(),
    "ts_repetition_filters": _repetition_oracle(),
    "ts_unicode_normalize": TS_UNICODE_ORACLE,
    "ts_html_extract": TS_HTML_ORACLE,
    "ts_url_parse": TS_URL_ORACLE,
    "sim_feature_hash": SIM_FH_ORACLE,
    "ts_countmin_sketch": _cm_oracle(),
    "tp_rag_pipeline": _rag_oracle(),
    "ts_ngram_lm": TS_LM_ORACLE,
    "tp_dataset_card": TP_CARD_ORACLE,
    "tp_curriculum_order": TP_CURRICULUM_ORACLE,
    "ts_source_similarity": TS_SRC_SIM_ORACLE,
    "tp_bpe_pair_counts": TP_BPE_ORACLE,
    "tp_token_ids": TP_TOKEN_IDS_ORACLE,
    "tp_doc_chunking": TP_CHUNK_ORACLE,
    "tp_source_caps": TP_SOURCE_CAPS_ORACLE,
    "mm_wav_meta": MM_WAV_ORACLE,
    "mm_audio_stats": MM_AUDIO_ORACLE,
    "mm_audio_spectral": MM_SPECTRAL_ORACLE,
    "mm_gif_roundtrip": MM_GIF_ORACLE,
    "mm_mp4_frame_stats": MM_MP4_FRAMES_ORACLE,
    "ts_lm_doc_score": TS_LM_SCORE_ORACLE,
    "tp_vocab_coverage": TP_VOCAB_COV_ORACLE,
    "tp_temperature_mix": TP_TEMP_MIX_ORACLE,
    "mm_phash_dedup": _phash_oracle,
    "tp_span_corruption": TP_SPAN_ORACLE,
    "tp_detokenize_roundtrip": TP_DETOK_ORACLE,
    "mm_silence_trim": MM_SILENCE_ORACLE,
    "dd_url_canonical": DD_URL_ORACLE,
    "tp_length_buckets": TP_LENBUCKET_ORACLE,
    "tp_train_val_split": TP_SPLIT_ORACLE,
    "ts_novel_ngrams": TS_NOVEL_ORACLE,
    "mm_patchify": _patchify_oracle,
    "mm_image_norm": MM_IMGNORM_ORACLE,
    "ts_c4_filters": TS_C4_ORACLE,
    "ts_char_gini": TS_GINI_ORACLE,
    "tp_tokenizer_fertility": TP_FERTILITY_ORACLE,
    "dd_prefix_clusters": DD_PREFIX_ORACLE,
    "sim_knn_accuracy": SIM_KNN_ORACLE,
    "tp_dsir_weights": TP_DSIR_ORACLE,
    "sim_label_centroids": SIM_CENTROID_ORACLE,
    "src_binary_ingest": _binary_oracle,
    "dd_cluster_keep_best": DD_KEEPBEST_ORACLE,
    "tp_mixture_epochs": TP_EPOCHS_ORACLE,
    "ts_lang_confusion": _lang_confusion_oracle,
    "sim_ivf_recall_audit": _ivf_recall_oracle,
    "sim_kmeans_inertia": _kmeans_inertia_oracle,
    "j16_point_in_time_join": J16_ORACLE,
    "tp_sft_format": TP_SFT_ORACLE,
    "mm_audio_vad_segments": MM_VAD_ORACLE,
    "sim_kcenter_diversity": _kcenter_oracle,
    "sim_pq_recall_audit": _pq_recall_oracle,
    "dd_semantic_dedup": DD_SEMANTIC_ORACLE,
    "tp_shard_shuffle": TP_SHARD_ORACLE,
    "ts_bigram_commonality": TS_BIGRAM_ORACLE,
    "mm_mp4_meta": MM_MP4_ORACLE,
}
