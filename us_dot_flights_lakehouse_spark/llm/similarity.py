"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact baseline. Query set broadcasts against
  the corpus; per-row dot products run scan-local in whole-stage codegen,
  the only shuffle is the top-k window keyed by query id.
- ``lsh_cosine_topk``: random-hyperplane LSH scale path. Corpus vectors
  bucket by sign-bit signature; queries probe only their own bucket, so
  the candidate set (and the distance math) shrinks by ~2^n_planes. At
  100 TB this is the difference between a full-corpus scan per query and
  a bucket lookup; recall is tunable via n_planes / multi-probe.

Hyperplanes are derived deterministically from md5 (functions/text.hash28
contract) so runs — and the SQL oracle, if one is wired — reproduce
exactly without shipping a side file of random floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from us_dot_flights_lakehouse_spark.functions.text import hash28
from us_dot_flights_lakehouse_spark.functions.vectors import norm, to_double_array

#: number of signed hyperplane projections = bits in the LSH bucket key
LSH_PLANES = 8


def _prep(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"), to_double_array(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).
    Returns (query_id, rank, neighbor_id) — rank deterministic via
    (cosine desc, neighbor id asc)."""
    corpus = _prep(emb, id_col, vec_col)
    qs = _prep(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    scored = F.broadcast(qs).crossJoin(corpus).filter(F.col("qid") != F.col("id"))
    scored = scored.select(
        "qid",
        "id",
        (_dot("qv", "v") / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("id").alias("neighbor_id"),
        )
    )


def _plane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane j over `dim` dims, components
    in [-1, 1), derived from the shared md5 hash contract."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane{j}_{d}".encode()).hexdigest()[:7], 16)
        out.append(((h % 2001) - 1000) / 1000.0)
    return out


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = LSH_PLANES, first_plane: int = 0
) -> Column:
    """Sign-bit bucket id of a double-array column under the deterministic
    hyperplane family (expression-only: literal plane arrays + zip_with).
    ``first_plane`` selects a disjoint slice of the family so callers can
    build multiple independent hash tables (multi-table LSH: table t uses
    planes [t*n_planes, (t+1)*n_planes))."""
    bucket = F.lit(0)
    for j in range(first_plane, first_plane + n_planes):
        plane = F.array(*[F.lit(w) for w in _plane(j, dim)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2 ** (j - first_plane))).otherwise(
            F.lit(0)
        )
    return bucket


def ivf_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into ``nlist`` cells; each query probes only its
    ``nprobe`` nearest cells, then ranks exact cosine inside them.

    Scale path: the corpus is scanned ONCE to assign cells (training runs
    on the corpus via MLlib k-means — at 100 TB, fit on a sample); the
    per-query candidate set shrinks ~nlist/nprobe-fold, and the probe join
    is an equi-join on cell id (shuffle keyed by a small int). Recall
    degrades gracefully via nprobe, unlike single-bucket LSH probing.
    Returns (query_id, rank, neighbor_id, cell_id)."""
    import numpy as np

    corpus = _prep(emb, id_col, vec_col)

    # Train the coarse quantizer on a bounded, deterministically-ordered
    # sample DRIVER-SIDE (numpy Lloyd's): a quantizer only needs rough
    # cells, and at 100 TB you fit on a sample regardless — while an
    # MLlib fit launches maxIter+ full Spark jobs whose fixed overhead
    # dominates (this was the slowest query in the catalog before the
    # switch). FAISS trains its IVF lists the same way.
    train = np.array(
        corpus.orderBy("id").limit(10_000).select("v").toPandas()["v"].tolist()
    )
    rng = np.random.default_rng(seed)
    cents = train[rng.choice(len(train), size=nlist, replace=False)]
    for _ in range(8):
        d2 = ((train[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for c in range(nlist):
            m = labels == c
            if m.any():
                cents[c] = train[m].mean(axis=0)

    # cell assignment: Arrow-batched numpy argmin (one narrow scan, no
    # shuffle, centroids ride the closure — no 16x row expansion)
    cents_list = cents.tolist()

    def assign(pdf):
        C = np.array(cents_list)
        V = np.array(pdf["v"].tolist())
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        pdf["cell_id"] = d2.argmin(axis=1).astype("int32")
        return pdf

    cells = corpus.mapInPandas(
        lambda it: (assign(pdf) for pdf in it),
        schema="id bigint, v array<double>, nrm double, cell_id int",
    )

    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents_list)],
        "cell_id int, centroid array<double>",
    )
    qs = _prep(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    # rank cells per query by centroid cosine, keep the nprobe nearest
    qc = (
        qs.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cent_cos",
            _dot("qv", "centroid") / (F.col("qnrm") * norm(F.col("centroid"))),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cent_cos"), F.asc("cell_id"))
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("qid", "qv", "qnrm", "cell_id")
    )
    cand = F.broadcast(qc).join(cells, "cell_id").filter(F.col("qid") != F.col("id"))
    scored = cand.select(
        "qid",
        "id",
        "cell_id",
        (_dot("qv", "v") / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("id").alias("neighbor_id"),
            "cell_id",
        )
    )


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within candidates. Returns
    (query_id, rank, neighbor_id, bucket)."""
    corpus = _prep(emb, id_col, vec_col).withColumn(
        "bucket", lsh_bucket(F.col("v"), dim, n_planes)
    )
    qs = (
        _prep(queries, id_col, vec_col)
        .withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
        .select(
            F.col("id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            "bucket",
        )
    )
    cand = F.broadcast(qs).join(corpus, "bucket").filter(F.col("qid") != F.col("id"))
    scored = cand.select(
        "qid",
        "id",
        "bucket",
        (_dot("qv", "v") / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("id").alias("neighbor_id"),
            "bucket",
        )
    )
