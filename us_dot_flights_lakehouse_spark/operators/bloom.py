"""Bloom-filter runtime join pruning — the engine-level "runtime filter"
technique (Spark's own runtime bloom filters, Trino's dynamic filtering)
made explicit and composable.

Use case: a huge probe side must be checked against a huge build side
(incremental dedup: today's batch vs billions of published fingerprints).
A shuffle join moves BOTH sides; but membership is mostly negative, and a
Bloom filter answers "definitely not present" from a compact bitmap. Rows
that fail the probe skip the shuffle entirely; only the "maybe" rows (true
members + the false-positive sliver) pay the exact join, which also makes
the final answer exact — the filter is semantics-preserving by
construction.

Hashing runs JVM-side (``xxhash64``, two seeds, Kirsch-Mitzenmacher
double hashing h1 + i*h2); hashes are masked to 31 bits so position
arithmetic never overflows a long even with ANSI mode on.

Two probe paths:
- ``might_contain``: the bitmap inlined as an array<long> literal —
  whole-stage-codegen, zero Python. Right up to ~2^22 bits (64K literal
  words); beyond that Catalyst tree size starts to matter.
- ``might_contain_broadcast``: positions still computed JVM-side into an
  array column; a broadcast numpy bitmap + Arrow-batched pandas UDF does
  the bit tests. Right for production-sized filters (2^30+ bits = 128 MB+)
  that have no business in a query plan.

Sizing: false-positive rate ≈ (1 - e^(-k*n/m))^k; for k=5 the sweet spot
is m ≈ 10*n bits (fpr ≈ 0.9%). The build does one hash aggregate over the
build side and collects m/8 bytes to the driver — bounded by construction,
the same contract as any sketch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16
BLOOM_K = 5
#: largest bitmap the literal-expression probe path should carry
#: (64K array-literal words); beyond this use might_contain_broadcast
BLOOM_MAX_LITERAL_BITS = 1 << 22


def auto_m_bits(n_values: int) -> int:
    """Bitmap size for an expected build-side cardinality: next power of
    two ≥ 10·n (k=5 sweet spot, fpr ≈ 0.9%), floored at BLOOM_M_BITS —
    a FIXED default beyond ~13k distinct values saturates toward
    fpr ≈ 1 and the prefilter silently stops pruning (ADVICE r4).
    UNCAPPED (ADVICE r5): past BLOOM_MAX_LITERAL_BITS the caller must
    route the probe through ``might_contain_broadcast`` (the numpy
    bitmap path) instead of the literal-expression ``might_contain`` —
    ``incremental_dedup_verdict_bloom`` does this automatically."""
    target = max(1, 10 * n_values)
    exp = max(BLOOM_M_BITS.bit_length() - 1, (target - 1).bit_length())
    return 1 << exp

_SEED2 = 0x9E3779B9  # second xxhash64 stream for double hashing


def _bit_mask(bit: Column) -> Column:
    """1L << bit with a *Column* shift amount (the pyspark ``shiftleft``
    wrapper only takes a python int; the SQL expression takes columns)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit)


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a value: (h1 + i*h2) mod m, both hashes masked
    to 31 bits (i*h2 stays < 2^34 — no long overflow, ANSI-safe)."""
    h1 = F.pmod(F.xxhash64(col), F.lit(1 << 31))
    h2 = F.pmod(F.xxhash64(col, F.lit(_SEED2)), F.lit(1 << 31))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def build_bloom(
    df: DataFrame, col_name: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> list[int]:
    """Aggregate the column's Bloom bitmap: explode k positions per value,
    OR the per-word masks (one hash aggregate, map-side combined), collect
    the m/64 longs. Returns the bitmap as a python list (signed int64
    words, matching Spark's long semantics)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(col_name), m_bits, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.floor(F.col("pos") / 64).cast("int").alias("word"),
            _bit_mask(F.pmod(F.col("pos"), 64).cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["mask"]
    return bitmap


def might_contain(col: Column, bitmap: list[int], k: int = BLOOM_K) -> Column:
    """Expression-only probe against a literal bitmap: forall over the k
    positions — the bitmap literal appears ONCE in the lambda body (k
    unrolled tests would copy the m/64-long array literal k times into
    the Catalyst tree, and plan size, not row work, dominates probe cost
    for large m). False → definitely not a member."""
    m_bits = len(bitmap) * 64
    # ONE parsed expression for the bitmap literal — F.lit(list) issues a
    # Py4J call per element (measured 8.8 s of pure driver time for a
    # 2^16-bit filter); a single SQL array literal parses in milliseconds
    lit_arr = F.expr("array(" + ",".join(f"{w}L" for w in bitmap) + ")")
    pos = F.array(*_positions(col, m_bits, k))
    return F.forall(
        pos,
        lambda p: F.element_at(lit_arr, F.floor(p / 64).cast("int") + 1).bitwiseAND(
            _bit_mask(F.pmod(p, 64).cast("int"))
        )
        != 0,
    )


def might_contain_broadcast(
    df: DataFrame,
    col: Column,
    bitmap: list[int],
    k: int = BLOOM_K,
    out_col: str = "_bloom_maybe",
) -> DataFrame:
    """Probe path for production-sized bitmaps: positions are computed
    JVM-side into an array column (same double-hash expressions as the
    build — the python side never re-hashes), then a broadcast numpy
    bitmap + Arrow-batched pandas UDF does the word/bit lookups."""
    m_bits = len(bitmap) * 64
    bc = df.sparkSession.sparkContext.broadcast(
        np.array(bitmap, dtype=np.int64).view(np.uint64)
    )

    @F.pandas_udf("boolean")
    def probe(pos: pd.Series) -> pd.Series:
        bm = bc.value
        out = np.ones(len(pos), dtype=bool)
        arr = np.stack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        for i in range(arr.shape[1]):
            p = arr[:, i]
            bits = (p & 63).astype(np.uint64)
            out &= ((bm[p >> 6] >> bits) & np.uint64(1)) != 0
        return pd.Series(out)

    return df.withColumn(
        out_col, probe(F.array(*_positions(col, m_bits, k)))
    )
