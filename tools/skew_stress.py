"""Key-skew stress gate (standing since round 13; VERDICT r12 item 4).

The invariance-sweep family (conf / row-order / column-order / input-split)
covers determinism axes; this gate covers the remaining production axis —
KEY SKEW. It writes a hot-key clone of a scale-factor directory where one
key per join dimension absorbs ~30% of the fact rows (the zipf-head shape
of a real feed: one mega-customer, one dominant supplier/part pair, one
bot user), then:

  clone   — build the clone at /tmp/sfskew001 (deterministic hash gate, so
            both engines see the identical multiset).
  sweep   — print the command for the full-catalog value sweep: Spark
            AND DuckDB both read the clone, so every hash mismatch is an
            engine-behavior-under-skew bug, not a data difference.
  balance — execute the skew-sensitive join paths on the clone and assert
            per-partition row counts stay bounded (max <= 10x median,
            small-count floor): the salted join must spread the hot key
            across salts; the advisor-forced shuffled join must stay
            bounded via AQE's skew-split. Partition row counts are the
            deterministic observable of straggler work (task wall-times
            are machine noise; the rows ARE the work a task is handed).

Usage:
  python tools/skew_stress.py clone [sf_dir] [out_dir]
  python tools/skew_stress.py balance [out_dir]
  then: ORACLE_TABLES_DIR=<out_dir> python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

#: fraction of fact rows redirected onto the hot key (md5 last hex digit
#: in {0..4} -> 5/16 + the key's own natural share ≈ 30-32%)
HOT_GATE = "substr(md5(CAST({col} AS VARCHAR) || ':skew'), 32, 1) IN ('0','1','2','3','4')"


def clone(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # hot keys are existing minimum keys, so referential integrity holds
    rewrites = {
        "lineitem": (
            "SELECT l_orderkey, "
            f"CASE WHEN {HOT_GATE.format(col='l_orderkey * 7 + l_linenumber')} THEN 0 ELSE l_partkey END AS l_partkey, "
            f"CASE WHEN {HOT_GATE.format(col='l_orderkey * 7 + l_linenumber')} THEN 0 ELSE l_suppkey END AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate "
            "FROM read_parquet('{src}/lineitem.parquet')"
        ),
        "orders": (
            "SELECT o_orderkey, "
            f"CASE WHEN {HOT_GATE.format(col='o_orderkey')} THEN 0 ELSE o_custkey END AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            "FROM read_parquet('{src}/orders.parquet')"
        ),
        "events": (
            "SELECT event_id, ts, "
            f"CASE WHEN {HOT_GATE.format(col='event_id')} THEN 10000 ELSE user_id END AS user_id, "
            "event_type, value, props "
            "FROM read_parquet('{src}/events.parquet')"
        ),
    }
    for t in TABLES:
        q = rewrites.get(t, "SELECT * FROM read_parquet('{src}/" + t + ".parquet')")
        # small row groups: a single-row-group file is read by exactly ONE
        # scan task no matter how many byte-range splits Spark plans, so
        # every shuffle partition's bytes come from one mapper — and AQE's
        # skew split (which subdivides a reducer partition by MAPPER
        # blocks) is structurally impossible. Found by this gate's first
        # runs; production multi-file/multi-row-group tables don't have
        # this degeneracy, so the clone shouldn't either.
        con.execute(
            f"COPY ({q.format(src=src)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 4096)"
        )
    for t, col, hot in (("lineitem", "l_suppkey", 0), ("orders", "o_custkey", 0),
                        ("events", "user_id", 10000)):
        n, h = con.execute(
            f"SELECT count(*), sum(CASE WHEN {col} = {hot} THEN 1 ELSE 0 END) "
            f"FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: hot {col}={hot} holds {h}/{n} rows ({100.0*h/n:.1f}%)")
    print(f"clone at {out}")


def partition_balance(df, payload: tuple[str, ...] = ()) -> tuple[int, float, int]:
    """(max, median, n) of non-empty output-partition row counts.

    ``payload`` columns are carried through as max() aggregates so column
    pruning cannot strip the join shuffle down to bare keys: a hot
    partition of thousands of IDENTICAL key values LZ4-compresses to
    almost nothing in the map statuses, hiding the byte skew AQE's
    detection reads (found by this gate's first runs)."""
    import statistics

    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("c")] + [
        F.max(c).alias(f"__p{i}") for i, c in enumerate(payload)
    ]
    counts = [
        r["c"]
        for r in df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(*aggs)
        .collect()
    ]
    return max(counts), statistics.median(counts), len(counts)


def balance(out: str) -> int:
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from us_dot_flights_lakehouse_spark.operators.joins import (
        advised_join,
        salted_join,
    )
    from us_dot_flights_lakehouse_spark.session import get_spark
    from us_dot_flights_lakehouse_spark.sources.readers import read_table

    spark = get_spark("skew_stress")
    failures = 0
    # AQE's small-partition coalescing would merge the sf0.01-sized join
    # outputs into one partition and hide the join-stage task layout —
    # the thing this gate measures. At 100 TB the partitions would be
    # far above the coalesce target, so disabling it for the measurement
    # reproduces the at-scale layout. AQE skew-split stays ON (it is one
    # of the two mitigations under test). maxPartitionBytes scales down
    # with the data so scans produce multiple map tasks — a reducer
    # partition fed by ONE mapper cannot be skew-split at any scale.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64KB")

    def check(tag: str, df, payload=(), floor: int = 2000):
        nonlocal failures
        mx, med, n = partition_balance(df, payload)
        # floor: with tiny partitions a 10x ratio is noise, not a straggler
        ok = mx <= max(10 * med, floor) and n > 1
        print(f"{tag}: partitions={n} max={mx} median={med} "
              f"ratio={mx / max(med, 1):.1f} -> {'OK' if ok else 'STRAGGLER'}")
        failures += 0 if ok else 1

    li = read_table(spark, out, "lineitem")
    supp = read_table(spark, out, "supplier")
    orders = read_table(spark, out, "orders")
    cust = read_table(spark, out, "customer")

    # 1. salted join: the hot supplier's rows must spread across salts.
    #    Broadcast is disabled for the measurement — salting's premise is
    #    a replicated side OVER the broadcast threshold (salted_join's
    #    docstring); at sf0.01 Catalyst would otherwise broadcast the dim
    #    and there'd be no shuffle to balance at all (found by this
    #    gate's first run: the "join" measured a single-file scan).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    check("salted_join(lineitem x supplier, hot l_suppkey)",
          salted_join(li, supp, "l_suppkey", "s_suppkey", n_salts=16),
          payload=("l_extendedprice",))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # 2. advisor-forced shuffled join on the hot customer edge: AQE's
    #    skew split must keep the per-task work bounded. The byte
    #    thresholds scale down with the data (defaults: 256MB threshold,
    #    64MB advisory — the sf0.01 hot partition is ~250KB, so at
    #    defaults AQE would simply never fire at test scale; at 100 TB
    #    the same ~30% hot partition is ~30 TB and trips the defaults);
    #    the factor-5 skew test is left at its default.
    adv = {"strategy": "shuffle", "recommended_partitions": 32}
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    check("advised_join(orders x customer, hot o_custkey, AQE skew)",
          advised_join(orders, cust, ["o_custkey"], ["c_custkey"], adv),
          payload=("o_totalprice", "c_name"))
    # the same mitigation on the 4x-bigger lineitem edge
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    check("merge join(lineitem x supplier, hot l_suppkey, AQE skew)",
          li.join(supp.hint("merge"), li["l_suppkey"] == supp["s_suppkey"]),
          payload=("l_extendedprice",))
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    # 3. the BASELINE comparison: the same hot join WITHOUT mitigation,
    #    pinned to hash partitioning with AQE skew-join disabled — this
    #    SHOULD straggle (one partition ~30% of rows); a balanced result
    #    here would mean the gate isn't measuring anything.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    mx, med, n = partition_balance(
        orders.repartition(32, F.col("o_custkey")).join(
            cust.hint("merge"), orders["o_custkey"] == cust["c_custkey"]
        )
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(f"unmitigated hot join (control): max={mx} median={med} "
          f"ratio={mx / max(med, 1):.1f} (expected to straggle)")
    if mx <= 10 * med:
        print("WARN: control did not straggle — gate sensitivity suspect")
        failures += 1
    spark.stop()
    print("balance gate:", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "clone"
    if cmd == "clone":
        src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfskew001"
        clone(src, out)
        print(f"next: ORACLE_TABLES_DIR={out} python tools/check_oracle.py {out}")
        return 0
    if cmd == "balance":
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfskew001"
        return balance(out)
    print(f"unknown subcommand {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
