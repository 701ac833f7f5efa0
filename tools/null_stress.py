"""Null-bucket stress clone (round 13) — the join-key NULL density axis.

Production fact feeds carry NULL join keys (unmatched lookups, late
dimensions, tombstones); at scale the NULL bucket is routinely the
biggest "key" in the table. This tool writes a clone of a scale-factor
directory where ~20% of each fact table's join key is NULL (gated on a
deterministic md5 of a stable row identity, so both engines see the
identical multiset), then the standard check_oracle run compares Spark
and DuckDB ON THE SAME CLONE — green means every query's NULL-key
semantics (joins dropping the bucket, GROUP BY's NULL group, aggregate
NULL-skipping, window tie-breaks) agree cross-engine even when the
bucket is fat.

Usage:
  python tools/null_stress.py [src_sf_dir] [out_dir]
  ORACLE_TABLES_DIR=<out_dir> python tools/check_oracle.py <out_dir>
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

NULL_GATE = "substr(md5(CAST({ident} AS VARCHAR) || ':null'), 32, 1) IN ('0','1','2')"


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfnull001"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rewrites = {
        "lineitem": (
            "SELECT l_orderkey, "
            f"CASE WHEN {NULL_GATE.format(ident='l_orderkey * 7 + l_linenumber')} THEN NULL ELSE l_partkey END AS l_partkey, "
            f"CASE WHEN {NULL_GATE.format(ident='l_orderkey * 11 + l_linenumber')} THEN NULL ELSE l_suppkey END AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate "
            "FROM read_parquet('{src}/lineitem.parquet')"
        ),
        "orders": (
            "SELECT o_orderkey, "
            f"CASE WHEN {NULL_GATE.format(ident='o_orderkey')} THEN NULL ELSE o_custkey END AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            "FROM read_parquet('{src}/orders.parquet')"
        ),
    }
    for t in TABLES:
        q = rewrites.get(t, "SELECT * FROM read_parquet('{src}/" + t + ".parquet')")
        con.execute(
            f"COPY ({q.format(src=src)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 4096)"
        )
    for t, col in (("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
                   ("orders", "o_custkey")):
        n, k = con.execute(
            f"SELECT count(*), sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) "
            f"FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}.{col}: {k}/{n} NULL ({100.0*k/n:.1f}%)")
    print(f"clone at {out}")
    print(f"next: ORACLE_TABLES_DIR={out} python tools/check_oracle.py {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
