"""Driver-environment simulation: run every catalog query under a BARE
SparkSession (none of the engine factory's confs) and flag anything the
driver's harness would trip on.

Round-1 lesson: 4 queries passed under the engine session but crashed
under the driver's own session because ``read_table`` silently depended
on a factory-set conf. This tool catches that whole defect class:

- builds a session with ONLY master + shuffle partitions (no AQE/Arrow/
  ANSI/timezone/nanosAsLong overrides — whatever Spark defaults to),
- materializes every query at sf0.001,
- flags output columns whose type the driver's pandas canonicalizer
  cannot hash (array/map/struct — 'unhashable type: list' in round 1)
  or compare reliably (binary).

Usage: python tools/check_bare_session.py [sf_dir]
Exit 1 on any failure or flagged column.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UNHASHABLE_PREFIXES = ("array<", "map<", "struct<")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("bare-session-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    failures: list[str] = []
    only = set(sys.argv[2:])
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            for col, dtype in df.dtypes:
                if dtype.startswith(UNHASHABLE_PREFIXES) or dtype == "binary":
                    failures.append(f"{name}: column {col!r} has harness-hostile type {dtype}")
            # Force EVERY output column end-to-end (noop sink, like
            # bench.py). Round-6 lesson: ``df.count()`` lets Catalyst
            # prune all columns, so a31's ANSI DIVIDE_BY_ZERO in a
            # projected column sailed through the very tool built to
            # catch driver-session divergence (VERDICT r6 §wrong #2).
            df.write.format("noop").mode("overwrite").save()
            n = df.count()
            print(f"OK    {name}: {n} rows", flush=True)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
            print(f"FAIL  {name}", flush=True)

    if failures:
        print(f"\n{len(failures)} bare-session problems:")
        for f in failures:
            print(f"  {f}")
    else:
        print("\nbare-session check clean: every query runs under Spark defaults")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
