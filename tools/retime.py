"""Isolated re-timing for bench outliers (the adjudication protocol,
BASELINE.md): time the named queries alone — warmup pass, then
median-of-N reps with clearCache + GC between reps — on an otherwise
quiet box. This is the measurement the ≤1.5x-of-anchor noise test is
defined against; in-bench readings inflate late-catalog queries via
Python-worker rotation (BASELINE.md, round-7 protocol note).

Usage: python tools/retime.py [sf_dir] query [query ...]
Env:   RETIME_REPS (default 5)
Prints one JSON line per query: {"q": name, "median_s": x, "runs": [...]}.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_dot_flights_lakehouse_spark import queries as registry
from us_dot_flights_lakehouse_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    if not args:
        sys.exit("usage: retime.py [sf_dir] query [query ...]")
    reps = int(os.environ.get("RETIME_REPS", "5"))
    spark = get_spark(
        "retime", extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    unknown = [q for q in args if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in args:
        fn = qs[name]
        # warmup: JVM, codegen, parquet footers, Python workers
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {"q": name, "median_s": statistics.median(runs), "runs": runs}
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
