"""Per-query WARM plan-construction sweep (guide §7.3: planning time as
the bottleneck, in Python form — the r13 discovery that driver-side
plan building was ~40% of the bench).

Construction time = wall-clock of calling the query builder
``fn(spark, sf_dir)`` WITHOUT forcing the plan. For most queries that is
Py4J expression building + per-op analysis; for the handful of eager
builders (advisor checkpoints, driver-histogram collects, streaming
processAllAvailable) it includes their eager work — which the bench pays
per rep, so it is exactly the number to minimize.

Two passes: pass 1 warms every memo/cache (parquet schema memo, parsed
expression caches, JVM); pass 2 is the measurement. Prints one JSON line
per query plus a total, and writes $CONSTR_OUT (default
/tmp/construction_sweep.json) sorted by descending cost.

Usage: python tools/construction_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import gc
import json
import os
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
    spark = get_spark(
        "constr", extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    names = args or list(qs)
    unknown = [q for q in names if q not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    # pass 1: warm (builds every plan once; discard)
    for name in names:
        try:
            qs[name](spark, sf_dir)
        except Exception:
            pass
        spark.catalog.clearCache()
    gc.collect()

    # pass 2: measure
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir)
            out[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:
            out[name] = -1.0
            print(json.dumps({"q": name, "err": str(exc)[:200]}), flush=True)
        spark.catalog.clearCache()
        gc.collect()
        print(json.dumps({"q": name, "constr_s": out[name]}), flush=True)

    total = round(sum(v for v in out.values() if v > 0), 3)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    path = os.environ.get("CONSTR_OUT", "/tmp/construction_sweep.json")
    with open(path, "w") as fh:
        json.dump({"total_s": total, "sf_dir": sf_dir, "queries": ranked}, fh, indent=1)
    print(json.dumps({"construction_total_s": total, "n": len(out), "out": path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
