"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <suffix> <sf_dir> query [query ...]
Env: PLANS_ROUND (default r14) picks the output subdirectory.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_dot_flights_lakehouse_spark import queries as registry
from us_dot_flights_lakehouse_spark.session import get_spark


def main() -> int:
    suffix, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    spark = get_spark(
        "dump_plans", extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({text.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
