"""Driver-attestation staleness report for the _PRIORITY rotation.

The driver's correctness harness samples only the head-50 of the catalog,
so after many rounds most entries' most recent DRIVER-side green row goes
stale (they stay covered by the local 306/306 sweeps, but the driver
artifact is the hard signal). This tool computes, per catalog entry, the
most recent round with a green CORRECTNESS_r*.json row and prints the
staleness-sorted rotation: new/changed queries belong at the very front
(hand-placed), then the stalest entries fill the remaining head-50 slots
(VERDICT r12 item 1; plan recorded in COVERAGE.md).

Usage: python tools/rotation_plan.py [N]   (default N=50)
"""

from __future__ import annotations

import glob
import json
import sys


def last_driver_rounds() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and (v.get("hash_match") or v.get("rows_match")):
                last[k] = max(last.get(k, 0), rnd)
    return last


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sys.path.insert(0, ".")
    from us_dot_flights_lakehouse_spark import queries as reg

    last = last_driver_rounds()
    names = list(reg.queries())
    stale = sorted(names, key=lambda q: (last.get(q, 0), q))
    print(f"# catalog={len(names)}; {n} stalest driver attestations:")
    for q in stale[:n]:
        print(f"r{last.get(q, 0):02d}  {q}")
    head = names[:n]
    refreshed = sum(1 for q in head if q in stale[:n])
    print(f"# current head-{n} overlap with the {n} stalest: {refreshed}/{n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
