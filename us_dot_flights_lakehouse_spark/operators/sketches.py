"""Mergeable quantile sketch (KLL-style compactor hierarchy).

The 100 TB companion to the exact-percentile family (a11/a20/w21): a
fixed-size, single-pass, MERGEABLE summary of a value distribution.
Per-partition partial sketches are built executor-side (mapInPandas,
Arrow-batched), merged per group (applyInPandas), and any rollup window
— month, quarter, trailing-k, all-time — is then a union of KB-sized
blobs instead of a rescan of raw rows. That is the property Spark's
built-in ``percentile_approx`` (GK) cannot offer the catalog: its sketch
state never leaves the aggregate, so a NEW rollup window means a NEW
pass over the data. Here the monthly blobs persist and recombine, the
exact pattern a19_sketch_rollup demonstrates for HLL distinct counts,
now for quantiles.

Design (Karnin–Lall–Liberty compactor hierarchy, deterministic variant):

- Level ``l`` holds items of weight ``2**l`` in an unsorted buffer of
  capacity ``k``. Inserts land in level 0; a full level is sorted and
  every other item is promoted to level ``l+1`` (weight doubles), with
  the survivor parity alternating per level so adjacent compactions
  cancel rather than drift.
- Every compaction at level ``l`` adds AT MOST ``2**l`` to the rank
  error of any query point (keeping alternate items of a sorted buffer
  moves any prefix-weight by at most one item-weight), independent of
  buffer size. The sketch tracks this sum EXACTLY in ``err`` — a hard
  worst-case bound, not a probabilistic one, so downstream queries can
  assert ``|true_rank(estimate) - target| <= err`` as an invariant and
  an oracle can pin the assertion to literal TRUE.
- ``merge`` is levelwise concatenation + re-compaction; ``n`` and
  ``err`` add. Uniform level capacity keeps the structure trivially
  JSON-serializable (arrays of ints) at ~``k * log2(n/k)`` items — for
  k=200 and n=10^12 about 6.6K ints per blob, a few KB.
- Error growth: with UNIFORM level capacities this is the MRL shape,
  not true KLL — worst-case ``err`` grows as ~``(n/k)·log2(n/k)``
  absolute rank error (≈16% relative at k=200, n=10^12), versus true
  KLL's O(n/k) from geometrically decaying capacities. The tracked
  ``err`` keeps the contract honest regardless (queries assert against
  the ACTUAL bound, never the asymptotic one), but for large-n
  deployments scale ``k`` with ``log2(n)`` — k ≈ 200·log2(n/10^6)
  holds relative rank error near the k=200/n=10^6 level — or adopt
  geometrically decreasing level capacities.

Determinism: no randomness anywhere (the classic KLL flips a coin per
compaction; we alternate parity instead). The tracked ``err`` bound is
what the catalog's correctness contract keys on, so the estimate's
run-to-run stability is a convenience, not a requirement.

Reference parity: the reference engine has no quantile-sketch operator;
this extends its profiling/expectations tier (gold_expectations.py's
range checks) with the mergeable-summary pattern its Delta tables would
need at lakehouse scale.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

K_DEFAULT = 200


def kll_new(k: int = K_DEFAULT) -> dict:
    return {"k": k, "levels": [[]], "parity": [0], "err": 0, "n": 0}


def _compact(sk: dict, level: int) -> None:
    """Sort level, promote alternate items to level+1, leave odd item."""
    levels, parity = sk["levels"], sk["parity"]
    buf = sorted(levels[level])
    leftover = []
    if len(buf) % 2 == 1:
        leftover = [buf.pop()]  # keep the max behind; introduces no error
    start = parity[level]
    parity[level] ^= 1
    promoted = buf[start::2]
    # Worst-case rank-shift of this compaction for ANY query point is one
    # item-weight at this level — tracked exactly, summed over the sketch's
    # lifetime (module docstring; asserted in tests/test_sketches.py).
    sk["err"] += 1 << level
    levels[level] = leftover
    if level + 1 == len(levels):
        levels.append([])
        parity.append(0)
    levels[level + 1].extend(promoted)


def _compress(sk: dict) -> None:
    level = 0
    while level < len(sk["levels"]):
        while len(sk["levels"][level]) > sk["k"]:
            _compact(sk, level)
        level += 1


def kll_extend(sk: dict, values: list[int]) -> None:
    """Bulk insert (values must be plain ints, e.g. ndarray.tolist())."""
    sk["levels"][0].extend(values)
    sk["n"] += len(values)
    _compress(sk)


def kll_merge(a: dict, b: dict) -> dict:
    """Merge b into a (in place) and return a. err and n are additive."""
    while len(a["levels"]) < len(b["levels"]):
        a["levels"].append([])
        a["parity"].append(0)
    for level, buf in enumerate(b["levels"]):
        a["levels"][level].extend(buf)
    a["err"] += b["err"]
    a["n"] += b["n"]
    _compress(a)
    return a


def kll_query(sk: dict, target_rank: int) -> int:
    """Smallest stored value whose weighted rank reaches target_rank.

    Guarantee (tests/test_sketches.py): the returned value v satisfies
    ``count(x < v) <= target_rank - 1 + err`` and
    ``count(x <= v) >= target_rank - err`` over the true multiset.
    """
    items: list[tuple[int, int]] = []
    for level, buf in enumerate(sk["levels"]):
        w = 1 << level
        items.extend((v, w) for v in buf)
    items.sort()
    cum = 0
    for v, w in items:
        cum += w
        if cum >= target_rank:
            return v
    return items[-1][0]


def kll_dumps(sk: dict) -> str:
    return json.dumps(sk, separators=(",", ":"))


def kll_loads(payload: str) -> dict:
    return json.loads(payload)


# ---------------------------------------------------------------------------
# Spark wiring: Arrow-batched partials + grouped merge
# ---------------------------------------------------------------------------

#: applyInPandas/mapInPandas output schema fragments share these names.
PARTIAL_FIELDS = "payload string, err long, n_rows long"


def make_partial_builder(key_col: str, value_col: str, k: int = K_DEFAULT):
    """mapInPandas fn: one partial sketch per (task, key).

    Accumulates ACROSS Arrow batches within the task so a 10^9-row
    partition still emits one ~KB row per key it saw — the map-side
    combine shape; the per-key shuffle moves sketches, never rows.
    """
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        sketches: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby(key_col, sort=False):
                sk = sketches.setdefault(key, kll_new(k))
                kll_extend(sk, grp[value_col].to_numpy().tolist())
        rows = [
            {
                key_col: key,
                "payload": kll_dumps(sk),
                "err": sk["err"],
                "n_rows": sk["n"],
            }
            for key, sk in sketches.items()
        ]
        yield pd.DataFrame(
            rows, columns=[key_col, "payload", "err", "n_rows"]
        )

    return build


def make_sketch_merger(key_col: str, probs: list[tuple[str, int, int]]):
    """applyInPandas fn: merge a group's partial sketches, estimate quantiles.

    probs: (name, num, den) per quantile; target rank = ceil(num*n/den),
    computed in exact integer arithmetic. Output adds est_<name> and
    t_<name> columns next to the merged payload/err/n_rows.
    """
    import pandas as pd

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = None
        for payload in pdf["payload"]:
            part = kll_loads(payload)
            sk = part if sk is None else kll_merge(sk, part)
        n = sk["n"]
        row = {
            key_col: pdf[key_col].iloc[0],
            "payload": kll_dumps(sk),
            "err": sk["err"],
            "n_rows": n,
        }
        for name, num, den in probs:
            t = -(-num * n // den)  # ceil without floats
            row[f"est_{name}"] = kll_query(sk, t)
            row[f"t_{name}"] = t
        return pd.DataFrame([row])

    return merge
