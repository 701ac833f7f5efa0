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
    if not items:
        raise ValueError("kll_query on an empty sketch (n == 0)")
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
# Mergeable frequency sketch (Misra–Gries / SpaceSaving family)
# ---------------------------------------------------------------------------
#
# The frequency counterpart of the KLL section above and the mergeable
# answer ts_countmin_sketch cannot give (its CM estimates never leave the
# query as a recombinable blob): at most ``cap`` counters per sketch, a
# deterministic merge, and TWO hard invariants tracked exactly in ``d``:
#
#   (1) per item:   c(x) - d  <=  est(x)  <=  c(x)
#       (est(x) = counter value, 0 if absent — so any item with true
#       count > d is GUARANTEED to be among the counters), and
#   (2) globally:   d * (cap + 1)  <=  n
#       (each stream decrement retires cap+1 units of weight; each merge
#       reduction by the (cap+1)-th largest value m retires >= (cap+1)*m
#       — the Agarwal et al. "Mergeable Summaries" argument), so the
#       bound survives ANY merge tree, i.e. any partitioning.
#
# Both invariants are asserted in-plan by a39_mg_topk_sketch and pinned
# TRUE in its oracle, making the sketch self-verifying on every run, the
# same contract shape as the KLL queries. Deterministic throughout: ties
# in the reduction threshold are resolved by value, not arrival order.


def mg_new(cap: int) -> dict:
    return {"cap": cap, "counters": {}, "d": 0, "n": 0}


def _mg_reduce(sk: dict) -> None:
    """If over capacity: subtract the (cap+1)-th largest counter value
    from every counter and drop the non-positive ones. Weight retired is
    >= (cap+1)*m, which is what keeps invariant (2) true under merge."""
    counters = sk["counters"]
    if len(counters) <= sk["cap"]:
        return
    m = sorted(counters.values(), reverse=True)[sk["cap"]]
    sk["counters"] = {x: c - m for x, c in counters.items() if c > m}
    sk["d"] += m


def mg_update(sk: dict, counts: dict) -> None:
    """Fold EXACT item counts (e.g. one Arrow batch's value_counts) into
    the sketch via the merge rule — equivalent guarantee to one-at-a-time
    Misra-Gries, vectorized-friendly. Keys must be strings (JSON-stable),
    counts positive ints."""
    counters = sk["counters"]
    for x, c in counts.items():
        c = int(c)
        counters[x] = counters.get(x, 0) + c
        sk["n"] += c
    _mg_reduce(sk)


def mg_merge(a: dict, b: dict) -> dict:
    """Merge b into a (in place) and return a. d and n are additive on
    top of any reduction the combined counter set forces."""
    for x, c in b["counters"].items():
        a["counters"][x] = a["counters"].get(x, 0) + c
    a["d"] += b["d"]
    a["n"] += b["n"]
    _mg_reduce(a)
    return a


def mg_dumps(sk: dict) -> str:
    """Counters only — a plain JSON object, so Spark's
    from_json(..., 'map<string,bigint>') can probe it JVM-side; d and n
    travel as first-class LONG columns next to the payload."""
    return json.dumps(sk["counters"], separators=(",", ":"), sort_keys=True)


def mg_loads(counters_json: str, d: int, n: int, cap: int) -> dict:
    """cap is required and must match the builder's (see make_mg_merger).

    A cap mismatch cannot be fully detected from a blob (the payload is a
    plain counters map so from_json can probe it JVM-side, so the builder
    cap does not travel with it), but the dangerous direction — a merger
    built with a SMALLER cap than the builder, which would over-reduce and
    inflate ``d`` past the cap-keyed invariant (2) — is loudly rejected
    here: a valid cap-C blob never carries more than C counters (ADVICE
    r10). The other direction (merger cap larger than builder's) weakens
    invariant (2)'s assertable form, which the catalog queries pin TRUE in
    their oracles, so it surfaces as an oracle mismatch rather than a
    silent weakening."""
    counters = json.loads(counters_json)
    if len(counters) > cap:
        raise ValueError(
            f"mg_loads: blob carries {len(counters)} counters but cap={cap}; "
            "the merger's cap must match the builder's (see make_mg_merger)"
        )
    return {"cap": cap, "counters": counters, "d": d, "n": n}


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

    Precondition: ``key_col`` and ``value_col`` must be non-null.
    pandas ``groupby`` drops NULL keys silently (and NULL values would
    TypeError inside the compaction sort), which would diverge from a
    SQL oracle's NULL group — so nulls fail loudly here instead.
    Callers with nullable inputs must filter first.
    """
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        sketches: dict = {}
        for pdf in batches:
            if pdf[key_col].isna().any() or pdf[value_col].isna().any():
                raise ValueError(
                    f"kll partial builder requires non-null {key_col!r} and "
                    f"{value_col!r}; filter nulls before sketching"
                )
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


def make_mg_partial_builder(key_col: str, item_col: str, cap: int):
    """mapInPandas fn: one partial Misra-Gries sketch per (task, key).

    Batch items are counted exactly (vectorized value_counts) and folded
    into the sketch via the MERGE rule rather than item-at-a-time — same
    guarantee, ~100× less Python. Non-null precondition as for the KLL
    builder (pandas groupby/value_counts silently drop NULLs)."""
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        sketches: dict = {}
        for pdf in batches:
            if pdf[key_col].isna().any() or pdf[item_col].isna().any():
                raise ValueError(
                    f"mg partial builder requires non-null {key_col!r} and "
                    f"{item_col!r}; filter nulls before sketching"
                )
            for key, grp in pdf.groupby(key_col, sort=False):
                sk = sketches.setdefault(key, mg_new(cap))
                counts = grp[item_col].astype(str).value_counts()
                mg_update(sk, dict(zip(counts.index, counts.to_numpy())))
        rows = [
            {
                key_col: key,
                "counters": mg_dumps(sk),
                "d": sk["d"],
                "n_rows": sk["n"],
            }
            for key, sk in sketches.items()
        ]
        yield pd.DataFrame(rows, columns=[key_col, "counters", "d", "n_rows"])

    return build


def make_mg_merger(key_col: str, cap: int):
    """applyInPandas fn: merge a group's partial MG sketches into one.

    cap must MATCH the builder's: deriving it from len(counters) would
    understate capacity on partials that never filled up, over-reduce on
    merge, and inflate d past the cap-keyed invariant (2)."""
    import pandas as pd

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = None
        for counters, d, n in zip(pdf["counters"], pdf["d"], pdf["n_rows"]):
            part = mg_loads(counters, int(d), int(n), cap)
            sk = part if sk is None else mg_merge(sk, part)
        return pd.DataFrame(
            [
                {
                    key_col: pdf[key_col].iloc[0],
                    "counters": mg_dumps(sk),
                    "d": sk["d"],
                    "n_rows": sk["n"],
                }
            ]
        )

    return merge


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


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketch (KMV / bottom-k minimum values)
# ---------------------------------------------------------------------------
#
# The cardinality member of the mergeable-blob family (KLL = quantiles,
# MG = frequencies): keep the k SMALLEST distinct 60-bit hash values of a
# set. Properties the catalog keys on:
#
#   - Mergeable: bottom-k(A ∪ B) ⊆ bottom-k(A) ∪ bottom-k(B), so merging
#     blobs is a set-union + truncate — any rollup window recombines
#     KB-sized blobs instead of rescanning rows (the w23/w24 payoff).
#   - Exactly SQL-reproducible: the hash is a fixed md5 60-bit prefix
#     (``conv(substring(md5(x),1,15),16,10)`` in Spark ≡
#     ``('0x' || substr(md5(x),1,15))::BIGINT`` in DuckDB ≡
#     ``int(hashlib.md5(x).hexdigest()[:15], 16)`` in Python — parity
#     verified in tests), so a SQL oracle reproduces the ESTIMATE itself
#     bit-for-bit, a stronger check than the bound-pinning contract the
#     KLL/MG queries use (possible because, unlike those, the KMV state
#     is a pure deterministic function of the input SET).
#   - Set-operation capable: for two sets, the k smallest hashes of the
#     UNION double as a uniform sample of A ∪ B, so
#     |{h in bottom-k(U)} present in both A and B| / k estimates Jaccard
#     — the overlap estimator Spark's built-in HLL union cannot give
#     (HLL has no intersection).
#
# Estimator: hashes are uniform on [0, 2**60); with U_k the k-th smallest,
# distinct ≈ (k-1) * 2**60 / U_k (the classic KMV/bottom-k estimator,
# unbiased, relative std ≈ 1/sqrt(k-2)). When fewer than k distinct
# hashes exist the sketch holds ALL of them and the count is EXACT.
# Deterministic throughout — no seeds, no randomness; two runs (and two
# engines) produce identical blobs and identical estimates.

KMV_SPACE = 1 << 60  # hash domain: md5 60-bit prefix, uniform


def kmv_new(k: int) -> dict:
    return {"k": k, "hashes": []}  # sorted ascending, distinct, len <= k


def kmv_add_hashes(sk: dict, hashes) -> None:
    """Fold an iterable of int hash values into the sketch."""
    merged = set(sk["hashes"])
    merged.update(int(h) for h in hashes)
    sk["hashes"] = sorted(merged)[: sk["k"]]


def kmv_merge(a: dict, b: dict) -> dict:
    """Merge b into a (in place) and return a — set-union + truncate."""
    kmv_add_hashes(a, b["hashes"])
    return a


def kmv_estimate(sk: dict) -> float:
    """Distinct-count estimate; EXACT (as a float) while the sketch is
    not full. Matches the SQL form
    ``CASE WHEN n < k THEN n ELSE (k-1) * 2^60 / kth END`` evaluated in
    IEEE doubles — (k-1) and 2**60 are both exactly representable."""
    n = len(sk["hashes"])
    if n < sk["k"]:
        return float(n)
    return float(sk["k"] - 1) * float(KMV_SPACE) / float(sk["hashes"][-1])


def kmv_dumps(sk: dict) -> str:
    """Hashes only — a plain JSON array so Spark's
    from_json(..., 'array<bigint>') can explode it JVM-side; k travels
    as the query-level constant (mg pattern)."""
    return json.dumps(sk["hashes"], separators=(",", ":"))


def kmv_loads(payload: str, k: int) -> dict:
    """k must match the builder's. A valid k-blob never carries more
    than k hashes, so the dangerous mismatch direction (merger k smaller
    than builder's — silent truncation bias) fails loudly (mg pattern)."""
    hashes = json.loads(payload)
    if len(hashes) > k:
        raise ValueError(
            f"kmv_loads: blob carries {len(hashes)} hashes but k={k}; "
            "the merger's k must match the builder's"
        )
    return {"k": k, "hashes": hashes}


def make_kmv_partial_builder(key_col: str, hash_col: str, k: int):
    """mapInPandas fn: one partial KMV sketch per (task, key).

    Takes a PRE-HASHED long column (compute the md5 prefix JVM-side with
    ``conv(substring(md5(x),1,15),16,10)`` so hashing stays in codegen);
    the kernel is then pure numpy bottom-k: per batch, unique + truncate.
    Non-null precondition as for the KLL/MG builders (pandas unique
    would silently drop NaN-coerced values)."""
    import numpy as np
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        sketches: dict = {}
        # per-key admission cutoff: once a key's sketch is full, any hash
        # ABOVE its current kth-smallest can never enter the bottom-k, so
        # later batches drop those rows vectorially before the groupby.
        # The comparison happens in float64 (pandas map gives NaN for
        # unseen keys), which is SAFE: round-to-nearest is monotonic, so
        # float(h) > float(cutoff) implies h > cutoff — borderline rows
        # where the floats tie are kept and deduped by the exact integer
        # fold below. Semantics are bit-identical; only work is saved.
        cutoffs: dict = {}
        for pdf in batches:
            if pdf[key_col].isna().any() or pdf[hash_col].isna().any():
                raise ValueError(
                    f"kmv partial builder requires non-null {key_col!r} "
                    f"and {hash_col!r}; filter nulls before sketching"
                )
            if cutoffs:
                cut = pdf[key_col].map(cutoffs)
                pdf = pdf[cut.isna() | (pdf[hash_col] <= cut)]
                if pdf.empty:
                    continue
            for key, grp in pdf.groupby(key_col, sort=False):
                sk = sketches.setdefault(key, kmv_new(k))
                kmv_add_hashes(
                    sk, np.unique(grp[hash_col].to_numpy())[:k].tolist()
                )
                if len(sk["hashes"]) == k:
                    cutoffs[key] = sk["hashes"][-1]
        rows = [
            {key_col: key, "payload": kmv_dumps(sk)}
            for key, sk in sketches.items()
        ]
        yield pd.DataFrame(rows, columns=[key_col, "payload"])

    return build


def make_kmv_merger(key_col: str, k: int):
    """applyInPandas fn: merge a group's partial KMV sketches into one.

    Emits the blob plus the two numbers every downstream estimate needs:
    n_hashes (= exact distinct count while < k) and kth (the k-th
    smallest hash; NULL while the sketch is not full)."""
    import pandas as pd

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = None
        for payload in pdf["payload"]:
            part = kmv_loads(payload, k)
            sk = part if sk is None else kmv_merge(sk, part)
        full = len(sk["hashes"]) == k
        return pd.DataFrame(
            [
                {
                    key_col: pdf[key_col].iloc[0],
                    "payload": kmv_dumps(sk),
                    "n_hashes": len(sk["hashes"]),
                    "kth": sk["hashes"][-1] if full else None,
                }
            ]
        )

    return merge
