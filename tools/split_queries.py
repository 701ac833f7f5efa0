"""One-shot mechanical splitter for the two mega query modules (VERDICT r12
item 2): partitions ``queries/llm.py`` and ``queries/relational.py`` into
family modules plus a shared-helper module each, leaving the original module
as a thin aggregator that re-exports every top-level name and keeps the
QUERIES/ORACLES dict literals VERBATIM (so registry content and ordering are
bit-identical).

Method (pure AST bookkeeping — no code is edited, only moved):
  1. every top-level FunctionDef/Assign is a *unit* whose source segment runs
     from the end of the previous top-level statement to its own end (so the
     comments above a def travel with it);
  2. seeds: each QUERIES key tags its builder fn (and its ORACLES value name)
     with the key's family; tags propagate through the name-reference graph;
  3. a unit tagged by exactly one family moves to that family's module;
     multi-tagged / untagged units move to the shared module (this also
     catches query fns referenced across families — no inter-family imports
     can arise by construction);
  4. each family module imports its shared names explicitly; the aggregator
     imports every name from every child, then re-states the original
     QUERIES/ORACLES literals.
Run once, verify (import + oracle sweep + pytest), commit, delete nothing:
the script stays as the audit trail of the move.
"""

from __future__ import annotations

import ast
import re
import sys
from collections import defaultdict

PKG = "us_dot_flights_lakehouse_spark.queries"
BASE = "us_dot_flights_lakehouse_spark/queries"

BANNER = re.compile(r"^\s*#\s*-{10,}\s*$")

SKETCH_NAMES = {
    "a19_sketch_rollup", "a38_kll_quantile_sketch", "a39_mg_topk_sketch",
    "a40_kmv_distinct_sketch", "a41_sampled_kmv_crosscheck",
    "w23_sketch_rolling_quantile", "w24_mg_rolling_topk",
    "w25_kmv_rolling_distinct", "w26_mart_rolling_distinct",
    "x11_incremental_mart", "x12_sketch_mart_maintenance",
    "q_groupby_cardinality_advisor", "q_join_cardinality_advisor",
    "o11_universe_sample",
}


def llm_family(key: str) -> str:
    for pre, mod in (("dd_", "dedup_q"), ("sim_", "sim_q"), ("ts_", "text_q"),
                     ("tp_", "tokpack_q"), ("mm_", "mm_q")):
        if key.startswith(pre):
            return mod
    return "corpus_misc_q"


def relational_family(key: str) -> str:
    if key in SKETCH_NAMES:
        return "sketch_q"
    if key[0] == "a" or key.startswith("daily_"):
        return "agg_q"
    if key[0] == "w":
        return "window_q"
    if key[0] in "jgu" or key.startswith("dd_"):
        return "join_q"
    if key.startswith("q_") or key[0] == "x":
        return "audit_q"
    return "funcs_q"  # f_* suites, p*, o*, s1, src_csv, ts_readability


DOCS = {
    "llm_shared": "Shared constants and helpers for the LLM-pipeline query family modules.",
    "dedup_q": "Deduplication queries (dd_*): exact/minhash/simhash/containment/incremental tiers.",
    "sim_q": "Similarity-search queries (sim_*): ANN indexes, recall audits, embedding analytics.",
    "text_q": "Text-analysis queries (ts_*): quality gates, lang-ID, corpus statistics.",
    "tokpack_q": "Tokenizer / packing / curation queries (tp_*): BPE, mixes, splits, packing.",
    "mm_q": "Multimodal queries (mm_*): image/audio/video decode, features, frame analytics.",
    "corpus_misc_q": "Corpus I/O formats (src_*) plus misc ops hosted with the documents table.",
    "relational_shared": "Shared constants and helpers for the relational query family modules.",
    "agg_q": "Aggregate / statistics queries (a*, daily_*): grouped aggs, drift, robust stats.",
    "window_q": "Window / time-series queries (w*): rolling, ranking, forecasting, funnels.",
    "join_q": "Join / graph / set-op queries (j*, g*, u*): equi/asof/skew joins, graph ops.",
    "audit_q": "Data-quality audits (q_*) and physical-layout ops (x*).",
    "funcs_q": "Scalar-function suites (f_*) and projection/sampling/ordering ops (p*, o*, s*).",
    "sketch_q": "Mergeable-sketch queries: KLL/MG/KMV families, sketch marts, advisors.",
}


def seg(lines, a, b, strip_banner=True):
    """Source lines a..b (1-based inclusive), banner triplets removed."""
    out = []
    for i in range(a, b + 1):
        ln = lines[i - 1]
        if strip_banner and BANNER.match(ln):
            continue
        if (strip_banner and ln.lstrip().startswith("#")
                and i - 1 >= 1 and BANNER.match(lines[i - 2])
                and i + 1 <= len(lines) and BANNER.match(lines[i])):
            continue
        out.append(ln)
    while out and not out[0].strip():
        out.pop(0)
    while out and not out[-1].strip():
        out.pop()
    return "\n".join(out)


def split(path: str, family_of, shared_mod: str, agg_doc_end: int | None = None):
    src = open(path).read()
    lines = src.split("\n")
    tree = ast.parse(src)

    units = []            # (names, start, end, node)
    import_stmts = []     # exact source of Import/ImportFrom
    dict_segs = {}        # QUERIES/ORACLES verbatim segments
    mappings = {}         # QUERIES/ORACLES key -> value name
    prev_end = 0
    doc_end = tree.body[0].end_lineno  # module docstring
    for st in tree.body:
        start = prev_end + 1
        prev_end = st.end_lineno
        if isinstance(st, ast.Expr):      # docstring
            continue
        if isinstance(st, (ast.Import, ast.ImportFrom)):
            import_stmts.append("\n".join(lines[st.lineno - 1:st.end_lineno]))
            continue
        if isinstance(st, ast.Assign) and isinstance(st.targets[0], ast.Name) \
                and st.targets[0].id in ("QUERIES", "ORACLES"):
            name = st.targets[0].id
            dict_segs[name] = "\n".join(lines[st.lineno - 1:st.end_lineno])
            mp = {}
            for k, v in zip(st.value.keys, st.value.values):
                if isinstance(v, ast.Name):
                    mp[k.value] = v.id
                elif isinstance(v, ast.Call) and isinstance(v.func, ast.Name):
                    mp[k.value] = v.func.id
            mappings[name] = mp
            continue
        names = []
        if isinstance(st, ast.FunctionDef):
            names = [st.name]
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                names += [n.id for n in ast.walk(t) if isinstance(n, ast.Name)]
        units.append((tuple(names), start, st.end_lineno, st))

    name_to_unit = {}
    for i, (names, *_rest) in enumerate(units):
        for n in names:
            name_to_unit[n] = i

    refs = []  # unit -> set(unit)
    for names, a, b, node in units:
        rs = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Name) and n.id in name_to_unit:
                rs.add(name_to_unit[n.id])
        refs.append(rs)

    # seed tags from the registry dicts, propagate over references
    tags = defaultdict(set)
    def dfs(u, fam):
        if fam in tags[u]:
            return
        tags[u].add(fam)
        for v in refs[u]:
            dfs(v, fam)
    for mp in mappings.values():
        for key, val in mp.items():
            if val in name_to_unit:
                dfs(name_to_unit[val], family_of(key))

    assign = {}
    for i in range(len(units)):
        ts = tags[i]
        assign[i] = next(iter(ts)) if len(ts) == 1 else shared_mod

    header = "\n".join(import_stmts)
    mods = defaultdict(list)
    for i, (names, a, b, _n) in enumerate(units):
        mods[assign[i]].append(i)

    mod_names = {m: [n for i in idxs for n in units[i][0]]
                 for m, idxs in mods.items()}

    for mod, idxs in mods.items():
        need_shared = sorted({
            n for i in idxs for nn in (refs[i],) for j in nn
            if assign[j] == shared_mod
            for n in units[j][0]
        }) if mod != shared_mod else []
        body = [f'"""{DOCS[mod]}\n\nMechanically split out of ``{path}`` (round 13); see that module\'s\ndocstring for the family-wide determinism contract.\n"""',
                "", header]
        if need_shared:
            imp = f"from {PKG}.{shared_mod} import (\n" + \
                  "".join(f"    {n},\n" for n in need_shared) + ")"
            body += ["", imp]
        for i in idxs:
            body += ["", "", seg(lines, units[i][1], units[i][2])]
        open(f"{BASE}/{mod}.py", "w").write("\n".join(body) + "\n")
        print(f"wrote {mod}.py: {len(idxs)} units, {len(mod_names[mod])} names")

    # aggregator: original docstring + explicit re-export of every name +
    # the original dict literals verbatim
    # the original import header stays in the aggregator too: names it
    # binds (F, read_table, MINHASH_A, ...) were importable from this
    # module for 12 rounds and external code may rely on that surface
    agg = [seg(lines, 1, doc_end, strip_banner=False), "",
           header.replace("import ", "import ", 1), ""]
    order = [shared_mod] + sorted(m for m in mods if m != shared_mod)
    for mod in order:
        ns = sorted(mod_names[mod])
        agg.append(f"from {PKG}.{mod} import (  # noqa: F401\n" +
                   "".join(f"    {n},\n" for n in ns) + ")")
    agg += ["", dict_segs["QUERIES"], "", dict_segs["ORACLES"], ""]
    open(path, "w").write("\n".join(agg))
    print(f"rewrote {path} as aggregator ({len(order)} children)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("llm", "both"):
        split(f"{BASE}/llm.py", llm_family, "llm_shared")
    if which in ("relational", "both"):
        split(f"{BASE}/relational.py", relational_family, "relational_shared")
