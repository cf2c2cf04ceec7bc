"""MNC ("mark and cross") expression similarity (reference search/mnc-score.c).

The reference evaluates two expressions' similarity over their leaf-root
subpaths with alpha-equivalence: query paths are sorted by (bound-variable
size desc, symbol asc) and walked in runs of equal symbols; each query path
marks one unconsumed structurally-matching document path per document-symbol
slot (bitmap per slot, mnc-score.c:231-253); at the end of each symbol run
the best slot's marks are crossed out permanently (cross, mnc-score.c:255-262)
and its subscore accumulates; a query path that marks nothing anywhere zeroes
the whole expression (early termination, mnc-score.c:277-307). A mark scores
MNC_MARK_SCORE(=99) + 1 exact-symbol bonus (search/config.h:20).

Final similarity (math-expr-search.c:266-277 math_expr_sim):

    sim = mnc_total // (depth_delta + breath_delta + 1)        [uint division]

with breath_delta = n_doc_lr_paths - n_qry_lr_paths (query larger than doc
=> no match, math-expr-search.c:320-328) and depth_delta = the dir-merge
level. Re-expression notes (this is a set-oriented twin, not a port):

- structural match = leaf-anchored PREFIX: a query path matches any doc
  path equal to it or extending it toward the root (the reference's
  dir-merge descending into subdirectories); depth_delta = the largest
  per-query-path minimum extension depth;
- \\qvar wildcard paths match root-anchored SUFFIXES (the wildcard's
  subtree replaces the leaf), at depth 0;
- the reference scores each directory level in a separate pass and keeps
  the doc max; we build one relevance bitmap across levels — identical on
  the reference's own golden rank cases (tests/test_mnc.py), simpler at
  scale.
"""

from __future__ import annotations

from collections import Counter

MNC_MARK_SCORE = 99  # search/config.h:20
MAX_DOC_PATHS = 64  # bitmap width (mnc-score.h MAX_SUBPATH_ID)


def order_query_paths(qpaths: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Sort (struct, symbol) query paths the MNC way: bound-variable size
    (count of query paths sharing the symbol) desc, then symbol asc
    (math-expr-search.c:6-17 compare_qry_path)."""
    cnt = Counter(sym for _, sym in qpaths)
    order = sorted(
        range(len(qpaths)),
        key=lambda i: (-cnt[qpaths[i][1]], qpaths[i][1], i),
    )
    return [qpaths[i] for i in order]


def mnc_total(qry_syms: list[str], doc_syms: list[str], rel: list[dict[int, int]]) -> int:
    """The mark-and-cross main loop (mnc-score.c:264-335).

    ``qry_syms``: query path symbols in MNC order. ``doc_syms``: slot ->
    document leaf symbol. ``rel[i]``: slot -> bitmask of structurally
    relevant document path_ids for query path i.
    """
    n_slots = len(doc_syms)
    mark = [0] * n_slots
    cross = [0] * n_slots
    sub = [0] * n_slots
    total = 0
    max_sub = 0
    max_idx = 0
    for i, qs in enumerate(qry_syms):
        early = True
        for j in range(n_slots):
            bits = rel[i].get(j, 0) & ~(mark[j] | cross[j])
            if bits == 0:
                continue
            mark[j] |= bits & (-bits)  # lowest unconsumed bit
            early = False
            sub[j] += MNC_MARK_SCORE + (1 if qs == doc_syms[j] else 0)
            if sub[j] > max_sub:
                max_sub = sub[j]
                max_idx = j
        if early or i + 1 == len(qry_syms) or qry_syms[i + 1] != qs:
            cross[max_idx] |= mark[max_idx]
            mark = [0] * n_slots
            if early:
                return 0
            total += max_sub
            sub = [0] * n_slots
            max_sub = 0
            max_idx = 0
    return total


def struct_match_depth(q_struct: str, q_sym: str, d_struct: str) -> int | None:
    """Does query path (q_struct, q_sym) structurally match doc path
    d_struct? Returns the extension depth (0 = exact) or None.

    Concrete paths: leaf-anchored prefix (extra operators toward the root).
    Wildcards (* symbol): root-anchored suffix — any subtree replaces the
    wildcard leaf; depth 0.
    """
    if q_sym == "*":
        trail = q_struct[2:] if q_struct.startswith("V/") else ""
        if trail == "" or d_struct == trail or d_struct.endswith("/" + trail):
            return 0
        return None
    if d_struct == q_struct:
        return 0
    if d_struct.startswith(q_struct + "/"):
        return d_struct.count("/") - q_struct.count("/")
    return None


def expr_mnc_sim(qpaths: list[tuple[str, str]], doc_paths: list[tuple[str, str]]) -> int:
    """Pure-Python MNC similarity of one query expression vs one document
    expression. ``qpaths``/``doc_paths``: ordered (struct, symbol) lists
    from texparse.lr_paths. Returns the integer similarity (0 = no match).
    """
    n_q, n_d = len(qpaths), len(doc_paths)
    if n_q == 0 or n_d == 0 or n_q > n_d:
        return 0
    q_sorted = order_query_paths(qpaths)
    doc_syms: list[str] = []
    slot_of: dict[str, int] = {}
    rel: list[dict[int, int]] = [dict() for _ in q_sorted]
    min_d = [None] * len(q_sorted)
    for pid, (d_struct, d_sym) in enumerate(doc_paths[:MAX_DOC_PATHS]):
        for i, (q_struct, q_sym) in enumerate(q_sorted):
            d = struct_match_depth(q_struct, q_sym, d_struct)
            if d is None:
                continue
            if d_sym not in slot_of:
                slot_of[d_sym] = len(doc_syms)
                doc_syms.append(d_sym)
            j = slot_of[d_sym]
            rel[i][j] = rel[i].get(j, 0) | (1 << pid)
            if min_d[i] is None or d < min_d[i]:
                min_d[i] = d
    if any(m is None for m in min_d):
        return 0  # some query path matches nothing (AND merge fails)
    level = max(min_d)
    total = mnc_total([s for _, s in q_sorted], doc_syms, rel)
    return total // (level + (n_d - n_q) + 1)
