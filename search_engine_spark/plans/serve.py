"""Document-sharded query serving: shard-local DAAT kernel + global top-k.

THE scalable serving design (and how the reference runs distributed in
practice): the posting blocks are doc-range sharded (every term of a doc in
one shard, blocks.pack_blocks layout="doc"), so a query is

  narrow mapInPandas over term-filtered blocks (per shard: decode ->
  vectorized BM25 + proximity + local bounded top-k, all numpy)
  -> union of n_shards * k rows -> global rank window.

ZERO data shuffles per query: the only movement is each shard's k
candidate rows. The per-shard kernel is exactly the reference's
document-at-a-time merge loop (search/postmerge.c + search.c:167-278 +
proximity.c) vectorized over the whole shard instead of doc-at-a-time:

- per-term score: idf * tf(k1+1)/(tf + k1(1-b+(k1/avgdl)doclen)) with the
  reference quirks (scoring.py);
- bm25 = 1 + sum of nonzero term scores; match_dim = count nonzero;
- prox = ln(0.3 + e^-minDist), minDist = min adjacent cross-keyword gap in
  the doc's merged position order (np.lexsort + diff + minimum.at);
- AND mode: n matched terms == n query terms (postmerge.c:103-140);
- local heap: lexsort take-k (minheap.c role), ties (score DESC, doc ASC).

Batch mode scores many queries in the same shard pass, reusing the decoded
arrays — the serving-throughput shape.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import codec
from ..operators import scoring as S

_LN03 = math.log(0.3)

_OUT_SCHEMA = (
    "qid string, doc_id long, bm25 double, match_dim double, "
    "n_matched_terms long, prox double, score double"
)


def _merge_union(intervals: np.ndarray) -> np.ndarray:
    """[[s,e]...] -> merged union, sorted (inclusive bounds)."""
    if len(intervals) == 0:
        return intervals.reshape(0, 2)
    iv = intervals[np.argsort(intervals[:, 0])]
    out = [iv[0].tolist()]
    for s, e in iv[1:]:
        if s <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return np.asarray(out, dtype=np.int64)


def _intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two merged interval lists (two-pointer)."""
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        s = max(a[i][0], b[j][0])
        e = min(a[i][1], b[j][1])
        if s <= e:
            out.append([s, e])
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def _overlaps(first: np.ndarray, last: np.ndarray, ranges: np.ndarray) -> np.ndarray:
    """Per-block mask: does [first,last] overlap any allowed range?"""
    if len(ranges) == 0:
        return np.zeros(len(first), dtype=bool)
    starts, ends = ranges[:, 0], ranges[:, 1]
    # for each block, the candidate range with the greatest start <= last
    idx = np.searchsorted(starts, last, side="right") - 1
    ok = idx >= 0
    ok[ok] &= ends[idx[ok]] >= first[ok]
    return ok


def _block_ub_tfn(max_tf: np.ndarray, min_dl: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-block BM25 tf-normalization UPPER BOUND, evaluated at serve time.

    The packed blocks store avgdl-independent extremes (block_max_tf,
    block_min_dl); tfn is monotone increasing in tf and decreasing in
    doclen, so tfn(max_tf, min_dl, avgdl) >= every entry's tfn. Uses the
    exact float64 expression of _score_one_query, so a single-entry block's
    bound equals its score bit-for-bit (never below it)."""
    k1, b = S.BM25_K1, S.BM25_B
    frac = S.BM25_K1 / avgdl
    tf = max_tf.astype(np.float64)
    dl = min_dl.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + frac * dl))


def _term_cover(pdfs: list[pd.DataFrame]) -> dict[str, np.ndarray]:
    """term -> merged union of its blocks' [first,last] doc ranges."""
    cover: dict[str, list] = {}
    for pdf in pdfs:
        for term, grp in pdf.groupby("term"):
            cover.setdefault(term, []).append(
                np.stack([grp["first_doc_id"].to_numpy(), grp["last_doc_id"].to_numpy()], 1)
            )
    return {t: _merge_union(np.concatenate(c)) for t, c in cover.items()}


def _and_needed(union: dict[str, np.ndarray], and_items) -> dict[str, np.ndarray]:
    """Block-skip analogue of the reference's galloping AND merge
    (postmerge.c:103-140 jump over skip lists): a block of term t needs
    decoding only if it overlaps the intersection of ALL terms' covered
    doc ranges for some conjunctive query using t.
    Returns term -> allowed interval array."""
    needed: dict[str, np.ndarray] = {}
    for _, kws, _ in and_items:
        terms = [t for _, t, _ in kws]
        if any(t not in union for t in terms):
            continue  # a term absent from this shard: AND result empty here
        q_range = union[terms[0]]
        for t in terms[1:]:
            q_range = _intersect(q_range, union[t])
            if len(q_range) == 0:
                break
        if len(q_range) == 0:
            continue
        for t in terms:
            needed[t] = (
                q_range if t not in needed
                else _merge_union(np.concatenate([needed[t], q_range]))
            )
    return needed


def _conjunctive_skip_mask(pdfs: list[pd.DataFrame], qitems) -> dict[str, np.ndarray] | None:
    """_and_needed over a conjunctive-only workload, or None when any query
    is disjunctive (an unpruned OR query needs every block of its terms)."""
    if any(mode != "and" for _, _, mode in qitems):
        return None
    return _and_needed(_term_cover(pdfs), qitems)


def _decode_frame(pdf: pd.DataFrame, want_pos: bool, acc: dict) -> None:
    """Varbyte-decode one frame of block rows into the per-term accumulator."""
    for row in pdf.itertuples(index=False):
        ids = codec.decode_ids(row.doc_ids_blob).astype(np.int64)
        tfs = codec.vb_decode(row.tfs_blob).astype(np.int64)
        dls = codec.vb_decode(row.doclens_blob).astype(np.int64)
        pos = (
            codec.vb_decode(row.positions_blob).astype(np.int64)
            if want_pos
            else np.empty(0, dtype=np.int64)
        )
        acc.setdefault(row.term, []).append((ids, tfs, dls, pos))


def _finish_decode(acc: dict, want_pos: bool) -> dict:
    out = {}
    for term, chunks in acc.items():
        ids = np.concatenate([c[0] for c in chunks])
        tfs = np.concatenate([c[1] for c in chunks])
        dls = np.concatenate([c[2] for c in chunks])
        pos = np.concatenate([c[3] for c in chunks]) if want_pos else None
        out[term] = (ids, tfs, dls, pos)
    return out


def _decode_partition(batches: Iterator[pd.DataFrame], want_pos: bool, qitems=None):
    """Accumulate decoded posting arrays per term for one shard.

    With a conjunctive-only workload, blocks outside the AND-coverage
    intersection are skipped before decode (never varbyte-decoded)."""
    pdfs = [pdf for pdf in batches if not pdf.empty]
    skip = _conjunctive_skip_mask(pdfs, qitems) if qitems else None
    acc: dict[str, list] = {}
    for pdf in pdfs:
        if skip is not None:
            first = pdf["first_doc_id"].to_numpy()
            last = pdf["last_doc_id"].to_numpy()
            mask = np.zeros(len(pdf), dtype=bool)
            for term, grp_idx in pdf.groupby("term").indices.items():
                allowed = skip.get(term)
                if allowed is None or len(allowed) == 0:
                    continue
                mask[grp_idx] = _overlaps(first[grp_idx], last[grp_idx], allowed)
            pdf = pdf[mask]
            if pdf.empty:
                continue
        _decode_frame(pdf, want_pos, acc)
    return _finish_decode(acc, want_pos)


def _filter_decoded(decoded: dict, ranges: np.ndarray, terms=None) -> dict:
    """Keep only posting entries whose doc_id lies in the merged, sorted
    ``ranges`` (inclusive). Positions (flat stream, per-entry length == tf)
    are masked with np.repeat so the stream stays aligned. ``terms``
    restricts the output to one query's keywords (batch mode shares a
    single decoded dict across the workload)."""
    if len(ranges) == 0:
        return {}
    starts, ends = ranges[:, 0], ranges[:, 1]
    out = {}
    items = (
        decoded.items()
        if terms is None
        else ((t, decoded[t]) for t in terms if t in decoded)
    )
    for term, (ids, tfs, dls, pos) in items:
        idx = np.searchsorted(starts, ids, side="right") - 1
        keep = idx >= 0
        keep[keep] &= ids[keep] <= ends[idx[keep]]
        if not keep.any():
            continue
        if pos is not None and len(pos):
            pos = pos[np.repeat(keep, tfs)]
        out[term] = (ids[keep], tfs[keep], dls[keep], pos)
    return out


def _interval_sweep(
    meta: pd.DataFrame, idfs: dict[str, float], n_terms: int, thresh: float, avgdl: float
):
    """Elementary-interval upper-bound sweep over block metadata.

    Returns surviving [start, end] doc_id intervals (inclusive). An interval
    survives iff ln(1.3) + 0.5*(1 + sum_t max(ub_t, 0)) + 10000*n_terms >= T
    where ub_t is the max covering-block upper bound of term t there
    (idf * tfn(block_max_tf, block_min_dl, avgdl) — serve-time evaluation
    of the avgdl-independent block-max metadata).
    """
    pts = np.unique(np.r_[meta["first_doc_id"].to_numpy(), meta["last_doc_id"].to_numpy() + 1])
    if len(pts) < 2:
        return [(int(meta["first_doc_id"].min()), int(meta["last_doc_id"].max()))]
    starts = pts[:-1]
    total_ub = np.zeros(len(starts), dtype=np.float64)
    for term, grp in meta.groupby("term"):
        idf = idfs[term]
        ub = np.zeros(len(starts), dtype=np.float64)
        f = grp["first_doc_id"].to_numpy()
        l = grp["last_doc_id"].to_numpy()
        u = np.maximum(
            _block_ub_tfn(
                grp["block_max_tf"].to_numpy(), grp["block_min_dl"].to_numpy(), avgdl
            )
            * idf,
            0.0,
        )
        # for each elementary interval, max ub among covering blocks
        for bf, bl, bu in zip(f, l, u):
            lo = np.searchsorted(starts, bf, "left")
            hi = np.searchsorted(starts, bl, "right")
            np.maximum(ub[lo:hi], bu, out=ub[lo:hi])
        total_ub += ub
    bound = math.log(1.3) + 0.5 * (1.0 + total_ub) + S.MATCH_DIM_WEIGHT * n_terms
    keep = bound >= thresh
    out = []
    for i in np.flatnonzero(keep):
        out.append((int(starts[i]), int(pts[i + 1] - 1)))
    return out


class _RowDecoder:
    """Per-block varbyte decode cache: every block row decodes AT MOST once
    per shard pass, no matter how many queries' masks select it."""

    def __init__(self, meta: pd.DataFrame, want_pos: bool):
        self.want_pos = want_pos
        self._terms = meta["term"].tolist()
        self._ids_b = meta["doc_ids_blob"].tolist()
        self._tfs_b = meta["tfs_blob"].tolist()
        self._dls_b = meta["doclens_blob"].tolist()
        self._pos_b = meta["positions_blob"].tolist() if want_pos else None
        self._cache: dict[int, tuple] = {}

    def decode(self, mask: np.ndarray) -> None:
        for i in np.flatnonzero(mask):
            i = int(i)
            if i in self._cache:
                continue
            ids = codec.decode_ids(self._ids_b[i]).astype(np.int64)
            tfs = codec.vb_decode(self._tfs_b[i]).astype(np.int64)
            dls = codec.vb_decode(self._dls_b[i]).astype(np.int64)
            pos = (
                codec.vb_decode(self._pos_b[i]).astype(np.int64)
                if self.want_pos
                else np.empty(0, dtype=np.int64)
            )
            self._cache[i] = (self._terms[i], ids, tfs, dls, pos)

    def gather(self, mask: np.ndarray) -> dict:
        """Assemble the per-term decoded dict from cached rows under mask."""
        acc: dict[str, list] = {}
        for i in np.flatnonzero(mask):
            term, ids, tfs, dls, pos = self._cache[int(i)]
            acc.setdefault(term, []).append((ids, tfs, dls, pos))
        return _finish_decode(acc, self.want_pos)


def _batch_wand_shard(pdfs: list, qitems, avgdl: float, k: int, with_prox: bool):
    """Shard-local block-max WAND over a whole workload in ONE sweep.

    The reference's score-threshold pruning over skip lists
    (search/search-utils.c:322-335 + mem-index/skippy.h) re-expressed
    per shard with NO driver round-trips (Ding & Suel, SIGIR'11),
    generalized to a batch: every disjunctive query seeds its own
    threshold and prunes its own intervals; conjunctive queries get the
    galloping-AND coverage skip; the union of all queries' surviving
    blocks is varbyte-decoded ONCE (_RowDecoder), then each query scores
    over its own survivor ranges (out-of-range entries are dropped — their
    term sums would be partial AND they are provably below that query's
    threshold).

      1. seed: per OR query, exactly score the doc range of its single
         highest-upper-bound block (idf * serve-time block-max tfn) -> threshold T =
         the query's local kth best total (a valid lower bound);
      2. sweep each query's block metadata into elementary doc intervals;
         an interval whose summed covering upper bounds (+ max prox ln 1.3
         + full match-dim bonus) stays below T cannot hold a local top-k
         doc for that query;
      3. decode the union of surviving blocks once, score each query over
         its survivors, local top-k per query.

    Pruned == full equality (single + batch) is asserted in
    tests/test_wand.py. Yields (qid, result) pairs."""
    if not pdfs:
        return
    meta = pd.concat(pdfs, ignore_index=True)
    first = meta["first_doc_id"].to_numpy()
    last = meta["last_doc_id"].to_numpy()
    tfn = _block_ub_tfn(
        meta["block_max_tf"].to_numpy(), meta["block_min_dl"].to_numpy(), avgdl
    )
    # per-term block row indices, computed ONCE for the whole workload
    tindex = {t: np.asarray(ix) for t, ix in meta.groupby("term").indices.items()}
    dec = _RowDecoder(meta, with_prox)
    n_rows = len(meta)

    or_items = [qi for qi in qitems if qi[2] == "or" and qi[1]]
    and_items = [qi for qi in qitems if qi[2] == "and" and qi[1]]

    def _rows_of(kws) -> np.ndarray:
        hit = [tindex[t] for _, t, _ in kws if t in tindex]
        return np.concatenate(hit) if hit else np.empty(0, dtype=np.int64)

    # --- phase 1: per-OR-query seed block ---------------------------------
    seeds: dict[str, tuple] = {}  # qid -> (rows_q, seed_range, idfs)
    seed_union = np.zeros(n_rows, dtype=bool)
    for qid, kws, _ in or_items:
        rows_q = _rows_of(kws)
        if len(rows_q) == 0:
            continue  # no query term has blocks in this shard
        idfs = {t: float(i) for _, t, i in kws}
        row_idf = np.concatenate(
            [np.full(len(tindex[t]), idfs[t]) for _, t, _ in kws if t in tindex]
        )
        ub = np.maximum(tfn[rows_q] * row_idf, 0.0)
        bi = int(rows_q[np.argmax(ub)])
        seed = np.array([[int(first[bi]), int(last[bi])]], dtype=np.int64)
        seeds[qid] = (rows_q, seed, idfs)
        smask = np.zeros(n_rows, dtype=bool)
        smask[rows_q[_overlaps(first[rows_q], last[rows_q], seed)]] = True
        seed_union |= smask
    dec.decode(seed_union)
    seed_decoded = dec.gather(seed_union)

    # --- phase 2: thresholds + interval sweeps per OR query ---------------
    done: dict[str, tuple | None] = {}
    ranges_by_q: dict[str, np.ndarray] = {}
    for qid, kws, _ in or_items:
        if qid not in seeds:
            done[qid] = None
            continue
        rows_q, seed, idfs = seeds[qid]
        decoded = _filter_decoded(seed_decoded, seed, terms=[t for _, t, _ in kws])
        res = _score_one_query(kws, decoded, avgdl, "or", k, with_prox)
        thresh = float(res[5][k - 1]) if res is not None and len(res[0]) >= k else -math.inf
        intervals = _interval_sweep(meta.take(rows_q), idfs, len(kws), thresh, avgdl)
        if not intervals:
            done[qid] = res  # everything outside the seed is provably below T
            continue
        ranges_by_q[qid] = _merge_union(np.asarray(intervals, dtype=np.int64))

    # --- phase 3: union decode of survivors + AND coverage, then score ----
    big = np.zeros(n_rows, dtype=bool)
    for qid, rng in ranges_by_q.items():
        rows_q = seeds[qid][0]
        big[rows_q[_overlaps(first[rows_q], last[rows_q], rng)]] = True
    needed = _and_needed(_term_cover(pdfs), and_items) if and_items else {}
    and_mask = np.zeros(n_rows, dtype=bool)
    for term, allowed in needed.items():
        if len(allowed) == 0 or term not in tindex:
            continue
        ix = tindex[term]
        and_mask[ix[_overlaps(first[ix], last[ix], allowed)]] = True
    big |= and_mask
    dec.decode(big)
    # ONE shared decoded dict for the whole workload; each query filters
    # only ITS OWN terms down to its surviving ranges
    shared = dec.gather(big)
    for qid, kws, _ in or_items:
        if qid in done:
            if done[qid] is not None:
                yield qid, done[qid]
            continue
        rng = ranges_by_q[qid]
        decoded = _filter_decoded(shared, rng, terms=[t for _, t, _ in kws])
        res = _score_one_query(kws, decoded, avgdl, "or", k, with_prox)
        if res is not None:
            yield qid, res
    if and_items:
        # extra decoded entries outside a query's own coverage intersection
        # are harmless: a doc there cannot carry ALL the query's terms, so
        # the n_matched == n_terms predicate removes it
        for qid, kws, _ in and_items:
            res = _score_one_query(kws, shared, avgdl, "and", k, with_prox)
            if res is not None:
                yield qid, res


def _score_one_query(
    terms_kw: list[tuple[int, str, float]],
    decoded: dict,
    avgdl: float,
    mode: str,
    k: int,
    with_prox: bool,
):
    """Shard-local scoring of one query -> top-k numpy rows."""
    k1, b = S.BM25_K1, S.BM25_B
    frac = S.BM25_K1 / avgdl
    row_doc, row_kw, row_score = [], [], []
    row_pos_doc, row_pos_kw, row_pos = [], [], []
    for kw_idx, term, idf in terms_kw:
        got = decoded.get(term)
        if got is None:
            continue
        ids, tfs, dls, pos = got
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        sc = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + frac * dl))
        row_doc.append(ids)
        row_kw.append(np.full(len(ids), kw_idx, dtype=np.int64))
        row_score.append(sc)
        if with_prox and pos is not None and len(pos):
            reps = tfs  # positions per entry == capped tf
            row_pos_doc.append(np.repeat(ids, reps))
            row_pos_kw.append(np.repeat(np.int64(kw_idx), int(reps.sum())))
            row_pos.append(pos)
    if not row_doc:
        return None
    doc = np.concatenate(row_doc)
    score = np.concatenate(row_score)
    udoc, inv = np.unique(doc, return_inverse=True)
    n = len(udoc)
    bm25 = np.full(n, 1.0)
    nz = score != 0.0
    np.add.at(bm25, inv[nz], score[nz])
    match_dim = np.zeros(n)
    np.add.at(match_dim, inv[nz], 1.0)
    n_matched = np.zeros(n, dtype=np.int64)
    np.add.at(n_matched, inv, 1)

    if with_prox and row_pos_doc:
        pdoc = np.concatenate(row_pos_doc)
        pkw = np.concatenate(row_pos_kw)
        ppos = np.concatenate(row_pos)
        order = np.lexsort((ppos, pdoc))
        pdoc, pkw, ppos = pdoc[order], pkw[order], ppos[order]
        same_doc = pdoc[1:] == pdoc[:-1]
        diff_kw = pkw[1:] != pkw[:-1]
        gaps = ppos[1:] - ppos[:-1]
        sel = same_doc & diff_kw
        mind = np.full(n, np.inf)
        if sel.any():
            gidx = np.searchsorted(udoc, pdoc[1:][sel])
            np.minimum.at(mind, gidx, gaps[sel].astype(np.float64))
        prox = np.log(0.3 + np.exp(-mind))
    else:
        prox = np.full(n, _LN03)

    if mode == "and":
        keep = n_matched == len(terms_kw)
        if not keep.any():
            return None
        udoc, bm25, match_dim, n_matched, prox = (
            udoc[keep], bm25[keep], match_dim[keep], n_matched[keep], prox[keep]
        )
    total = prox + 0.5 * bm25 + S.MATCH_DIM_WEIGHT * match_dim
    top = np.lexsort((udoc, -total))[:k]
    return udoc[top], bm25[top], match_dim[top], n_matched[top], prox[top], total[top]


# Minimum docs a serving shard should cover before another shard pays off:
# below this the per-shard kernel fixed cost (task schedule + Python worker
# Arrow round-trip + per-query bookkeeping) outweighs the parallelism.
# Measured on the 5k-doc sf0.1 index at local[32] (best-of-5): single query
# 0.76s at 32 shards -> 0.34s at 4; 64-query batch 0.47s -> 0.32s. Indexes
# past cores*this (=40k docs at local[32]) keep one shard per core, so the
# 100k-doc bench QPS workload and any at-scale index are untouched.
SERVE_DOCS_PER_SHARD = 1250


def serving_coalesce(df: DataFrame, docN: int | None = None) -> DataFrame:
    """Normalize the block frame to the serving shard count.

    The BUILD wants ~4 tasks/core for load balance, but at SERVE time each
    mapInPandas task scores the whole query batch against its shard, so
    per-task kernel overhead multiplies with the shard count: measured on
    a 512-query batch over a 20k-doc index at local[32], 128 shards =
    201 QPS vs 32 shards = 378 QPS (identical results). coalesce() merges
    whole parent partitions, so the doc-sharded invariant (every block of
    a doc in one shard) is preserved, and the grouping is deterministic
    for a given parent count — attach_posting_cache and shard_search both
    route through this helper (with the same ``docN``) so the cache pool's
    pid-keyed bounds agree with the query-time layout. On a real cluster
    the target is the cluster's total cores (defaultParallelism), i.e. one
    serving shard per executor core — scaled DOWN for small indexes so a
    shard covers at least ``SERVE_DOCS_PER_SHARD`` docs (tiny indexes
    otherwise pay 32 kernel round-trips to score 5k docs). Override with
    $SPARK_GRAFT_SERVE_SHARDS.
    """
    sc = df.sparkSession.sparkContext
    default = sc.defaultParallelism
    if docN is not None:
        default = max(1, min(default, int(docN) // SERVE_DOCS_PER_SHARD))
    target = int(os.environ.get("SPARK_GRAFT_SERVE_SHARDS", default))
    n = df.rdd.getNumPartitions()
    return df.coalesce(target) if n > target else df


_POS_BITS = 21  # combined sort key: doc_id << 21 | position


def _batch_score_shard(qitems, decoded, avgdl, k, with_prox):
    """Score a whole workload against one shard's decoded postings.

    Semantically a loop of ``_score_one_query``, but per-TERM work — tf
    normalization, the idf product, the tf-expanded position stream and its
    combined (doc,pos) sort key — is computed ONCE and shared by every
    query that uses the term. Under a Zipf workload the hot terms appear in
    dozens of concurrent queries, so the per-query loop was recomputing the
    same ``np.repeat``/divide arrays 64+ times per shard (measured: ~410s
    of kernel scoring for 512 queries x 64 shards at 400k docs, vs ~90s
    with the cache). The two-key ``np.lexsort((pos, doc))`` per query is
    replaced by a single-key argsort of the precomputed packed key — gaps
    between same-doc neighbors equal the key difference, because equal doc
    bits cancel. Falls back to the two-array lexsort when positions or doc
    ids overflow the packed layout (doc_id < 2^42, pos < 2^21 — at 10^12
    docs the ids still fit).
    """
    k1, b = S.BM25_K1, S.BM25_B
    frac = S.BM25_K1 / avgdl
    cache: dict[tuple, tuple] = {}

    def entry(term, idf):
        key = (term, idf)
        ent = cache.get(key)
        if ent is None:
            got = decoded.get(term)
            if got is None:
                ent = None
            else:
                ids, tfs, dls, pos = got
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                sc = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + frac * dl))
                pkey = pfallback = None
                if with_prox and pos is not None and len(pos):
                    pdoc = np.repeat(ids, tfs)
                    if (
                        len(ids)
                        and ids.max() < (1 << 42)
                        and pos.max() < (1 << _POS_BITS)
                    ):
                        pkey = (pdoc << _POS_BITS) | pos
                    else:
                        pfallback = (pdoc, pos)
                ent = (ids, sc, pkey, pfallback)
            cache[key] = ent
        return ent

    for qid, terms_kw, mode in qitems:
        row_doc, row_score = [], []
        row_key, row_kw = [], []
        row_fb = []
        for kw_idx, term, idf in terms_kw:
            ent = entry(term, idf)
            if ent is None:
                continue
            ids, sc, pkey, pfallback = ent
            row_doc.append(ids)
            row_score.append(sc)
            if pkey is not None:
                row_key.append(pkey)
                row_kw.append(np.full(len(pkey), kw_idx, dtype=np.int64))
            elif pfallback is not None:
                row_fb.append((kw_idx, *pfallback))
        if not row_doc:
            continue
        doc = np.concatenate(row_doc)
        score = np.concatenate(row_score)
        udoc, inv = np.unique(doc, return_inverse=True)
        n = len(udoc)
        bm25 = np.full(n, 1.0)
        nz = score != 0.0
        np.add.at(bm25, inv[nz], score[nz])
        match_dim = np.zeros(n)
        np.add.at(match_dim, inv[nz], 1.0)
        n_matched = np.zeros(n, dtype=np.int64)
        np.add.at(n_matched, inv, 1)

        mind = np.full(n, np.inf)
        if row_fb:
            # overflow fallback: route EVERY stream through the two-key
            # lexsort (mixing packed and unpacked orders would miss gaps)
            for pk, kwv in zip(row_key, row_kw):
                row_fb.append((int(kwv[0]) if len(kwv) else 0, pk >> _POS_BITS,
                               pk & ((1 << _POS_BITS) - 1)))
            pdoc = np.concatenate([f[1] for f in row_fb])
            pkw = np.concatenate(
                [np.full(len(f[1]), f[0], dtype=np.int64) for f in row_fb]
            )
            ppos = np.concatenate([f[2] for f in row_fb])
            order = np.lexsort((ppos, pdoc))
            pdoc, pkw, ppos = pdoc[order], pkw[order], ppos[order]
            sel = (pdoc[1:] == pdoc[:-1]) & (pkw[1:] != pkw[:-1])
            if sel.any():
                gidx = np.searchsorted(udoc, pdoc[1:][sel])
                np.minimum.at(
                    mind, gidx, (ppos[1:] - ppos[:-1])[sel].astype(np.float64)
                )
        elif row_key:
            keys = np.concatenate(row_key)
            kws_ = np.concatenate(row_kw)
            order = np.argsort(keys, kind="stable")
            keys, kws_ = keys[order], kws_[order]
            d = keys >> _POS_BITS
            sel = (d[1:] == d[:-1]) & (kws_[1:] != kws_[:-1])
            if sel.any():
                gidx = np.searchsorted(udoc, d[1:][sel])
                np.minimum.at(
                    mind, gidx, (keys[1:] - keys[:-1])[sel].astype(np.float64)
                )
        if with_prox and (row_fb or row_key):
            prox = np.log(0.3 + np.exp(-mind))
        else:
            prox = np.full(n, _LN03)

        if mode == "and":
            keep = n_matched == len(terms_kw)
            if not keep.any():
                continue
            udoc_q, bm25_q, match_dim_q, n_matched_q, prox_q = (
                udoc[keep], bm25[keep], match_dim[keep], n_matched[keep], prox[keep]
            )
        else:
            udoc_q, bm25_q, match_dim_q, n_matched_q, prox_q = (
                udoc, bm25, match_dim, n_matched, prox
            )
        total = prox_q + 0.5 * bm25_q + S.MATCH_DIM_WEIGHT * match_dim_q
        top = np.lexsort((udoc_q, -total))[:k]
        yield qid, (
            udoc_q[top], bm25_q[top], match_dim_q[top],
            n_matched_q[top], prox_q[top], total[top],
        )


# Measured on the 20k-doc synthetic index (local[32], best-of-2): batch
# WAND beats unpruned up to ~32 concurrent disjunctive queries (1 query:
# 0.45s vs 0.55s) and loses beyond (~128: 1.15s vs 0.86s) — with hundreds
# of queries sharing a Zipf vocabulary the union of per-query survivors
# covers essentially every block, so nothing is saved on decode and the
# per-query seed+sweep is pure overhead. Above this cap the engine serves
# the batch unpruned (identical results; the pruning is an optimization,
# never a semantic).
PRUNE_MAX_OR_BATCH = 32


def shard_search(
    spark: SparkSession,
    index,
    queries: dict[str, tuple[list[tuple[int, str, float]], str]],
    k: int = S.RANK_K,
    with_prox: bool = True,
    prune: bool = False,
) -> DataFrame:
    """Batch serve over the doc-sharded blocks.

    ``queries``: qid -> ([(kw_idx, term, idf)], mode). Returns
    (qid, rank, doc_id, bm25, match_dim, n_matched_terms, prox, score).

    ``prune=True`` routes the WHOLE workload (any mix of or/and) through
    the shard-local batch block-max WAND (_batch_wand_shard): one sweep,
    per-qid thresholds, each surviving block decoded once — unless the
    workload exceeds PRUNE_MAX_OR_BATCH disjunctive queries, where pruning
    provably saves nothing (see the constant's note) and the batch serves
    unpruned. Without prune, conjunctive-only workloads still get the
    AND-coverage block skip.
    """
    all_terms = sorted({t for kws, _ in queries.values() for _, t, _ in kws})
    if not all_terms:
        return spark.createDataFrame([], "qid string, rank int, " + _OUT_SCHEMA[12:])
    # posting-cache pool (plans/cache.attach_posting_cache): hot block rows
    # live in a broadcast of (pool, bounds) carried on the index handle.
    # Assignment is content-addressed (doc-range containment at attach
    # time); the kernel merges its shard's pool rows ahead of the cold rows
    # — the doc-sharded kernel requires every block of a doc in ONE shard —
    # and VALIDATES the incoming cold rows against the claimed doc bounds,
    # raising on attach-to-query split drift instead of mis-scoring.
    hot_pool = getattr(index, "hot_pool_bc", None)
    term_set = set(all_terms)
    blocks = serving_coalesce(index.doc_blocks, docN=index.docN).filter(F.col("term").isin(all_terms))
    avgdl = index.avgdl
    qitems = [(qid, kws, mode) for qid, (kws, mode) in queries.items()]
    if prune and sum(1 for _, kws, m in qitems if m == "or" and kws) > PRUNE_MAX_OR_BATCH:
        prune = False

    def _frame(qid, res):
        udoc, bm25, match_dim, n_matched, prox, total = res
        return pd.DataFrame(
            {
                "qid": qid,
                "doc_id": udoc,
                "bm25": bm25,
                "match_dim": match_dim,
                "n_matched_terms": n_matched,
                "prox": prox,
                "score": total,
            }
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if hot_pool is not None:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else None
            pool, bounds = hot_pool.value
            pdfs = [pdf for pdf in batches if not pdf.empty]
            iv = bounds.get(pid)  # [lo, hi] doc-id runs this shard owns

            def _in_runs(doc):
                at = np.searchsorted(iv[:, 0], doc, side="right") - 1
                return (at >= 0) & (doc <= iv[np.maximum(at, 0), 1])

            for pdf in pdfs:
                # a block's first/last are actual doc ids of this shard; a
                # block may span several of the shard's runs, so only the
                # endpoints are checked against the run set
                ok = iv is not None and bool(
                    (
                        _in_runs(pdf["first_doc_id"].to_numpy())
                        & _in_runs(pdf["last_doc_id"].to_numpy())
                    ).all()
                )
                if not ok:
                    raise RuntimeError(
                        "posting-cache shard mapping is stale: partition "
                        f"{pid} received doc ids outside its attach-time "
                        "bounds — the serving frame was re-planned under "
                        "different split conf; re-attach the cache"
                    )
            h = pool.get(pid)
            if h is not None:
                import pickle

                # per-shard pickled slice: this task deserializes only its
                # own shard's frame, not the whole pool (plans/cache.py)
                h = pickle.loads(h)
                h = h[h["term"].isin(term_set)]
                if len(h):
                    pdfs = [h, *pdfs]
            batches = iter(pdfs)
        if prune:
            frames = [
                _frame(qid, res)
                for qid, res in _batch_wand_shard(
                    [pdf for pdf in batches if not pdf.empty], qitems, avgdl, k, with_prox
                )
            ]
            if frames:
                yield pd.concat(frames, ignore_index=True)
            return
        decoded = _decode_partition(batches, want_pos=with_prox, qitems=qitems)
        if not decoded:
            return
        frames = [
            _frame(qid, res)
            for qid, res in _batch_score_shard(qitems, decoded, avgdl, k, with_prox)
        ]
        if frames:
            yield pd.concat(frames, ignore_index=True)

    local = blocks.mapInPandas(kernel, _OUT_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "bm25", "match_dim", "n_matched_terms", "prox", "score")
    )


_DF_CACHE_MAX = 1_000_000  # bounded: a hostile query stream cannot grow driver memory


def df_lookup(index, terms: list[str]) -> dict[str, float]:
    """term -> df for ``terms``, through a bounded per-index dictionary cache.

    The reference daemon holds its term dictionary hot across requests
    (Indri's term lookup + indices/postcache.c); the Spark twin is a plain
    dict on the index handle. Only terms not yet seen run the term_stats
    lookup job — a steady-state serving session pays the Spark job once per
    NEW term, not once per query. Absent terms cache as df=0 (the dictionary
    answers "not in vocabulary" without re-probing). The cache clears at
    ``_DF_CACHE_MAX`` entries so driver memory stays bounded at web-scale
    vocabularies; index handles are immutable (merge builds a new one), so
    entries can never go stale.
    """
    cache = getattr(index, "_df_cache", None)
    if cache is None:
        cache = {}
        index._df_cache = cache
    missing = [t for t in terms if t not in cache]
    if missing:
        rows = (
            index.term_stats.filter(F.col("term").isin(missing))
            .select("term", "df")
            .collect()
        )
        got = {r["term"]: float(r["df"]) for r in rows}
        if len(cache) + len(missing) > _DF_CACHE_MAX:
            cache.clear()
        for t in missing:
            cache[t] = got.get(t, 0.0)
    return {t: cache[t] for t in terms}


def resolve_keywords(spark: SparkSession, index, queries: dict[str, tuple[str, str]]):
    """qid -> (qtext, mode)  =>  qid -> ([(kw_idx, term, idf)], mode).

    At most one tiny term_stats lookup for the whole batch (reference
    Q3/Q5), and none at all when every term is already in the index's
    df dictionary cache (``df_lookup``)."""
    from .query import digest_query

    digested = {qid: (digest_query(qtext), mode) for qid, (qtext, mode) in queries.items()}
    all_terms = sorted({t for ts, _ in digested.values() for t in ts})
    if not all_terms:
        return {qid: ([], mode) for qid, (_, mode) in digested.items()}
    dfmap = df_lookup(index, all_terms)
    out = {}
    for qid, (terms, mode) in digested.items():
        kws = [
            (i, t, S.idf(dfmap.get(t, 0.0), float(index.docN)))
            for i, t in enumerate(terms)
        ]
        out[qid] = (kws, mode)
    return out
