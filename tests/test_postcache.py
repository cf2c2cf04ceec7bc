"""Budgeted posting cache (reference indices/postcache.c semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.plans.cache import build_posting_cache, served_blocks


def test_budget_respected_and_hottest_first(spark, index200):
    full_sizes = (
        index200.doc_blocks.groupBy("term")
        .agg(
            F.sum(
                F.octet_length("doc_ids_blob")
                + F.octet_length("tfs_blob")
                + F.octet_length("doclens_blob")
                + F.octet_length("positions_blob")
                + F.lit(64)
            ).alias("term_bytes")
        )
        .join(index200.term_stats.select("term", "df"), "term")
        .collect()
    )
    total = sum(r["term_bytes"] for r in full_sizes)
    budget = total // 3
    cache = build_posting_cache(index200, budget_bytes=budget)

    # 1. the budget is a hard cap
    assert 0 < cache.bytes_used <= budget
    # 2. selection is the df-descending prefix (ties broken by term asc)
    order = sorted(full_sizes, key=lambda r: (-r["df"], r["term"]))
    expect, acc = [], 0
    for r in order:
        if acc + r["term_bytes"] > budget:
            break
        acc += r["term_bytes"]
        expect.append(r["term"])
    got = [r["term"] for r in cache.hot_terms.orderBy("cum_bytes").collect()]
    assert got == expect
    assert cache.n_hot_terms == len(expect)
    # 3. cold frame + broadcast pool cover exactly the full block set
    pool_rows = sum(len(v) for v in cache.hot_pool_bc.value.values())
    assert served_blocks(index200, cache).count() + pool_rows == index200.doc_blocks.count()
    assert pool_rows > 0
    cache.hot_blocks.unpersist()
    cache.hot_terms.unpersist()


def test_zero_budget_caches_nothing(spark, index200):
    cache = build_posting_cache(index200, budget_bytes=0)
    assert cache.n_hot_terms == 0 and cache.bytes_used == 0
    assert served_blocks(index200, cache).count() == index200.doc_blocks.count()
    assert sum(len(v) for v in cache.hot_pool_bc.value.values()) == 0
    cache.hot_blocks.unpersist()
    cache.hot_terms.unpersist()


def test_mixed_hot_cold_query_identical(spark, index200):
    """THE split case: a query with one cached (hot) and one streamed
    (cold) term must score identically to plain serving. The doc-sharded
    kernel needs every doc's blocks in one shard — the broadcast pool
    merges hot rows back into the owning shard (a term-keyed union of two
    differently-partitioned frames would split docs and mis-score)."""
    import dataclasses

    from search_engine_spark.plans.query import search

    sizes = (
        index200.doc_blocks.groupBy("term")
        .agg(
            F.sum(
                F.octet_length("doc_ids_blob")
                + F.octet_length("tfs_blob")
                + F.octet_length("doclens_blob")
                + F.octet_length("positions_blob")
                + F.lit(64)
            ).alias("term_bytes")
        )
        .join(index200.term_stats.select("term", "df"), "term")
        .collect()
    )
    order = sorted(sizes, key=lambda r: (-r["df"], r["term"]))
    cache = build_posting_cache(index200, budget_bytes=order[0]["term_bytes"])
    hot = {r["term"] for r in cache.hot_terms.collect()}
    assert hot, "budget must cache at least the hottest term"
    hot_term = order[0]["term"]
    cold_term = next(r["term"] for r in order if r["term"] not in hot)
    q = f"{hot_term} {cold_term}"

    warm_idx = dataclasses.replace(
        index200, doc_blocks=served_blocks(index200, cache)
    )
    plain = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(spark, index200, q).collect()
    ]
    warm = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(spark, warm_idx, q).collect()
    ]
    assert warm == plain
    cache.hot_blocks.unpersist()
    cache.hot_terms.unpersist()
