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
    # 3. hot + cold serving view covers exactly the full block set
    assert served_blocks(index200, cache).count() == index200.doc_blocks.count()
    cache.hot_blocks.unpersist()
    cache.hot_terms.unpersist()


def test_zero_budget_caches_nothing(spark, index200):
    cache = build_posting_cache(index200, budget_bytes=0)
    assert cache.n_hot_terms == 0 and cache.bytes_used == 0
    assert served_blocks(index200, cache).count() == index200.doc_blocks.count()
    cache.hot_blocks.unpersist()
    cache.hot_terms.unpersist()
