"""Budgeted posting cache (reference indices/postcache.c:62-131 role).

The reference forks on-disk posting lists into an in-memory pool until a
byte budget (postcache_set_mem_limit) is exceeded, then serves cached terms
from memory and the rest from disk (search/search.c:48-80). Its selection
walks term_ids in indexing order; we select hottest-df-first instead — the
budget then covers the terms most likely to appear in queries, which
strictly dominates id-order selection for the same budget (documented
deviation).

Spark shape: one pass computes per-term block byte sizes, a cumulative sum
over the df-descending order picks the hot prefix that fits the budget, and
ONLY those blocks are persisted. Cold terms keep streaming from the
columnar store — exactly the reference's memory/disk split. (The global
prefix selection is a single-partition window over vocab-sized rows; at a
10^8-term vocab you would bucket terms by df decile first and cumsum per
bucket — the selection is a one-off at warm-up either way.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_BUDGET = 32 * 1024 * 1024  # postcache.h POSTCACHE_POOL_LIMIT per searchd default


@dataclass
class PostingCache:
    hot_terms: DataFrame  # (term, df, term_bytes, cum_bytes)
    hot_blocks: DataFrame  # persisted block rows of the hot terms
    budget_bytes: int
    bytes_used: int
    n_hot_terms: int
    # broadcast in-memory pool: shard partition id -> pandas frame of that
    # shard's hot block rows (the postcache_pool twin; see served_blocks)
    hot_pool_bc: object = None
    n_shards: int = 0


def _block_bytes() -> F.Column:
    return (
        F.octet_length("doc_ids_blob")
        + F.octet_length("tfs_blob")
        + F.octet_length("doclens_blob")
        + F.octet_length("positions_blob")
        + F.lit(64)  # per-block metadata overhead (struct postcache_item role)
    )


def build_posting_cache(index, budget_bytes: int = DEFAULT_BUDGET) -> PostingCache:
    """Select df-hottest terms until the byte budget fills; persist only
    their blocks. Returns the cache handle (hot_blocks is persisted and
    materialized)."""
    blocks = index.doc_blocks if index.doc_blocks is not None else index.blocks
    sizes = blocks.groupBy("term").agg(F.sum(_block_bytes()).alias("term_bytes"))
    ranked = sizes.join(index.term_stats.select("term", "df"), "term")
    w = Window.orderBy(F.desc("df"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hot = (
        ranked.withColumn("cum_bytes", F.sum("term_bytes").over(w))
        .where(F.col("cum_bytes") <= budget_bytes)
        .select("term", "df", "term_bytes", "cum_bytes")
    )
    hot_terms = hot.persist()
    stats = hot_terms.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.max("cum_bytes"), F.lit(0)).alias("b")
    ).collect()[0]
    hot_blocks = blocks.join(F.broadcast(hot_terms.select("term")), "term").persist()
    hot_blocks.count()
    # Materialize the hot rows into a BROADCAST pool keyed by the shard
    # partition id they came from. This is the reference's in-memory pool
    # (postcache_fork_term_posting): bounded by the byte budget, shipped to
    # every executor once, and merged back into the owning shard's kernel
    # at query time — the doc-sharded serving kernel requires every block
    # of a given doc in ONE shard, so a term-keyed union of hot and cold
    # frames (two different partitionings) would split a doc across shards
    # and mis-score any query mixing hot and cold terms. Keying by
    # spark_partition_id is stable because the parent frame is either
    # persisted (fixed partitions) or a parquet scan (deterministic split
    # planning for the same files + conf).
    stamped = blocks.withColumn("_shard", F.spark_partition_id()).join(
        F.broadcast(hot_terms.select("term")), "term"
    )
    pool_pdf = stamped.toPandas()
    hot_pool = {
        int(s): g.drop(columns=["_shard"]).reset_index(drop=True)
        for s, g in pool_pdf.groupby("_shard")
    }
    sc = blocks.sparkSession.sparkContext
    return PostingCache(
        hot_terms=hot_terms,
        hot_blocks=hot_blocks,
        budget_bytes=budget_bytes,
        bytes_used=int(stats["b"]),
        n_hot_terms=int(stats["n"]),
        hot_pool_bc=sc.broadcast(hot_pool),
        n_shards=blocks.rdd.getNumPartitions(),
    )


def served_blocks(index, cache: PostingCache) -> DataFrame:
    """The serving view (search.c's cached-vs-on-disk posting split):
    COLD blocks stream from the store with the hot terms filtered out
    (narrow plan — the shard partitioning of the parent is preserved);
    the HOT rows ride along as the broadcast pool tagged on the frame,
    which the shard kernel merges back into the owning shard. The result
    plugs into InvertedIndex.doc_blocks unchanged."""
    blocks = index.doc_blocks if index.doc_blocks is not None else index.blocks
    cold = blocks.join(F.broadcast(cache.hot_terms.select("term")), "term", "left_anti")
    cold._postcache_hot_pool = cache.hot_pool_bc
    return cold
