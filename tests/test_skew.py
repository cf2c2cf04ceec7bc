"""Build-side skew evidence (north rule: skew handled explicitly).

Two pathologies a web corpus throws at a distributed index build:
- URL skew: most urls share one long hot prefix (a single crawled host),
  which breaks naive fixed-width range partitioning — assign_doc_ids
  samples the actual url distribution, so buckets stay balanced;
- term skew: a stopword occurs in EVERY document. The fused build never
  shuffles by term (blocks pack inside each doc shard), so no reducer
  owns the stopword — its posting blocks stay spread across partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.plans.build import build_index


@pytest.fixture(scope="module")
def skewed_index(spark):
    n = 3000
    # 90% of urls under ONE hot host prefix, 10% spread; every doc carries
    # the stopword 'thecommon' plus a per-doc rare word
    corpus = spark.range(n).select(
        F.when(
            F.col("id") % 10 != 0,
            F.format_string("https://hot.example/deep/long/shared/prefix/p%08d", "id"),
        )
        .otherwise(F.format_string("https://site%04d.example/x", "id"))
        .alias("url"),
        F.format_string(
            "title %d\n\nthecommon alpha beta rare%s thecommon", "id",
            # letter-only per-doc rare suffix: digits would tokenize away
            # ([a-zA-Z]+ lexer) and make doclen vary between docs
            F.translate(
                F.conv(F.col("id").cast("string"), 10, 26),
                "0123456789", "qrstuvwxyz",
            ),
        ).alias("text"),
    ).cache()
    return build_index(spark, corpus), n


def test_doc_ids_exact_despite_url_skew(spark, skewed_index):
    idx, n = skewed_index
    ids = [r["doc_id"] for r in idx.doc_meta.select("doc_id").collect()]
    assert sorted(ids) == list(range(1, n + 1))


def test_block_rows_balanced_despite_skew(spark, skewed_index):
    idx, n = skewed_index
    sizes = [
        r["c"]
        for r in idx.doc_blocks.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert len(sizes) >= 2
    # no partition owns a disproportionate share of the posting blocks
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes)), sizes


def test_stopword_blocks_spread_across_partitions(spark, skewed_index):
    idx, n = skewed_index
    parts = (
        idx.doc_blocks.where(F.col("term") == "thecommon")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    total = idx.doc_blocks.select(F.spark_partition_id()).distinct().count()
    # the corpus-wide stopword's blocks live in EVERY doc shard — never a
    # single term-keyed reducer
    assert parts == total and parts >= 2


def test_stopword_query_serves_correctly(spark, skewed_index):
    from search_engine_spark.plans.query import search

    idx, n = skewed_index
    got = search(spark, idx, "thecommon", mode="or").collect()
    assert len(got) == 155  # rank volume cap; every doc matches
    # identical tf/doclen everywhere => identical scores; ties break doc asc
    assert [r["doc_id"] for r in got] == list(range(1, 156))
