"""Deterministic docID assignment (reference I8).

The reference gets sequential uint32 docIDs from Indri in ingestion order and
asserts contiguity (indexer/index.c:242-247; term-index/term-index.h:11).
Ingestion order on a cluster is nondeterministic, so we define the canonical
total order as the url sort (FIXTURES.md) and assign
``row_number() OVER (ORDER BY url)`` — 1-based like Indri, identical at any
parallelism. NEVER ``monotonically_increasing_id`` (partition-layout
dependent => breaks rank-identity across cluster sizes).

Scale note: a single global window would funnel all rows through one task.
The distributed scheme is the standard two-phase rank — bucket the rows,
count per bucket, broadcast cumulative offsets, rank within bucket — with
one hard-won rule: EVERY value must derive from DATA, never from physical
partitioning. An earlier version bucketed by
``repartitionByRange(url) + spark_partition_id()``; Spark documents that
range repartitioning "uses sampling to estimate the ranges [so] the output
may not be consistent", and the offsets subquery and the final join are
separate executions of that exchange — measured at 400k docs: ~5k DUPLICATE
docIDs from drifted boundaries (~20-40 ids at every bucket edge), varying
run to run. The same hazard applies to AQE re-planning and speculative
execution on a real cluster. Here the bucket of a row is a PURE FUNCTION
of its url against boundaries sampled once and frozen driver-side, so
counts, offsets, and ranks agree by construction on every execution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType


def assign_doc_ids(
    docs: DataFrame,
    order_col: str = "url",
    scale_safe: bool = True,
    docs_per_bucket: int = 8000,
    sample_per_bucket: int = 128,
) -> DataFrame:
    """Append a deterministic 1-based ``doc_id`` ordered by ``order_col``.

    Two-phase distributed row_number over DATA-derived buckets:

    1. a column-pruned count sizes a deterministic hash-mod sample of the
       order column (murmur3(v) % p == 0 — a pure function of the data, no
       RNG, no partition-layout dependence); the driver freezes bucket
       boundaries at the sample's order-statistic quantiles;
    2. bucket each row with a vectorized searchsorted over the frozen
       boundaries (a pure function of the row — re-execution, AQE
       re-planning, and speculative tasks all agree);
    3. count rows per bucket, broadcast the cumulative offsets, and add
       them to the within-bucket rank.

    The bucket COUNT is data-derived too — ``ceil(total / docs_per_bucket)``
    (floored at the cluster's parallelism so small corpora still use every
    core, capped at 32768 so driver-side boundary state stays bounded; at
    10^12 docs raise ``docs_per_bucket`` with the cluster). Sizing the
    layout by DATA rather than by core count means the SAME corpus builds
    the SAME artifact — identical bucket boundaries, shard layout, and
    store files — on any cluster size, exactly how Spark itself sizes
    file splits (bytes, not cores), and it makes N-vs-4N scaling runs
    measure one job instead of two differently-shaped ones. 8000
    docs/bucket is the measured sweet spot of the fused invert+pack stage
    (400k docs, local[16]: 6250/bucket -> 5.96s, 3125 -> 5.20s, 1562 ->
    6.38s; 1M docs, local[16]: 8000/bucket -> 12.5s, 3000 -> 15.2s —
    finer tasks smooth the straggler tail and shrink the per-task term
    table into cache until per-task fixed costs outgrow the win).
    Downstream tokenize/pack stages inherit hash(bucket) partitioning —
    partitions own WHOLE buckets (hash never splits a key), preserving the
    doc-disjointness the doc-sharded serving layout requires.
    """
    if not scale_safe:
        w = Window.orderBy(order_col)
        return docs.withColumn("doc_id", F.row_number().over(w).cast("long"))

    spark = docs.sparkSession
    # Boundary sampling is ALL-JVM: a column-pruned count() (on parquet a
    # footer-metadata read, no data scan) sizes a deterministic hash-mod
    # filter — murmur3(url) % p == 0 — whose survivors are the boundary
    # sample. Two whole-stage-codegen scans that combine map-side. The
    # previous flow ran ONE mapInPandas pass instead, and on a 160-split
    # input it cost 6.1s at local[4] vs 0.7s for this (400k docs, cached
    # corpus): every split paid the Python-worker Arrow round-trip just to
    # count rows and slice a few urls. Hash sampling is also the stronger
    # determinism: the sample is a pure function of the DATA (murmur3 is
    # fixed by Spark's spec), independent of partition count or layout,
    # where per-partition systematic sampling varied with the physical
    # split. Boundaries are order statistics of the sample (uniform
    # weights — each survivor represents ~p rows).
    total = docs.select(order_col).count()
    if total == 0:
        return docs.withColumn("doc_id", F.lit(None).cast("long"))
    n_buckets = min(
        max(-(-total // docs_per_bucket), spark.sparkContext.defaultParallelism, 1),
        32768,
    )
    # adaptive sample width: enough order statistics per boundary without
    # ever collecting more than ~4M sampled values at huge bucket counts
    sample_per_bucket = max(8, min(sample_per_bucket, 4_000_000 // n_buckets))
    p = max(1, total // max(1, sample_per_bucket * n_buckets))
    vals = sorted(
        r[0]
        for r in docs.select(order_col)
        .where(F.pmod(F.hash(F.col(order_col)), F.lit(p)) == 0)
        .collect()
    )
    boundaries = sorted({vals[(k * len(vals)) // n_buckets] for k in range(1, n_buckets)}) if vals else []
    if len(boundaries) <= 512:
        # searchsorted(side=right) as a BINARY-SEARCH `when` tree: each row
        # evaluates only the ~log2(n_buckets) comparisons along its path,
        # and total expression size is O(n_buckets) distinct nodes (each
        # boundary appears exactly once — no subtree duplication). The
        # earlier flat comparison-sum evaluated every boundary per row, so
        # per-row work GREW with the core count (n_buckets = 4*cores) and
        # its single giant codegen method cost ~2.5s to JIT per distinct
        # plan — measured at local[16]/400k docs: 3.4s cold / 0.8s warm for
        # the chain vs 0.6-0.9s flat for this tree. (Not a higher-order
        # F.aggregate lambda either: its outer column reference miscompiles
        # under projection pruning in Spark 4.1.) The pandas path below is
        # for boundary lists past the codegen sweet spot.
        def _probe(lo: int, hi: int):
            # bucket index known to lie in [lo, hi); boundaries[i] is the
            # lower edge of bucket i+1 (value >= boundaries[i] => bucket > i)
            if hi - lo == 1:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(
                F.col(order_col) >= F.lit(boundaries[mid - 1]), _probe(mid, hi)
            ).otherwise(_probe(lo, mid))

        bucket_col = _probe(0, len(boundaries) + 1).cast("int")
    else:
        bc = spark.sparkContext.broadcast(boundaries)

        @F.pandas_udf(IntegerType())
        def _bucket(vals: pd.Series) -> pd.Series:
            b = bc.value
            at = np.searchsorted(
                np.asarray(b, dtype=object), vals.to_numpy(), side="right"
            )
            return pd.Series(at.astype(np.int32))

        bucket_col = _bucket(F.col(order_col))

    # Exchange on _bkt at n_buckets granularity BEFORE the window: the
    # window's ClusteredDistribution(_bkt) is then already satisfied, so
    # this is the SAME single shuffle the window would insert — but it
    # emits n_buckets (4/core) output partitions instead of
    # spark.sql.shuffle.partitions (1/core here). Downstream stages
    # (doclen, fused invert+pack) inherit this layout; at 1 task/core a
    # single heavy partition straggles the whole build stage (measured:
    # the fused pack ran 73s at local[32] on the 1/core layout vs 28s on
    # this one, 400k docs).
    with_bkt = docs.withColumn("_bkt", bucket_col)
    bucketed = with_bkt.repartition(n_buckets, "_bkt")
    # bucket counts straight off the (column-pruned) source, NOT off the
    # repartitioned frame: the aggregate combines map-side and ships only
    # n_buckets partials, where the old form paid the FULL-ROW exchange a
    # second time just to count (the broadcast-offsets subtree executes as
    # its own job and shares nothing with the main query's exchange)
    counts = with_bkt.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)))
    w = Window.partitionBy("_bkt").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(offsets.select("_bkt", "_off")), "_bkt")
        .withColumn("doc_id", (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_bkt", "_off")
    )
