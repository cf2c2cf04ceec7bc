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

Payload routing (round 6, guide §8 "decide with small rows"): the
(url -> doc_id) map is computed over a NARROW url-only frame — the only
exchange in the decision pass carries urls, never text — and re-attaches to
the corpus with a byte-budgeted broadcast hash join, so the big rows are
NOT shuffled at all (the doc_id is a pure function of the url, so the
within-bucket rank needs no payload). When the map exceeds the budget
(web-scale corpora), the former full-row bucket exchange runs instead —
which doubles as the data-derived-layout path: a huge artifact keeps the
property that the same corpus yields the same bucket layout on any cluster.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType

# Broadcasting the (url, doc_id) map costs driver + per-executor memory for
# the built hash relation; above this budget (estimated IN ADVANCE from the
# row count and the boundary sample's mean url length — nothing is collected
# to measure it) the assignment falls back to the full-row bucket exchange.
_IDMAP_BROADCAST_BYTES = int(os.environ.get("SPARK_GRAFT_IDMAP_BROADCAST_MB", "256")) << 20
_IDMAP_ROW_OVERHEAD = 32  # hashed-relation entry overhead per (url, doc_id)


def assign_doc_ids(
    docs: DataFrame,
    order_col: str = "url",
    scale_safe: bool = True,
    docs_per_bucket: int = 8000,
    sample_per_bucket: int = 128,
    broadcast_budget_bytes: int | None = None,
) -> DataFrame:
    """Append a deterministic 1-based ``doc_id`` ordered by ``order_col``.

    Two-phase distributed row_number over DATA-derived buckets:

    1. a column-pruned count sizes a deterministic hash-mod sample of the
       order column (murmur3(v) % p == 0 — a pure function of the data, no
       RNG, no partition-layout dependence); the driver freezes bucket
       boundaries at the sample's order-statistic quantiles;
    2. bucket each url with a vectorized searchsorted over the frozen
       boundaries (a pure function of the row — re-execution, AQE
       re-planning, and speculative tasks all agree);
    3. count urls per bucket, broadcast the cumulative offsets, and rank
       within bucket over the NARROW url frame — (url, doc_id) map;
    4. attach the map to the full rows with a broadcast hash join (byte-
       budgeted; see module docstring) — the payload columns are never
       shuffled. Over budget, the former full-row bucket exchange runs.

    The ``doc_id`` VALUE is identical on every path and at any parallelism
    (global rank by ``order_col``); only the physical output layout differs
    (broadcast: input partitioning, which is doc-disjoint by construction;
    fallback: hash(bucket) partitioning).

    The bucket COUNT is data-derived too — ``ceil(total / docs_per_bucket)``
    (floored at the cluster's parallelism so small corpora still use every
    core, capped at 32768 so driver-side boundary state stays bounded; at
    10^12 docs raise ``docs_per_bucket`` with the cluster). 8000
    docs/bucket is the measured sweet spot of the fused invert+pack stage
    (400k docs, local[16]: 6250/bucket -> 5.96s, 3125 -> 5.20s, 1562 ->
    6.38s; 1M docs, local[16]: 8000/bucket -> 12.5s, 3000 -> 15.2s —
    finer tasks smooth the straggler tail and shrink the per-task term
    table into cache until per-task fixed costs outgrow the win).
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
    # adaptive sample width: enough order statistics per boundary at small
    # bucket counts, and O(n_buckets) driver-side collect volume at large
    # ones (>= 16 samples/boundary once n_buckets passes 32k; boundary
    # placement error grows ~1/sqrt(samples), and bucket-size jitter only
    # costs load-balance smoothness, never correctness — doc_id is the
    # global url rank whatever the boundaries are). The former 4M-value cap
    # collected hundreds of MB of url strings at web scale.
    sample_per_bucket = max(8, min(sample_per_bucket, 524_288 // n_buckets))
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

    # bucket counts straight off the column-pruned source: the aggregate
    # combines map-side and ships only n_buckets partials
    narrow = docs.select(order_col).withColumn("_bkt", bucket_col)
    counts = narrow.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)))
    w = Window.partitionBy("_bkt").orderBy(order_col)

    budget = (
        broadcast_budget_bytes
        if broadcast_budget_bytes is not None
        else _IDMAP_BROADCAST_BYTES
    )
    avg_len = (sum(len(str(v)) for v in vals) / len(vals)) if vals else 64.0
    est_map_bytes = int(total * (avg_len + _IDMAP_ROW_OVERHEAD))
    if est_map_bytes <= budget:
        # guide §8: decide with small rows, never move the big ones — the
        # rank exchange carries ONLY urls (the decision input), and the
        # payload is looked up in place via the broadcast map. Measured
        # (100k synthetic docs, local[32]): assign phase 4.95s with the
        # full-row exchange -> ~1.3s with the url-only map attach.
        mapping = (
            narrow.repartition(n_buckets, "_bkt")
            .join(F.broadcast(offsets.select("_bkt", "_off")), "_bkt")
            .withColumn("doc_id", (F.row_number().over(w) + F.col("_off")).cast("long"))
            .select(order_col, "doc_id")
        )
        # coalesce the payload to the data-derived bucket count BEFORE the
        # lookup: a many-split input (e.g. 128-MB parquet splits) would
        # otherwise flow into the fused pack as many small doc groups,
        # fragmenting posting blocks (~2.5x more block rows for the bench
        # corpus) and taxing every later per-block-row consumer. coalesce
        # merges whole partitions — narrow, doc-disjointness preserved,
        # no-op when the input already has <= n_buckets partitions.
        return docs.coalesce(n_buckets).join(F.broadcast(mapping), order_col)

    # over-budget fallback: the former full-row bucket exchange — one
    # payload shuffle establishing the data-derived bucket layout. The
    # exchange emits n_buckets (4/core) output partitions instead of
    # spark.sql.shuffle.partitions; downstream stages inherit the layout
    # (at 1 task/core a single heavy partition straggles the whole build
    # stage — the fused pack ran 73s at local[32] on the 1/core layout vs
    # 28s on this one, 400k docs).
    bucketed = docs.withColumn("_bkt", bucket_col).repartition(n_buckets, "_bkt")
    return (
        bucketed.join(F.broadcast(offsets.select("_bkt", "_off")), "_bkt")
        .withColumn("doc_id", (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_bkt", "_off")
    )
