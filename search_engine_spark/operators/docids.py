"""Deterministic docID assignment (reference I8).

The reference gets sequential uint32 docIDs from Indri in ingestion order and
asserts contiguity (indexer/index.c:242-247; term-index/term-index.h:11).
Ingestion order on a cluster is nondeterministic, so we define the canonical
total order as the url sort (FIXTURES.md) and assign
``row_number() OVER (ORDER BY url)`` — 1-based like Indri, identical at any
parallelism. NEVER ``monotonically_increasing_id`` (partition-layout
dependent => breaks rank-identity across cluster sizes).

Scale note: a single global window would funnel all rows through one task.
``row_number`` over an un-partitioned window is exactly that, so for web
scale we use the standard two-phase trick: sort-partition by url range, count
rows per partition, broadcast the per-partition offsets, and add the offset
to the within-partition row number. Equivalent output, no single-task
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_doc_ids(docs: DataFrame, order_col: str = "url", scale_safe: bool = True) -> DataFrame:
    """Append a deterministic 1-based ``doc_id`` ordered by ``order_col``."""
    if not scale_safe:
        w = Window.orderBy(order_col)
        return docs.withColumn("doc_id", F.row_number().over(w))

    # Two-phase distributed row_number: range-partition by the order column,
    # then window within partition and add broadcasted partition offsets.
    # 4 partitions per core: downstream tokenize/pack stages inherit this
    # partitioning, and one-task-per-core lets a single heavy range
    # straggle the whole stage (measured 17s -> 3.5s on the invert stage at
    # local[32], 200k docs). Offsets make doc_ids identical at ANY count.
    part = docs.repartitionByRange(
        4 * docs.sparkSession.sparkContext.defaultParallelism, order_col
    )
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col)
    numbered = with_pid.withColumn("_rn", F.row_number().over(w))
    counts = numbered.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)))
    return (
        numbered.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn("doc_id", (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
