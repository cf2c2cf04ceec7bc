"""End-to-end index build (reference indexer/ + indices/ roles).

corpus (url, warc_ts, html, text, lang)
  -> doc_ids     (url, doc_id)                       [I8]
  -> tokens      (doc_id, pos, term)                 [I2/I4/I5/I7]
  -> postings    (term, doc_id, tf, positions)       [I9, tf cap Q10]
  -> doc_meta    (doc_id, doclen), stats             [I10]
  -> term_stats  (term, df, cf)                      [I10]
  -> blocks      (delta+varbyte, block-max)          [I11-I13]
  -> docstore    (doc_id, url, text)                 [I15; Parquet/Iceberg
                  column compression replaces the reference's gzip blobs I14]

Dataflow shape on a cluster (cf. SURVEY §3.1): tokenize is narrow; shuffle 1
= groupBy(term, doc_id) posting aggregation (doc_id in the key kills term
skew); shuffle 2 = range partition by (term, doc_id) for block packing; all
writes are partitioned table writes. With Iceberg available the writer
targets an Iceberg table (see sources/tables.py); in this sandbox we write
Parquet directories with the same layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.tokenizer import inverted_frame
from ..operators import postings as P
from ..operators.blocks import DEFAULT_BLOCK, pack_blocks
from ..operators.docids import assign_doc_ids
from ..sources.tables import read_table, write_table


@dataclass
class InvertedIndex:
    """Umbrella handle over the index tables (reference indices/indices.c)."""

    postings: DataFrame  # uncompressed posting rows (term, doc_id, tf, positions, doclen)
    blocks: DataFrame  # packed posting blocks, term-range layout
    doc_meta: DataFrame  # (doc_id, doclen)
    term_stats: DataFrame  # (term, df, cf)
    docstore: DataFrame  # (doc_id, url, text)
    docN: int
    avgdl: float
    doc_blocks: DataFrame | None = None  # packed blocks, doc-sharded layout (serving)
    # posting-cache pool broadcast (pool, bounds) set by
    # plans.cache.attach_posting_cache; carried on the index handle (NOT on
    # a DataFrame attribute, which silently vanishes under any transform)
    hot_pool_bc: object = None

    def cache(self) -> "InvertedIndex":
        """Warm the serving path (reference postcache role, indices/postcache.c)."""
        self.blocks.cache()
        self.term_stats.cache()
        return self


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    block: int = DEFAULT_BLOCK,
    id_col: str | None = None,
    keep_row_postings: bool = True,
    persist: bool = True,
    term_layout_blocks: bool = False,
    fused: bool = True,
) -> InvertedIndex:
    """Build all index tables from a corpus DataFrame.

    ``id_col``: use an existing stable id column instead of assigning
    row_number-over-url docIDs (any stable total order preserves the
    reference's semantics; the default matches FIXTURES.md).

    ``fused`` (default): tokenize -> invert -> block-pack run as ONE
    map-side Arrow stage (invert_pack_blocks) after a cheap doclen
    pre-pass supplies avgdl/docN; per-posting rows never cross the
    Python->JVM boundary (at 400k docs that transfer + its cache cost
    more than half the build). term_stats derives from block metadata.
    ``fused=False`` keeps the two-stage pipeline that materializes the
    inverted posting rows (required for ``term_layout_blocks``).

    ``persist``: cache the frames consumed by several downstream actions;
    without it every action re-runs tokenization. On a real cluster this
    is the Indri-buffer analogue: materialize each boundary once.
    """
    from ..functions.tokenizer import doclen_frame
    from ..operators.blocks import invert_pack_blocks, term_stats_from_blocks, unpack_blocks

    if id_col is None:
        docs = assign_doc_ids(corpus, "url")
    else:
        docs = corpus.withColumn("doc_id", F.col(id_col).cast("long"))

    docs = docs.select("doc_id", "url", "text")
    if fused and not term_layout_blocks:
        if persist:
            # feeds the doclen pass, the fused pack AND the docstore
            docs = docs.persist()
        dmeta = doclen_frame(docs)
        if persist:
            dmeta = dmeta.persist()
        stats = P.collection_stats(dmeta)
        # docIDs from url-range partitioning leave the corpus doc-range
        # partitioned -> the serving layout needs no exchange at all
        doc_blocks = invert_pack_blocks(
            docs, stats["avgdl"], block=block,
            assume_doc_partitioned=(id_col is None),
        )
        if persist:
            doc_blocks = doc_blocks.persist()
        tstats = term_stats_from_blocks(doc_blocks)
        return InvertedIndex(
            postings=unpack_blocks(doc_blocks) if keep_row_postings else None,
            blocks=doc_blocks,
            doc_meta=dmeta,
            term_stats=tstats,
            docstore=docs.select("doc_id", "url", "text"),
            docN=stats["docN"],
            avgdl=stats["avgdl"],
            doc_blocks=doc_blocks,
        )

    # unfused path: materialize inverted posting rows (also the source for
    # the optional term-clustered layout, which needs a (term, doc_id)
    # exchange over per-posting rows)
    rows_dl = inverted_frame(docs)
    dmeta = P.doc_meta_from_inverted(rows_dl, docs)
    if persist:
        rows_dl = rows_dl.persist()
        dmeta = dmeta.persist()
    stats = P.collection_stats(dmeta)
    tstats = P.term_stats(rows_dl)
    doc_blocks = pack_blocks(
        rows_dl, stats["avgdl"], block=block, layout="doc",
        assume_doc_partitioned=(id_col is None),
    )
    blocks = (
        pack_blocks(rows_dl, stats["avgdl"], block=block)
        if term_layout_blocks
        else doc_blocks
    )
    docstore = docs.select("doc_id", "url", "text")

    return InvertedIndex(
        # row-level postings view (positions as array<int>) decodes from the
        # packed blocks on demand; the raw inverted rows carry varbyte bytes
        postings=unpack_blocks(blocks) if keep_row_postings else None,
        blocks=blocks,
        doc_meta=dmeta,
        term_stats=tstats,
        docstore=docstore,
        docN=stats["docN"],
        avgdl=stats["avgdl"],
        doc_blocks=doc_blocks,
    )


def save_index(index: InvertedIndex, path: str) -> None:
    """Persist index tables (Parquet dirs; Iceberg when a catalog is up).

    ``doc_blocks`` carries an explicit ``_shard`` column (the writing
    partition id): a raw parquet re-read splits big files at row-group
    boundaries, which can land ONE document's blocks in TWO partitions and
    silently break the doc-sharded serving invariant (observed at 400k
    docs: >128MB files + default maxPartitionBytes). load_index restores
    the layout by hash-repartitioning on ``_shard`` — hashing never splits
    a shard value, and merging whole shards preserves doc disjointness.
    """
    write_table(index.blocks, f"{path}/blocks", partition_cols=None)
    if index.doc_blocks is not None:
        write_table(
            index.doc_blocks.withColumn("_shard", F.spark_partition_id()),
            f"{path}/doc_blocks",
        )
    write_table(index.doc_meta, f"{path}/doc_meta")
    write_table(index.term_stats, f"{path}/term_stats")
    write_table(index.docstore, f"{path}/docstore")
    spark = index.blocks.sparkSession
    spark.createDataFrame(
        [(index.docN, float(index.avgdl))], "docN long, avgdl double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def load_index(spark: SparkSession, path: str, with_row_postings: bool = False) -> InvertedIndex:
    from ..operators.blocks import unpack_blocks

    import os

    blocks = read_table(spark, f"{path}/blocks")
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    doc_blocks = None
    if os.path.exists(f"{path}/doc_blocks"):
        doc_blocks = read_table(spark, f"{path}/doc_blocks")
        if "_shard" in doc_blocks.columns:
            # The serving invariant is only that every doc's blocks land in
            # ONE partition. A parquet split never crosses a FILE boundary:
            # splits either take a whole small file (or several — merging
            # whole shards is invariant-preserving) or carve a big file at
            # row-group boundaries (invariant-BREAKING: observed at 400k
            # docs, >128MB files put one doc's blocks in two partitions).
            # So when every written file fits in one split, serve straight
            # off the scan — the cold path then has NO per-query exchange —
            # and only repartition by the writing shard id when some file
            # is big enough to be carved.
            try:
                biggest = max(
                    (
                        os.path.getsize(os.path.join(f"{path}/doc_blocks", f))
                        for f in os.listdir(f"{path}/doc_blocks")
                        if f.endswith(".parquet")
                    ),
                    default=0,
                )
            except OSError:
                biggest = None
            max_split = int(
                str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
                .lower().rstrip("b")
            )
            if biggest is not None and biggest <= max_split:
                doc_blocks = doc_blocks.drop("_shard")
            else:
                n = spark.sparkContext.defaultParallelism * 4
                doc_blocks = doc_blocks.repartition(n, "_shard").drop("_shard")
    return InvertedIndex(
        postings=unpack_blocks(blocks) if with_row_postings else None,
        blocks=blocks,
        doc_meta=read_table(spark, f"{path}/doc_meta"),
        term_stats=read_table(spark, f"{path}/term_stats"),
        docstore=read_table(spark, f"{path}/docstore"),
        docN=int(stats["docN"]),
        avgdl=float(stats["avgdl"]),
        doc_blocks=doc_blocks,
    )


def merge_indexes(
    left: InvertedIndex,
    right: InvertedIndex,
    block: int = DEFAULT_BLOCK,
    persist: bool = True,
    validate: bool = True,
) -> InvertedIndex:
    """Merge two indexes built over DISJOINT docID sets into one.

    The reference's ``repo.write(); repo.merge()`` maintain step
    (indexer/index.c:188-196, term-index/term-index.cpp:94-101) folds an
    in-memory Indri segment into the on-disk repository; the set-oriented
    twin is: union the decoded posting rows and REBUILD every global
    derivative. A merge is NOT just a union — docN/avgdl change, df/cf
    re-aggregate across both sides, and the per-block max-BM25 metadata
    baked into the packed blocks depends on the merged avgdl, so blocks
    are repacked. Scale: one union + the standard pack shuffle; no driver
    data movement.

    ``validate``: assert docID disjointness with a semi-join probe (one
    tiny job; disable on trusted inputs at scale).
    """
    if validate:
        overlap = (
            left.doc_meta.select("doc_id")
            .join(right.doc_meta.select("doc_id"), "doc_id", "left_semi")
            .limit(1)
            .count()
        )
        if overlap:
            raise ValueError("merge_indexes: docID sets overlap")
    from ..operators.blocks import reencode_pos_vb, unpack_blocks

    cols = ["term", "doc_id", "tf", "doclen", "positions"]
    # an index built with keep_row_postings=False carries postings=None —
    # decode its packed blocks on demand instead of crashing
    lrows = left.postings if left.postings is not None else unpack_blocks(left.blocks)
    rrows = right.postings if right.postings is not None else unpack_blocks(right.blocks)
    rows = reencode_pos_vb(lrows.select(*cols).unionByName(rrows.select(*cols)))
    dmeta = left.doc_meta.unionByName(right.doc_meta.select(*left.doc_meta.columns))
    if persist:
        rows = rows.persist()
        dmeta = dmeta.persist()
    stats = P.collection_stats(dmeta)
    tstats = P.term_stats(rows.select("term", "doc_id", "tf"))
    doc_blocks = pack_blocks(rows, stats["avgdl"], block=block, layout="doc")

    return InvertedIndex(
        postings=unpack_blocks(doc_blocks),
        blocks=doc_blocks,
        doc_meta=dmeta,
        term_stats=tstats,
        docstore=left.docstore.unionByName(right.docstore),
        docN=stats["docN"],
        avgdl=stats["avgdl"],
        doc_blocks=doc_blocks,
    )
