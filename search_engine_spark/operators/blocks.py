"""Posting blocks: delta+varbyte packed, with block-max metadata.

Plays the role of the reference's mem-index posting blocks + skip list
(mem-index/mem-posting.c:100-185 flushes ~12KB blocks keyed by first docID;
mem-index/skippy.h:62-148 jump(target) descends to the furthest node with
key <= target). In Spark the "skip" is the min/max block predicate: an AND
merge filters blocks on ``last_doc_id >= target`` / ``first_doc_id <=
bound`` and never decodes pruned blocks. The extra ``block_max_tfn`` column
(max BM25 tf-normalization inside the block) is the block-max metadata that
enables WAND pruning (north rule; cf. Ding & Suel, "Faster Top-k Document
Retrieval Using Block-Max Indexes", SIGIR'11).

Layout per block row:
  term STRING, first_doc_id LONG, last_doc_id LONG, n INT,
  doc_ids_blob BINARY (delta+varbyte), tfs_blob BINARY (varbyte),
  doclens_blob BINARY (varbyte; denormalized so scoring never joins
  doc_meta at query time), positions_blob BINARY (varbyte, concatenated;
  per-entry lengths == tf), block_max_tfn FLOAT.

Scale notes: packing runs after ``repartitionByRange(term, doc_id)`` +
``sortWithinPartitions`` — a hot term's posting list is *split across
partitions* (each yielding its own block run), so no reducer ever owns a
stopword's full 10^11-entry list. Packing itself is streaming per Arrow
batch: a term spanning batches just produces one extra partial block, which
the query path merges transparently.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import codec
from .scoring import tf_norm_np

DEFAULT_BLOCK = 512  # posting entries per block (reference: ~12KB blocks, mem-index/config.h:12-16)

BLOCK_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("n", IntegerType(), False),
        StructField("doc_ids_blob", BinaryType(), False),
        StructField("tfs_blob", BinaryType(), False),
        StructField("doclens_blob", BinaryType(), False),
        StructField("positions_blob", BinaryType(), False),
        StructField("block_max_tfn", FloatType(), False),
    ]
)

UNPACKED_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("doclen", IntegerType(), False),
        StructField("positions", ArrayType(IntegerType()), False),
    ]
)


def _pack_group(term: str, doc_ids, tfs, doclens, pos_bytes, pos_boff, avgdl: float, block: int):
    """Pack one term's (sorted) run of posting entries into block rows.

    ``pos_bytes``/``pos_boff``: the batch's flat pre-encoded varbyte
    position stream + per-entry byte offsets — the block's positions_blob
    is a pure byte slice (varbyte is self-delimiting; per-entry value
    counts are the stored tfs).
    """
    n = len(doc_ids)
    for s in range(0, n, block):
        e = min(s + block, n)
        ids = doc_ids[s:e].astype(np.uint64)
        tf = tfs[s:e].astype(np.uint64)
        dl = doclens[s:e].astype(np.uint64)
        bmt = float(tf_norm_np(tf.astype(np.float32), dl.astype(np.float32), avgdl).max())
        yield {
            "term": term,
            "first_doc_id": int(ids[0]),
            "last_doc_id": int(ids[-1]),
            "n": int(e - s),
            "doc_ids_blob": codec.encode_ids(ids),
            "tfs_blob": codec.vb_encode(tf),
            "doclens_blob": codec.vb_encode(dl),
            "positions_blob": pos_bytes[pos_boff[s] : pos_boff[e]].tobytes(),
            "block_max_tfn": bmt,
        }


def pack_blocks(
    postings_with_doclen: DataFrame,
    avgdl: float,
    block: int = DEFAULT_BLOCK,
    num_partitions: int | None = None,
    layout: str = "term",
    assume_doc_partitioned: bool = False,
) -> DataFrame:
    """(term, doc_id, tf, positions, doclen) -> packed block rows.

    ``layout``:
    - "term": range-partition on (term, doc_id) — co-locates each term's
      posting run (split across partitions for skewed terms); the layout
      for WAND metadata sweeps and bulk analytics over posting lists.
    - "doc": range-partition on doc_id ONLY — every term of a given doc
      lives in the same shard. This is the classic document-sharded
      serving layout: a query becomes a narrow per-shard DAAT kernel with
      local top-k and a tiny global merge — ZERO shuffle per query
      (plans/serve.py). Real-world distributed engines (incl. the
      reference behind a sharding proxy) serve this way.
    """
    sc = postings_with_doclen.sparkSession.sparkContext
    # 4 partitions per core: smaller per-task sorts pipeline better and stay
    # in execution memory (measured 23s -> 14s at local[32], 23M rows)
    nparts = num_partitions or 4 * sc.defaultParallelism
    if layout == "doc":
        if assume_doc_partitioned:
            # inverted rows inherit the corpus's doc-range partitioning
            # (assign_doc_ids range-partitions by url == doc order; the
            # tokenizer is narrow) — reuse it: sort within partitions only,
            # NO exchange at all for the serving layout
            arranged = postings_with_doclen.sortWithinPartitions("term", "doc_id")
        else:
            arranged = postings_with_doclen.repartitionByRange(
                nparts, "doc_id"
            ).sortWithinPartitions("term", "doc_id")
    else:
        arranged = postings_with_doclen.repartitionByRange(
            nparts, "term", "doc_id"
        ).sortWithinPartitions("term", "doc_id")

    def pack(batches) -> Iterator["pa.RecordBatch"]:
        # mapInArrow: the positions list column is consumed through its flat
        # values buffer + offsets — NO per-row Python objects for the 10^7
        # posting entries, only per-BLOCK work (codec calls on numpy slices).
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
            tdict = pc.dictionary_encode(cols["term"])
            tidx = tdict.indices.to_numpy().astype(np.int64)
            vocab = tdict.dictionary.to_pylist()
            doc_ids = cols["doc_id"].to_numpy()
            tfs = cols["tf"].to_numpy().astype(np.int64)
            dls = cols["doclen"].to_numpy().astype(np.int64)
            pvb = cols["pos_vb"]
            # BinaryArray flat buffers: [validity, int32 offsets, data]
            bufs = pvb.buffers()
            raw_off = np.frombuffer(bufs[1], dtype=np.int32)
            pos_boff = raw_off[pvb.offset : pvb.offset + len(pvb) + 1].astype(np.int64)
            pos_bytes = np.frombuffer(bufs[2], dtype=np.uint8)
            rows: list[dict] = []
            bounds = np.flatnonzero(np.r_[True, tidx[1:] != tidx[:-1], True])
            for i in range(len(bounds) - 1):
                s, e = bounds[i], bounds[i + 1]
                rows.extend(
                    _pack_group(
                        vocab[tidx[s]], doc_ids[s:e], tfs[s:e], dls[s:e],
                        pos_bytes, pos_boff[s : e + 1],
                        avgdl, block,
                    )
                )
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=pa.schema(
                    [
                        ("term", pa.string()),
                        ("first_doc_id", pa.int64()),
                        ("last_doc_id", pa.int64()),
                        ("n", pa.int32()),
                        ("doc_ids_blob", pa.binary()),
                        ("tfs_blob", pa.binary()),
                        ("doclens_blob", pa.binary()),
                        ("positions_blob", pa.binary()),
                        ("block_max_tfn", pa.float32()),
                    ]
                ))

    return arranged.mapInArrow(pack, BLOCK_SCHEMA)


def unpack_blocks(blocks: DataFrame, with_positions: bool = True) -> DataFrame:
    """Packed block rows -> (term, doc_id, tf, doclen, positions)."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"term": [], "doc_id": [], "tf": [], "doclen": [], "positions": []}
            for row in pdf.itertuples(index=False):
                ids = codec.decode_ids(row.doc_ids_blob).astype(np.int64)
                tfs = codec.vb_decode(row.tfs_blob).astype(np.int32)
                dls = codec.vb_decode(row.doclens_blob).astype(np.int32)
                out["term"].append(np.repeat(row.term, len(ids)))
                out["doc_id"].append(ids)
                out["tf"].append(tfs)
                out["doclen"].append(dls)
                if with_positions:
                    pos = codec.vb_decode(row.positions_blob).astype(np.int32)
                    out["positions"].extend(np.split(pos, np.cumsum(tfs))[:-1])
                else:
                    out["positions"].extend([np.empty(0, dtype=np.int32)] * len(ids))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(out["term"]),
                    "doc_id": np.concatenate(out["doc_id"]),
                    "tf": np.concatenate(out["tf"]),
                    "doclen": np.concatenate(out["doclen"]),
                    "positions": out["positions"],
                }
            )

    return blocks.mapInPandas(unpack, UNPACKED_SCHEMA)


def block_meta(blocks: DataFrame) -> DataFrame:
    """Metadata-only projection used for WAND pruning / block skipping."""
    return blocks.select("term", "first_doc_id", "last_doc_id", "n", "block_max_tfn")


def reencode_pos_vb(rows: DataFrame) -> DataFrame:
    """Decoded posting view (term, doc_id, tf, doclen, positions:array<int>)
    -> the pack-input shape (INVERT_SCHEMA: doc_id, term, tf, pos_vb,
    doclen) with positions re-encoded as one varbyte stream per row.

    The inverse of :func:`unpack_blocks`' position decode; used by index
    MERGE, which unions two decoded posting views and must feed
    :func:`pack_blocks` (whose kernel consumes pre-encoded ``pos_vb``
    bytes). Arrow-batched: ONE vb_encode over the batch's flat position
    values, per-row byte offsets from vectorized per-value lengths — no
    per-row Python.
    """
    from ..functions.tokenizer import INVERT_SCHEMA

    def reenc(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("term", pa.string()),
                ("tf", pa.int32()),
                ("pos_vb", pa.binary()),
                ("doclen", pa.int32()),
            ]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            col = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
            pos = col["positions"]
            flat = pos.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            row_lens = pc.list_value_length(pos).to_numpy().astype(np.int64)
            pos_bytes = codec.vb_encode(flat)
            blens = codec.vb_lengths(flat)
            val_off = np.zeros(len(row_lens) + 1, dtype=np.int64)
            np.cumsum(row_lens, out=val_off[1:])
            byte_cum = np.zeros(len(flat) + 1, dtype=np.int64)
            np.cumsum(blens, out=byte_cum[1:])
            entry_byte_off = byte_cum[val_off].astype(np.int32)
            pos_vb = pa.Array.from_buffers(
                pa.binary(),
                batch.num_rows,
                [None, pa.py_buffer(entry_byte_off.tobytes()), pa.py_buffer(pos_bytes)],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(col["doc_id"], pa.int64()),
                    pc.cast(col["term"], pa.string()),
                    pc.cast(col["tf"], pa.int32()),
                    pos_vb,
                    pc.cast(col["doclen"], pa.int32()),
                ],
                schema=out_schema,
            )

    return rows.mapInArrow(reenc, INVERT_SCHEMA)


def invert_pack_blocks(
    docs: DataFrame,
    avgdl: float,
    block: int = DEFAULT_BLOCK,
    tf_cap: int = 2048,
    num_partitions: int | None = None,
    assume_doc_partitioned: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """FUSED tokenize -> document inversion -> block pack: corpus rows in,
    packed doc-layout posting blocks out, ONE map-side Arrow stage.

    Why fused: the unfused pipeline materializes ~50 posting rows per doc
    through the Python->JVM Arrow boundary and caches them before the pack
    kernel reads them all back. At 400k docs the row transfer + cache cost
    ~45s of a 75s local[32] build while the tokenizer kernel itself is ~3s.
    This stage ships only the packed blocks (~40x fewer rows, varbyte
    blobs), which is also the 10^12-doc shape: nothing per-posting ever
    leaves the executor.

    Needs ``avgdl`` up front (per-block max-score metadata); build_index
    obtains it from the cheap ``doclen_frame`` pre-pass. Semantics match
    inverted_frame + pack_blocks(layout="doc") exactly: same tokenizer,
    same tf cap (2048 + position slice), same block packing; only the
    block boundaries may differ (per Arrow batch rather than per cached
    partition), which no consumer observes (doc runs within a term stay
    sorted; WAND metadata is per-block).
    """
    from ..functions.tokenizer import tokenize_text

    sc = docs.sparkSession.sparkContext
    nparts = num_partitions or 4 * sc.defaultParallelism
    base = docs.select("doc_id", text_col)
    if assume_doc_partitioned:
        # docIDs were assigned by url-range partitioning: partitions are
        # already doc ranges; just order within them
        arranged = base.sortWithinPartitions("doc_id")
    else:
        arranged = base.repartitionByRange(nparts, "doc_id").sortWithinPartitions(
            "doc_id"
        )

    def fused(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("term", pa.string()),
                ("first_doc_id", pa.int64()),
                ("last_doc_id", pa.int64()),
                ("n", pa.int32()),
                ("doc_ids_blob", pa.binary()),
                ("tfs_blob", pa.binary()),
                ("doclens_blob", pa.binary()),
                ("positions_blob", pa.binary()),
                ("block_max_tfn", pa.float32()),
            ]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            doc_ids = batch.column(0).to_numpy()
            texts = batch.column(1).to_pylist()
            tok_lists = [tokenize_text(t) if isinstance(t, str) else [] for t in texts]
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            total = int(lens.sum())
            if total == 0:
                continue
            flat = pa.array([t for toks in tok_lists for t in toks], type=pa.string())
            d = flat.dictionary_encode()
            tidx = d.indices.to_numpy().astype(np.int64)
            vocab = d.dictionary.to_pylist()
            doc_rep = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            pos = np.arange(total, dtype=np.int64) - starts[doc_rep]
            # sort by (term, doc, pos): term runs contiguous, docs ascending
            # within each run (input rows are doc_id-sorted), positions
            # ascending within each entry
            order = np.lexsort((pos, doc_rep, tidx))
            gt, gd, gp = tidx[order], doc_rep[order], pos[order]
            newgrp = np.r_[True, (gt[1:] != gt[:-1]) | (gd[1:] != gd[:-1])]
            gstart = np.flatnonzero(newgrp)
            gend = np.r_[gstart[1:], total]
            raw_tf = gend - gstart
            tf = np.minimum(raw_tf, tf_cap).astype(np.int64)
            # keep only the first tf positions of each entry (the 2048 cap)
            grp_id = np.cumsum(newgrp) - 1
            within = np.arange(total, dtype=np.int64) - gstart[grp_id]
            keep = within < tf[grp_id]
            pos_vals = gp[keep].astype(np.uint64)
            pos_bytes = np.frombuffer(codec.vb_encode(pos_vals), dtype=np.uint8)
            blens = codec.vb_lengths(pos_vals)
            byte_cum = np.zeros(len(pos_vals) + 1, dtype=np.int64)
            np.cumsum(blens, out=byte_cum[1:])
            val_off = np.zeros(len(tf) + 1, dtype=np.int64)
            np.cumsum(tf, out=val_off[1:])
            entry_boff = byte_cum[val_off]
            e_term = gt[gstart]
            e_doc = doc_ids[gd[gstart]].astype(np.int64)
            e_dl = lens[gd[gstart]]
            rows: list[dict] = []
            runs = np.flatnonzero(np.r_[True, e_term[1:] != e_term[:-1], True])
            for i in range(len(runs) - 1):
                s, e = runs[i], runs[i + 1]
                rows.extend(
                    _pack_group(
                        vocab[e_term[s]], e_doc[s:e], tf[s:e], e_dl[s:e],
                        pos_bytes, entry_boff[s : e + 1],
                        avgdl, block,
                    )
                )
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return arranged.mapInArrow(fused, BLOCK_SCHEMA)


def term_stats_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, df, cf) derived from packed blocks: df sums the per-block
    entry counts (pure metadata), cf decodes only the tiny tfs_blob per
    block. Replaces a full posting-row aggregation — the input is
    ~n_blocks rows, not ~n_postings."""
    import pyarrow as pa

    def per_block(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        schema = pa.schema(
            [("term", pa.string()), ("n", pa.int64()), ("tf_sum", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = {nm: batch.column(i) for i, nm in enumerate(batch.schema.names)}
            tf_sums = np.fromiter(
                (int(codec.vb_decode(b.as_py()).sum()) for b in cols["tfs_blob"]),
                dtype=np.int64,
                count=batch.num_rows,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    cols["term"],
                    cols["n"].cast(pa.int64()),
                    pa.array(tf_sums, type=pa.int64()),
                ],
                schema=schema,
            )

    m = blocks.select("term", "n", "tfs_blob").mapInArrow(
        per_block, "term string, n long, tf_sum long"
    )
    return m.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("tf_sum").alias("cf")
    )
