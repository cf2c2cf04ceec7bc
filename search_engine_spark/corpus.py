"""Deterministic Common-Crawl-style corpus synthesis + adapters.

The engine's authoritative input shape (BASELINE input_hint) is an Iceberg
table of web pages: ``(url STRING, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING)``. This module

- synthesizes such a table deterministically at any scale (seeded per-doc
  RNG, so the content of doc *i* is independent of partitioning / cluster
  size), mirroring the reference's own corpus shape — JSON docs with
  ``url``/``text`` and inline ``[imath]...[/imath]`` math
  (indexer/index.c:252-291; demo/crawler/crawler-math.stackexchange.com.py:137-143);
- adapts the driver's testdata ``documents`` parquet
  ``(doc_id, text, lang, source, n_chars)`` into the canonical shape.

Fixture guarantees (FIXTURES.md): Zipf-skewed vocabulary (heavy stopword-like
head => term-skew for the salted shuffle), a term in >50% of docs (negative
IDF — the reference's idf has no floor, search/bm25-score.c:53-56), one doc
with tf > 2048 of one term (tf-cap case, term-index/term-index.cpp:269-274),
exact-duplicate docs (BM25 tie-break + dedup cases), mixed case + punctuation
noise, ~5% docs with [imath] spans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), True),
    ]
)

VOCAB_SIZE = 5000
_ZIPF_S = 1.07


def vocab_word(i: int) -> str:
    """Letter-only vocab word (the reference tokenizer drops digits:
    txt-seg/lexer.eng.l `[a-zA-Z]+`), 'w' + 4 base-26 letter digits."""
    s = ""
    v = i
    for _ in range(4):
        s = chr(ord("a") + v % 26) + s
        v //= 26
    return "w" + s


_VOCAB = [vocab_word(i) for i in range(VOCAB_SIZE)]


def _zipf_probs(n: int = VOCAB_SIZE, s: float = _ZIPF_S) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return p / p.sum()


def _doc_text(i: int, probs: np.ndarray) -> tuple[str, str]:
    """Deterministic text for doc i. Returns (text, lang)."""
    rng = np.random.default_rng(42_000_000 + i)
    if i == 0:
        # tf-cap case: one term repeated far beyond the 2048 cap
        words = [_VOCAB[0]] * 2500 + [_VOCAB[1], _VOCAB[2]]
    elif i in (12, 13):
        # exact duplicate pair (tie-break + exact-dedup case); fixed text
        words = [_VOCAB[7], _VOCAB[8], _VOCAB[9], _VOCAB[7], _VOCAB[10]]
    else:
        n_tok = int(rng.integers(20, 401))
        idx = rng.choice(VOCAB_SIZE, size=n_tok, p=probs)
        words = [_VOCAB[j] for j in idx]
    # >50%-df term: every doc leads with vocab word 0
    words = [_VOCAB[0], *words]
    text = " ".join(words)
    if i % 7 == 1:
        text = "Dog DOG dog. " + text  # case folding + punctuation noise
    if i % 20 == 2:
        text += " [imath]a+\\frac 1 a[/imath] tail"
    if i % 97 == 5:
        text += " [imath]unterminated swallows this w99999"
    if i % 11 == 3:
        text = text.replace(" ", "  ", 3) + " 42 x1y2"
    # title line per searchd/utils.c:228-251 (text before first \n\n)
    text = f"title doc {i}\n\n" + text
    lang = "zh" if i % 100 == 99 else "en"
    return text, lang


def synth_corpus(spark: SparkSession, n_docs: int, n_parts: int | None = None) -> DataFrame:
    """Deterministic synthetic corpus of ``n_docs`` web pages."""
    probs = _zipf_probs()

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                text, lang = _doc_text(int(i), probs)
                url = f"https://example.org/{i // 1000:06d}/doc{i:010d}"
                rows.append(
                    {
                        "url": url,
                        "warc_ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(i)),
                        "html": b"<html><body>" + text.encode() + b"</body></html>",
                        "text": text,
                        "lang": lang,
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    base = spark.range(0, n_docs, numPartitions=n_parts or max(2, n_docs // 5000))
    return base.mapInPandas(gen, CORPUS_SCHEMA)


def from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver testdata ``documents`` table to the canonical shape.

    The synthetic url embeds the zero-padded source doc_id, so
    ``row_number() OVER (ORDER BY url)`` (our docID rule) equals
    ``doc_id + 1`` — trivially reproducible in an SQL oracle.
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.format_string("https://testdata.local/doc%010d", F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def read_json_corpus(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Read a reference-style JSON corpus directory into the canonical shape.

    The reference indexer walks a directory tree of one-JSON-object-per-file
    documents and extracts ``url``/``text`` (indexer/run/indexer.c:103-213,
    indexer/index.c:198-213 get_json_val); files above 16 MB are skipped
    (MAX_CORPUS_FILE_SZ). Spark twin: a recursive multiLine JSON scan with
    an explicit schema (no sampling pass), projected to the canonical
    corpus columns — extra fields are pruned at the scan.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("url", StringType()), StructField("text", StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("recursiveFileLookup", "true")
        .json(path)
    )
    return raw.where(F.col("url").isNotNull() & F.col("text").isNotNull()).select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit(None).cast("string").alias("lang"),
    )
