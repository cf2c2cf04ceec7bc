"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure JVM column expressions (whole-stage
codegen; no Python in the hot path). Tokenization here is the lightweight
``regexp_extract_all`` letter-run rule — the same character class as the
index tokenizer (txt-seg/lexer.eng.l `[a-zA-Z]+`) minus math-tag handling,
which keeps these ops SQL-oracle-checkable and fast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKS = "regexp_extract_all(text, '[a-zA-Z]+', 0)"

# tiny per-language stopword lists for the heuristic language ID
EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens_col() -> Column:
    return F.expr(TOKS)


def lang_id(docs: DataFrame, threshold: float = 0.02) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio over tokens.

    (doc_id, n_tokens, en_hits, en_ratio, pred_lang)
    """
    stop_list = ", ".join(f"'{w}'" for w in EN_STOP)
    toks = F.expr(f"transform({TOKS}, x -> lower(x))")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.expr(
            f"size(filter(transform({TOKS}, x -> lower(x)), x -> x in ({stop_list})))"
        ).cast("long").alias("en_hits"),
    ).select(
        "doc_id",
        "n_tokens",
        "en_hits",
        F.round(
            F.when(F.col("n_tokens") > 0, F.col("en_hits") / F.col("n_tokens")).otherwise(0.0), 6
        ).alias("en_ratio"),
        F.when(
            (F.col("n_tokens") > 0)
            & (F.col("en_hits") / F.col("n_tokens") >= F.lit(threshold)),
            F.lit("en"),
        ).otherwise(F.lit("und")).alias("pred_lang"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, mean token length, type/token ratio,
    stopword ratio; composite score in [0, 1]-ish.

    (doc_id, n_chars_text, n_tokens, mean_tok_len, ttr, stop_ratio, quality)
    """
    stop_list = ", ".join(f"'{w}'" for w in EN_STOP)
    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars_text"),
        F.expr(f"size({TOKS})").cast("long").alias("n_tokens"),
        F.expr(f"aggregate({TOKS}, 0L, (acc, x) -> acc + length(x))").alias("_tok_chars"),
        F.expr(f"size(array_distinct({TOKS}))").cast("long").alias("_n_distinct"),
        F.expr(f"size(filter({TOKS}, x -> lower(x) in ({stop_list})))").cast("long").alias("_stop"),
    )
    nt = F.col("n_tokens")
    return d.select(
        "doc_id",
        "n_chars_text",
        "n_tokens",
        F.round(F.when(nt > 0, F.col("_tok_chars") / nt).otherwise(0.0), 6).alias("mean_tok_len"),
        F.round(F.when(nt > 0, F.col("_n_distinct") / nt).otherwise(0.0), 6).alias("ttr"),
        F.round(F.when(nt > 0, F.col("_stop") / nt).otherwise(0.0), 6).alias("stop_ratio"),
        F.round(
            F.least(nt / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
            + F.when(nt > 0, F.col("_n_distinct") / nt).otherwise(0.0) * F.lit(0.5),
            6,
        ).alias("quality"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace split vs BPE-ish regex pieces.

    (doc_id, n_ws_tokens, n_re_tokens)
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr("size(filter(split(text, ' '), x -> x != ''))").cast("long").alias("n_ws_tokens"),
        F.expr(
            "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))"
        ).cast("long").alias("n_re_tokens"),
    )


def fingerprint(docs: DataFrame, shingle: int = 5) -> DataFrame:
    """Document fingerprints: md5 of the normalized token stream + the
    minimum shingle hash (winnowing-lite).

    (doc_id, fp_norm, fp_min_shingle)
    """
    sh = shingle
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.expr(f"concat_ws(' ', {TOKS})").cast("binary")).alias("fp_norm"),
        F.expr(
            f"CASE WHEN size({TOKS}) >= {sh} THEN "
            f"array_min(transform(sequence(1, size({TOKS}) - {sh - 1}), "
            f"i -> md5(cast(concat_ws(' ', slice({TOKS}, i, {sh})) as binary)))) "
            f"ELSE md5(cast(concat_ws(' ', {TOKS}) as binary)) END"
        ).alias("fp_min_shingle"),
    )


def title_extract(docs: DataFrame) -> DataFrame:
    """Reference title rule: text before the first blank line
    (searchd/utils.c:228-251). (doc_id, title)"""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.substring_index("text", "\n\n", 1).alias("title"),
    )
