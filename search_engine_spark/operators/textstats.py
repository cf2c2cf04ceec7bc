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


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """Corpus-trained bigram LM quality score: per-doc mean log-probability
    of its bigrams under the corpus MLE model ln(c(w1,w2) / c(w1·)).

    The classic cheap LM filter in web-scale training-data pipelines
    (gibberish and boilerplate score low). Two aggregations train the
    model (bigram counts, unigram-context counts — both combinable and
    skew-tolerant), then a broadcast-free join scores every doc. Pure JVM
    expressions; counts are exact so the score is engine-portable.

    (doc_id, n_bigrams, avg_logp_r)
    """
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(f"transform({TOKS}, x -> lower(x))").alias("_t"),
    )
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN "
                "transform(sequence(1, size(_t) - 1), i -> struct(_t[i-1] as w1, _t[i] as w2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .select("doc_id", (F.log(F.col("c12") / F.col("c1"))).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.round(F.avg("lp"), 6) + F.lit(0.0)).alias("avg_logp_r"),
    )


# the 8 Gopher "stop words" used by the minimum-stop-word rule
# (Rae et al. 2021, "Scaling Language Models: Methods, Analysis & Insights
# from Training Gopher", Appendix A1.1)
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher-style document quality filter rules, adapted to the
    letter-run tokenizer (same character class as the index lexer):

    - word count in [50, 100000];
    - mean word length in [3, 10];
    - >= 80% of whitespace-split words contain an alphabetic character;
    - >= 2 distinct words from the 8-word Gopher stop list;
    - <= 20% of tokens covered by the single most frequent bigram
      (the repetition rule, token-fraction adaptation of Gopher's
      most-common-2-gram character fraction).

    Every threshold evaluates in INTEGER arithmetic (e.g. mean length in
    [3,10] <=> 3*n <= chars <= 10*n), so the booleans cannot flake on
    float rounding across engines. The bigram top-count goes through an
    explode + two combinable groupBys keyed by doc_id — never a per-doc
    quadratic expression — so a 100k-token document costs O(tokens), and
    everything else is whole-stage-codegen column expressions.

    (doc_id, n_words, mean_word_len, n_ws, n_alpha_ws, stop_hits, top_bi,
     n_bi, top_bigram_frac, pass_words, pass_wordlen, pass_alpha,
     pass_stop, pass_rep, keep)
    """
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOP)
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(f"transform({TOKS}, x -> lower(x))").alias("t"),
        F.expr("size(filter(split(text, ' '), x -> x != ''))").cast("long").alias("n_ws"),
        F.expr("size(filter(split(text, ' '), x -> x rlike '[A-Za-z]'))")
        .cast("long")
        .alias("n_alpha_ws"),
    )
    per_doc = base.select(
        "doc_id",
        "n_ws",
        "n_alpha_ws",
        F.expr("size(t)").cast("long").alias("n_words"),
        F.expr("aggregate(t, 0L, (a, x) -> a + length(x))").alias("tok_chars"),
        F.expr(f"size(array_distinct(filter(t, x -> x in ({stop_list}))))")
        .cast("long")
        .alias("stop_hits"),
        F.expr(
            "CASE WHEN size(t) >= 2"
            " THEN transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"
            " ELSE cast(array() as array<string>) END"
        ).alias("bi"),
    ).persist()
    top = (
        per_doc.select("doc_id", F.explode("bi").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bi"), F.sum("c").cast("long").alias("n_bi"))
    )
    out = per_doc.drop("bi").join(top, "doc_id", "left").fillna({"top_bi": 0, "n_bi": 0})
    nw = F.col("n_words")
    res = out.select(
        "doc_id",
        "n_words",
        F.round(F.when(nw > 0, F.col("tok_chars") / nw).otherwise(0.0), 6).alias(
            "mean_word_len"
        ),
        "n_ws",
        "n_alpha_ws",
        "stop_hits",
        "top_bi",
        "n_bi",
        F.round(F.when(nw > 0, 2 * F.col("top_bi") / nw).otherwise(0.0), 6).alias(
            "top_bigram_frac"
        ),
        ((nw >= 50) & (nw <= 100000)).alias("pass_words"),
        (
            (nw > 0)
            & (3 * nw <= F.col("tok_chars"))
            & (F.col("tok_chars") <= 10 * nw)
        ).alias("pass_wordlen"),
        (5 * F.col("n_alpha_ws") >= 4 * F.col("n_ws")).alias("pass_alpha"),
        (F.col("stop_hits") >= 2).alias("pass_stop"),
        (10 * F.col("top_bi") <= nw).alias("pass_rep"),
    )
    res = res.withColumn(
        "keep",
        F.col("pass_words")
        & F.col("pass_wordlen")
        & F.col("pass_alpha")
        & F.col("pass_stop")
        & F.col("pass_rep"),
    )
    # per_doc feeds two plan branches (bigram explode + final join); expose
    # the persisted handle so long-lived callers can release it (the same
    # contract as dedup._with_cached_inputs / dedup.release)
    res._cached_inputs = [per_doc]
    return res
