"""Tokenizer parity tests (reference txt-seg/lexer.eng.l + indexer slice handler).

Golden cases cover the flex edge semantics: maximal letter runs, complete /
incomplete / unterminated [imath] tags, case folding, and byte offsets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.tokenizer import (
    tokenize_slices,
    tokenize_text,
    tokenize_udf,
    tokens_frame,
)

GOLDEN = [
    ("Dog hates CAT", ["dog", "hates", "cat"]),
    ("x [imath]a+\\frac 1 a[/imath] y", ["x", "math_exp", "y"]),
    # unterminated math swallows the rest of the doc (flex never leaves imath)
    ("[imath]unterminated rest gone", []),
    ("before [imath]x[/imath]", ["before", "math_exp"]),
    # incomplete opening tag is not a tag: letters tokenize normally
    ("[imath no-close word", ["imath", "no", "close", "word"]),
    ("a1b2c3", ["a", "b", "c"]),
    ("", []),
    ("[imath][/imath]", ["math_exp"]),
    ("[imath]x[/imath][imath]y[/imath]", ["math_exp", "math_exp"]),
    ("tail[imath]a[/imath]head", ["tail", "math_exp", "head"]),
    # nested-open inside math is just math content
    ("[imath]a[imath]b[/imath]c", ["math_exp", "c"]),
    ("ünïcödé mixed", ["n", "c", "d", "mixed"]),
    ("title doc 0\n\nw00000 w00001", ["title", "doc", "w", "w"]),
]


def test_golden_python():
    for text, expected in GOLDEN:
        assert tokenize_text(text) == expected, text


def test_slices_offsets_are_byte_offsets():
    s = tokenize_slices("Dog [imath]a+b[/imath] ok")
    assert s == [
        ("dog", 0, 0, "eng"),
        ("math_exp", 1, 4, "math"),
        ("ok", 2, 23, "eng"),
    ]
    # multi-byte char before a token shifts byte offsets, not char offsets
    s2 = tokenize_slices("é dog")
    assert s2 == [("dog", 0, 3, "eng")]


def test_udf_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(GOLDEN)], "id long, text string")
    got = {r["id"]: r["toks"] for r in df.select("id", tokenize_udf("text").alias("toks")).collect()}
    for i, (_, expected) in enumerate(GOLDEN):
        assert got[i] == expected, GOLDEN[i][0]


def test_tokens_frame_positions(spark):
    df = spark.createDataFrame([(7, "b a [imath]x[/imath] a")], "doc_id long, text string")
    rows = tokens_frame(df).orderBy("pos").collect()
    assert [(r["doc_id"], r["pos"], r["term"]) for r in rows] == [
        (7, 0, "b"),
        (7, 1, "a"),
        (7, 2, "math_exp"),
        (7, 3, "a"),
    ]


def test_byte_identical_extraction_per_url(spark, corpus200, pydocs200):
    """input_hint invariant: byte-identical extracted token stream per url."""
    from search_engine_spark.functions.tokenizer import tokenize_udf

    got = {
        r["url"]: r["toks"]
        for r in corpus200.select("url", tokenize_udf("text").alias("toks")).collect()
    }
    exp = {
        r["url"]: tokenize_text(r["text"])
        for r in corpus200.select("url", "text").collect()
    }
    assert got == exp
