"""Mixed CJK/English tokenizer tests (reference I3 semantics with the
deterministic unigram fallback segmenter)."""

from __future__ import annotations

from search_engine_spark.functions.mix_tokenizer import (
    mix_tokenize_text,
    mix_tokens_frame,
    unigram_segment,
)

CASES = [
    ("Dog hates CAT", ["dog", "hates", "cat"]),
    ("中文分词 test", ["中", "文", "分", "词", "test"]),
    ("数学 [imath]a+b[/imath] 表达式", ["数", "学", "math_exp", "表", "达", "式"]),
    ("[imath]unterminated 中文", []),
    ("mixed中En文x", ["mixed", "中", "en", "文", "x"]),
    ("标点，测试。end", ["标", "点", "测", "试", "end"]),
    ("", []),
]


def test_mix_golden():
    for text, expected in CASES:
        assert mix_tokenize_text(text) == expected, text


def test_custom_segmenter_pluggable():
    # a bigram "jieba stand-in" proves the segment hook shape
    def bigrams(run):
        cjk = [c for c in run if not c.isascii()]
        out = [(a + b, i) for i, (a, b) in enumerate(zip(cjk, cjk[1:]))]
        eng = unigram_segment("".join(c if c.isascii() else " " for c in run))
        return out + eng

    toks = mix_tokenize_text("中文分词", segment=bigrams)
    assert toks == ["中文", "文分", "分词"]


def test_mix_tokens_frame(spark):
    df = spark.createDataFrame([(1, "你好 world")], "doc_id long, text string")
    rows = mix_tokens_frame(df).orderBy("pos").collect()
    assert [(r["pos"], r["term"]) for r in rows] == [(0, "你"), (1, "好"), (2, "world")]
