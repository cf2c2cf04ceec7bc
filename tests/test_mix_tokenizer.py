"""Mixed CJK/English tokenizer tests (reference I3 semantics with the
vendored FMM dictionary segmenter as default; unigram fallback kept)."""

from __future__ import annotations

from search_engine_spark.functions.cjk_dict import fmm_segment
from search_engine_spark.functions.mix_tokenizer import (
    mix_tokenize_text,
    mix_tokens_frame,
    unigram_segment,
)

# default (FMM) segmenter: real multi-character words where the bundled
# dictionary knows them, unigrams elsewhere — hand-computed goldens
CASES = [
    ("Dog hates CAT", ["dog", "hates", "cat"]),
    ("中文分词 test", ["中文", "分词", "test"]),
    ("数学 [imath]a+b[/imath] 表达式", ["数学", "math_exp", "表达", "表达式"]),
    ("[imath]unterminated 中文", []),
    ("mixed中En文x", ["mixed", "中", "en", "文", "x"]),
    ("标点，测试。end", ["标点", "测试", "end"]),
    # CutForSearch mode: 3+/4+ char dictionary words re-emit their
    # in-dictionary sub-words before the full word (jieba cut_for_search)
    ("我们在北京大学学习汉语", ["我们", "在", "北京", "大学", "北京大学", "学习", "汉语"]),
    ("", []),
]

UNIGRAM_CASES = [
    ("中文分词 test", ["中", "文", "分", "词", "test"]),
    ("标点，测试。end", ["标", "点", "测", "试", "end"]),
]


def test_mix_golden():
    for text, expected in CASES:
        assert mix_tokenize_text(text) == expected, text


def test_unigram_fallback_golden():
    for text, expected in UNIGRAM_CASES:
        assert mix_tokenize_text(text, segment=unigram_segment) == expected, text


def test_fmm_longest_match_and_offsets():
    # longest match wins (北京大学 over 北京+大学); offsets are char indices;
    # CutForSearch mode re-emits in-dictionary sub-words at THEIR offsets
    assert fmm_segment("北京大学") == [("北京", 0), ("大学", 2), ("北京大学", 0)]
    assert fmm_segment("北京大学", search_subwords=False) == [("北京大学", 0)]
    assert fmm_segment("北京大") == [("北京", 0), ("大", 2)]
    # out-of-vocabulary chars degrade to unigrams; ASCII runs stay whole
    assert fmm_segment("xyz中鑫abc") == [("xyz", 0), ("中", 3), ("鑫", 4), ("abc", 5)]
    # punctuation is skipped (jieba 'x'-tag analogue)
    assert fmm_segment("中文，分词") == [("中文", 0), ("分词", 3)]


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
    assert [(r["pos"], r["term"]) for r in rows] == [(0, "你好"), (1, "world")]


# --- property: run boundaries match the reference flex rule -----------------
# txt-seg/lexer.mix.l:23 `({engword}|{chinese}|[ ])+` hands MAXIMAL runs of
# letters/CJK/spaces to the segmenter; "[imath]".."[/imath]" is a separate
# start condition (unterminated -> rest swallowed). The model below is that
# lexer restated; the test asserts our tokenizer hands the segment hook the
# same slice boundaries on arbitrary mixed fixtures. (Deviation kept out of
# scope: flex's {chinese} byte class 0x80-0xf3 sweeps in ALL non-ASCII text
# incl. Latin-1; our char class is CJK-only — the alphabet here sticks to
# real CJK so both agree.)

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.mix_tokenizer import _CJK_RE

_PIECES = ["cat", "X", "中", "文词", "测试汉", " ", "  ", "7", ".", ",", "!",
           "[imath]", "[/imath]", "a+b", "]", "[", "imath"]


def _model_runs(text):
    """Flex-twin scanner: returns the run/math event sequence."""
    events, pos, n = [], 0, len(text)
    run = ""
    while pos < n:
        if text.startswith("[imath]", pos):
            if run.strip():
                events.append(("run", run.strip()))
            run = ""
            close = text.find("[/imath]", pos + 7)
            if close < 0:
                return events  # swallowed to EOF
            events.append(("math",))
            pos = close + 8
            continue
        ch = text[pos]
        if (ch.isascii() and (ch.isalpha() or ch == " ")) or _CJK_RE.match(ch):
            run += ch
            pos += 1
            continue
        if run.strip():
            events.append(("run", run.strip()))
        run = ""
        pos += 1
    if run.strip():
        events.append(("run", run.strip()))
    return events


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(_PIECES), max_size=25))
def test_mix_run_boundaries_match_flex(pieces):
    from search_engine_spark.functions.mix_tokenizer import mix_tokenize_text

    text = "".join(pieces)
    captured = []

    def spy(run):
        captured.append(("run", run.strip()))
        return []

    toks = mix_tokenize_text(text, segment=spy)
    n_math = toks.count("math_exp")
    model = _model_runs(text)
    got_runs = [e for e in captured if e[0] == "run" and e[1]]
    model_runs = [e for e in model if e[0] == "run"]
    assert got_runs == model_runs, (text, got_runs, model_runs)
    assert n_math == sum(1 for e in model if e[0] == "math"), text


def test_expanded_dict_closes_small_dict_undersegmentation():
    """Round-3 gap (VERDICT): the small dictionary under-segmented common
    domain vocabulary into unigrams. The expanded frequency-ranked list
    segments it into real words, matching jieba CutForSearch output
    (sub-words of a long match re-emitted before the full word)."""
    # 机器学习/人工智能 were out-of-vocabulary in round 3 -> unigram spray
    assert fmm_segment("机器学习") == [("机器", 0), ("学习", 2), ("机器学习", 0)]
    assert mix_tokenize_text("我用机器学习做研究") == [
        "我", "用", "机器", "学习", "机器学习", "做", "研究",
    ]
    assert mix_tokenize_text("人工智能改变世界") == ["人工", "智能", "人工智能", "改变", "世界"]


def test_cjk_oracle_words_fmm_safe():
    """The ft_cjk_segment oracle predicts segmentation closed-form, which is
    only sound if forward maximum matching can NEVER overshoot a boundary of
    the synthesized word stream: for every ordered pair (x, y) of oracle
    words, no dictionary entry equals x+y[0] (3-char overshoot) or x+y
    (4-char overshoot). Checked against the FULL dictionary, then re-verified
    behaviorally on every pair through the real segmenter."""
    import itertools

    from search_engine_spark.entry_queries import CJK_ORACLE_WORDS
    from search_engine_spark.functions.cjk_dict import CJK_WORDS

    dictionary = set(CJK_WORDS)
    assert len(CJK_ORACLE_WORDS) == 32
    for w in CJK_ORACLE_WORDS:
        assert len(w) == 2 and w in dictionary, w
    for x, y in itertools.product(CJK_ORACLE_WORDS, repeat=2):
        assert (x + y[0]) not in dictionary, (x, y)
        assert (x + y) not in dictionary, (x, y)
        assert [w for w, _ in fmm_segment(x + y)] == [x, y]


def test_round5_dict_growth_matches_cut_for_search_goldens():
    """Goldens the pre-growth ~730-word dictionary UNDER-segmented (宣布 /
    政策 / 研究生 were absent, so FMM fell back to single characters);
    the grown list segments them exactly like jieba ``cut_for_search``
    (word + in-dictionary sub-words at their own offsets)."""
    from search_engine_spark.functions.cjk_dict import CJK_WORDS, fmm_segment

    assert len(set(CJK_WORDS)) > 1500  # the growth actually shipped
    assert fmm_segment("政府宣布新的经济政策") == [
        ("政府", 0), ("宣布", 2), ("新", 4), ("的", 5), ("经济", 6), ("政策", 8),
    ]
    # cut_for_search sub-word re-emission on a 3-char and a 4-char compound
    assert fmm_segment("研究生学机器学习") == [
        ("研究", 0), ("研究生", 0), ("学", 3),
        ("机器", 4), ("学习", 6), ("机器学习", 4),
    ]


def test_round5b_dict_growth_goldens():
    """Round-5b tranche (time/geography/sports/arts/professions/chengyu):
    words the 2.1k list adds over the round-5 list, with cut_for_search
    sub-word re-emission on the 4-char idioms (in-dictionary 2-char parts
    emit at their own offsets before the idiom)."""
    from search_engine_spark.functions.cjk_dict import CJK_WORDS, fmm_segment

    assert len(set(CJK_WORDS)) > 2000
    assert fmm_segment("奥运会马拉松冠军接受记者采访") == [
        ("奥运会", 0), ("马拉松", 3), ("冠军", 6), ("接受", 8),
        ("记者", 10), ("采", 12), ("访", 13),
    ]
    assert fmm_segment("他坚持不懈地学习") == [
        ("他", 0), ("坚持", 1), ("坚持不懈", 1), ("地", 5), ("学习", 6),
    ]
    assert fmm_segment("程序员出差去首都机场") == [
        ("程序", 0), ("程序员", 0), ("出差", 3), ("去", 5),
        ("首都", 6), ("机场", 8),
    ]
