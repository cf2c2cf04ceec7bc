"""Mixed CJK/English tokenizer (reference I3: txt-seg/lexer.mix.l +
txt-seg/txt-seg.cpp).

The reference's mixed lexer captures runs of ``engword | chinese | ' '``
(chinese = bytes 0x80-0xf3, i.e. any multi-byte UTF-8 text) and feeds them
to jieba's CutForSearch, skipping punctuation-tagged tokens
(txt-seg.cpp:49-78); [imath] spans behave exactly like the English lexer.

jieba is not available in this container, so the segmenter is pluggable:
``segment=`` takes any callable ``str -> list[(word, char_offset)]``. The
DEFAULT is the vendored forward-maximum-matching segmenter over a bundled
common-word dictionary (cjk_dict.fmm_segment — real multi-character words,
unigram fallback for out-of-vocabulary characters). ``unigram_segment``
(each CJK codepoint as a single-character word, the degenerate
CutForSearch) remains available. Swapping in jieba is a one-liner where it
is installed:

    from jieba import tokenize
    mix_tokens_frame(df, segment=lambda s: [(w, a) for w, a, _ in tokenize(s, mode='search')])
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .cjk_dict import fmm_segment
from .tokenizer import MATH_PLACEHOLDER

_MIX_TOKEN_RE = re.compile(r"\[imath\]|[A-Za-z]+|[⺀-￰\U00010000-\U0003134f]")
_CJK_RE = re.compile(r"[⺀-￰\U00010000-\U0003134f]")


def unigram_segment(text: str) -> list[tuple[str, int]]:
    """Fallback segmenter: letter runs + CJK unigrams with char offsets.

    Skips punctuation/symbol codepoints — the reference skips jieba tokens
    tagged "x" (punctuation), txt-seg.cpp:60-62.
    """
    import unicodedata

    out = []
    for m in re.finditer(r"[A-Za-z]+|[⺀-￰\U00010000-\U0003134f]", text):
        tok = m.group(0)
        if len(tok) == 1 and not tok.isascii():
            cat = unicodedata.category(tok)
            if cat[0] in ("P", "S"):
                continue
        out.append((tok, m.start()))
    return out


def mix_tokenize_text(
    text: str, segment: Callable[[str], list[tuple[str, int]]] = fmm_segment
) -> list[str]:
    """Mixed-lexer term stream: segmented words lowercased, math spans ->
    math_exp, unterminated [imath] swallows the rest (flex semantics)."""
    if not text:
        return []
    out: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _MIX_TOKEN_RE.search(text, pos)
        if m is None:
            break
        tok = m.group(0)
        if tok == "[imath]":
            close = text.find("[/imath]", m.end())
            if close < 0:
                break
            out.append(MATH_PLACEHOLDER)
            pos = close + len("[/imath]")
            continue
        # collect the maximal mixed run (letters/CJK/spaces) like the flex
        # rule, then hand the whole run to the segmenter
        run_end = m.start()
        while run_end < n:
            ch = text[run_end]
            if ch == "[" and text.startswith("[imath]", run_end):
                break
            if ch.isascii() and not (ch.isalpha() or ch == " "):
                break
            if not ch.isascii() and not _CJK_RE.match(ch):
                break
            run_end += 1
        run = text[m.start() : run_end]
        for word, _off in segment(run):
            out.append(word.lower())
        pos = max(run_end, m.start() + 1)
    return out


def mix_tokenize_udf(segment: Callable[[str], list[tuple[str, int]]] = fmm_segment):
    @F.pandas_udf(ArrayType(StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: mix_tokenize_text(t, segment) if isinstance(t, str) else [])

    return _udf


def mix_tokens_frame(df, text_col: str = "text", id_col: str = "doc_id", segment=fmm_segment):
    """documents -> tokens (doc_id, pos, term) through the mixed lexer."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(mix_tokenize_udf(segment)(F.col(text_col))).alias("pos", "term"),
    )
