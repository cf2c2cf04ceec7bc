"""Flex-parity tokenizer as a vectorized pandas UDF.

Reproduces the reference English lexer + slice handler semantics
(reference: txt-seg/lexer.eng.l:12-33, txt-seg/lex.c:51-77,
indexer/index.c:134-180) on the *term stream* level:

- maximal ``[a-zA-Z]+`` runs emit one term each, ASCII-lowercased
  (indexer/index.c:175-179 ``eng_to_lower_case``);
- a complete ``[imath]`` tag switches the lexer into the math start
  condition; the first subsequent ``[/imath]`` closes it and the whole
  span emits the single placeholder term ``math_exp``
  (indexer/index.c:144-151) — letters inside the span are NOT terms;
- an **unterminated** ``[imath]`` swallows the rest of the document
  (flex never leaves the start condition), so nothing after it emits;
- an incomplete opening tag (e.g. ``[imath`` with no ``]``) is not a tag:
  its letter run tokenizes normally (flex longest-match fails on the
  literal, falls through to per-char rules);
- every emitted token (term or math placeholder) occupies exactly one
  position in a per-document running counter shared by text and math
  (indexer/index.c:97-115; position = token ordinal, 0-based here);
- byte offsets of each slice are tracked for snippets/highlighting
  (txt-seg/lex.h:15-19 ``lex_slice.offset``).

Everything is Arrow-batched via pandas UDFs — no per-row Python UDFs are
registered (BASELINE input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MATH_PLACEHOLDER = "math_exp"
_OPEN = "[imath]"
_CLOSE = "[/imath]"
# One combined scan: a complete opening tag, or a maximal ASCII-letter run.
# Mirrors flex longest-match: at '[' the literal "[imath]" is tried; if it
# fails the '[' is skipped (the catch-all rules) and letters resume.
_TOKEN_RE = re.compile(r"\[imath\]|[A-Za-z]+")


def tokenize_text(text: str) -> list[str]:
    """Pure-Python reference tokenizer -> ordered term list.

    Position of token i is i. Kept minimal and allocation-light; called
    per-row inside an Arrow batch (pandas UDF), not as a row UDF.
    """
    if not text:
        return []
    out: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.search(text, pos)
        if m is None:
            break
        tok = m.group(0)
        if tok == _OPEN:
            close = text.find(_CLOSE, m.end())
            if close < 0:
                # unterminated math: flex stays in the imath start condition
                # until EOF; the remainder of the doc emits nothing.
                break
            out.append(MATH_PLACEHOLDER)
            pos = close + len(_CLOSE)
        else:
            out.append(tok.lower())
            pos = m.end()
    return out


def tokenize_slices(text: str) -> list[tuple[str, int, int, str]]:
    """Reference tokenizer with byte offsets -> (term, pos, offset, type).

    ``offset`` is the byte offset of the slice start within the document
    (lex.c:51-77 computes ``lex_bytes_now - n_bytes``); for math slices the
    offset is the position of ``[imath]`` and the slice covers the full
    tagged span. Used by the snippet/highlight path (search/snippet.c).
    Offsets are *byte* offsets (the reference lexes raw bytes), so we
    operate on the UTF-8 encoding of the text.
    """
    if not text:
        return []
    raw = text.encode("utf-8", errors="surrogatepass")
    out: list[tuple[str, int, int, str]] = []
    pos = 0
    tokpos = 0
    n = len(raw)
    bre = re.compile(rb"\[imath\]|[A-Za-z]+")
    while pos < n:
        m = bre.search(raw, pos)
        if m is None:
            break
        tok = m.group(0)
        if tok == b"[imath]":
            close = raw.find(b"[/imath]", m.end())
            if close < 0:
                break
            out.append((MATH_PLACEHOLDER, tokpos, m.start(), "math"))
            pos = close + len(b"[/imath]")
        else:
            out.append((tok.decode("ascii").lower(), tokpos, m.start(), "eng"))
            pos = m.end()
        tokpos += 1
    return out


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer: text -> ordered array<string> of terms.

    Token position == array index, so downstream uses ``posexplode`` to
    recover (pos, term) with zero extra bookkeeping.
    """
    return texts.map(lambda t: tokenize_text(t) if isinstance(t, str) else [])


SLICE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("pos", IntegerType()),
            StructField("offset", IntegerType()),
            StructField("type", StringType()),
        ]
    )
)


@F.pandas_udf(SLICE_SCHEMA)
def tokenize_slices_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer retaining byte offsets (snippet path)."""

    def _one(t: object) -> list[dict]:
        if not isinstance(t, str):
            return []
        return [
            {"term": term, "pos": p, "offset": off, "type": ty}
            for term, p, off, ty in tokenize_slices(t)
        ]

    return texts.map(_one)


def tokens_frame(df, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> tokens (doc_id, pos, term) via tokenize + posexplode.

    Narrow transformation: no shuffle; Catalyst prunes to (id, text).
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize_udf(F.col(text_col))).alias("pos", "term"),
    )


INVERT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("tf", IntegerType(), False),
        StructField("positions", ArrayType(IntegerType()), False),
        StructField("doclen", IntegerType(), False),
    ]
)


def inverted_frame(docs, tf_cap: int = 2048, text_col: str = "text"):
    """documents -> per-doc inverted posting rows, map-side (NO shuffle).

    The classic document-inversion move: tokenize and group per document
    inside one Arrow batch pass, emitting (doc_id, term, tf, positions,
    doclen) directly. Replaces the tokens-explode + groupBy(term, doc_id)
    shuffle of ~L tokens with a narrow pass emitting ~V distinct-term rows
    per doc — the single biggest build-time win (the only remaining build
    shuffles key on term for stats/blocks). tf/positions capped at 2048
    (term-index/term-index.cpp:269-274); doclen is the uncapped count.

    Docs with zero tokens emit no rows (doc_meta recovers them by left
    join, postings.doc_meta()).
    """

    def invert(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            o_doc: list[int] = []
            o_term: list[str] = []
            o_tf: list[int] = []
            o_pos: list[list[int]] = []
            o_dl: list[int] = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = tokenize_text(text) if isinstance(text, str) else []
                dl = len(toks)
                groups: dict[str, list[int]] = {}
                for p, t in enumerate(toks):
                    groups.setdefault(t, []).append(p)
                for t, pos in groups.items():
                    o_doc.append(doc_id)
                    o_term.append(t)
                    o_tf.append(min(len(pos), tf_cap))
                    o_pos.append(pos[:tf_cap])
                    o_dl.append(dl)
            yield pd.DataFrame(
                {"doc_id": o_doc, "term": o_term, "tf": o_tf, "positions": o_pos, "doclen": o_dl}
            )

    return docs.select("doc_id", text_col).mapInPandas(invert, INVERT_SCHEMA)
