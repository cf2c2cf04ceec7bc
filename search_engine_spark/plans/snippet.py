"""Snippet / highlight rendering (reference Q16/Q17).

The reference merges per-keyword hit positions into at most 8 unique
occurrences (MAX_HIGHLIGHT_OCCURS, search/config.h:36;
search-utils.c:76-122), re-lexes the stored doc text, marks slices whose
token ordinal is in the occur set, pads each highlight by +-320 bytes
(SNIPPET_PADDING, search/config.h:22), merges overlapping windows, and
wraps matches in ``<em class="hl">`` (searchd/config.h:7-8).

Spark shape: the input is the top-k frame (<=155 rows) joined to the
docstore; the rendering is a single Arrow batch through a pandas UDF — a
cheap tail op, exactly like the reference's per-page snippet pass.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..functions.tokenizer import tokenize_slices

MAX_HIGHLIGHT_OCCURS = 8  # search/config.h:36
SNIPPET_PADDING = 320  # search/config.h:22
HL_OPEN = '<em class="hl">'
HL_CLOSE = "</em>"

_OUT = StructType(
    [
        StructField("snippet", StringType()),
        StructField("n_highlights", IntegerType()),
        StructField("w0_start", IntegerType()),
        StructField("w0_end", IntegerType()),
    ]
)


def render_snippet(text: str, qterms: list[str]) -> tuple[str, int, int, int]:
    """Pure-Python snippet renderer for one document.

    Returns (snippet, n_highlights, w0_start, w0_end); w0_* are the byte
    bounds of the FIRST merged highlight window — the SQL-checkable slice
    of the rendering (the driver oracle recomputes them from token
    offsets; reference window semantics search/snippet.c:52-297).
    """
    qset = set(qterms)
    slices = tokenize_slices(text)
    occurs = [(s[2], s[0]) for s in slices if s[0] in qset][:MAX_HIGHLIGHT_OCCURS]
    raw = text.encode("utf-8", errors="surrogatepass")
    if not occurs:
        return text[: 2 * SNIPPET_PADDING], 0, 0, min(len(raw), 2 * SNIPPET_PADDING)
    windows = []
    for off, term in occurs:
        start = max(0, off - SNIPPET_PADDING)
        end = min(len(raw), off + len(term.encode()) + SNIPPET_PADDING)
        if windows and start <= windows[-1][1]:
            windows[-1] = (windows[-1][0], max(windows[-1][1], end))
        else:
            windows.append((start, end))
    marks = sorted(
        (off, off + len(term.encode())) for off, term in occurs
    )
    parts = []
    for wstart, wend in windows:
        cursor = wstart
        chunk = []
        for mstart, mend in marks:
            if mstart < wstart or mend > wend:
                continue
            chunk.append(raw[cursor:mstart].decode("utf-8", errors="replace"))
            chunk.append(HL_OPEN + raw[mstart:mend].decode("utf-8", errors="replace") + HL_CLOSE)
            cursor = mend
        chunk.append(raw[cursor:wend].decode("utf-8", errors="replace"))
        parts.append("".join(chunk))
    return " ... ".join(parts), len(occurs), windows[0][0], windows[0][1]


def snippets_for(index, topk: DataFrame, qterms: list[str]) -> DataFrame:
    """topk (doc_id, score, ...) -> + (snippet, n_highlights, url, title)."""
    hits = topk.join(index.docstore, "doc_id")
    qlist = list(qterms)

    @F.pandas_udf(_OUT)
    def _render(texts: pd.Series) -> pd.DataFrame:
        out = [render_snippet(t if isinstance(t, str) else "", qlist) for t in texts]
        return pd.DataFrame(
            {
                "snippet": [s for s, _, _, _ in out],
                "n_highlights": [n for _, n, _, _ in out],
                "w0_start": [a for _, _, a, _ in out],
                "w0_end": [b for _, _, _, b in out],
            }
        )

    rendered = hits.withColumn("_sn", _render(F.col("text")))
    return rendered.select(
        "doc_id",
        "url",
        F.substring_index("text", "\n\n", 1).alias("title"),
        F.col("_sn.snippet").alias("snippet"),
        F.col("_sn.n_highlights").alias("n_highlights"),
        F.col("_sn.w0_start").alias("w0_start"),
        F.col("_sn.w0_end").alias("w0_end"),
        "score",
    ).orderBy(F.desc("score"), F.asc("doc_id"))  # docstore join loses rank order
