"""Snippet/highlight rendering (reference Q16/Q17 semantics)."""

from __future__ import annotations

from search_engine_spark.corpus import vocab_word as W
from search_engine_spark.plans.query import search
from search_engine_spark.plans.snippet import (
    HL_CLOSE,
    HL_OPEN,
    MAX_HIGHLIGHT_OCCURS,
    render_snippet,
    snippets_for,
)


def test_render_basic():
    text = "alpha beta gamma delta"
    sn, n, w0s, w0e = render_snippet(text, ["beta", "delta"])
    assert (w0s, w0e) == (0, len(text))
    assert n == 2
    assert f"{HL_OPEN}beta{HL_CLOSE}" in sn
    assert f"{HL_OPEN}delta{HL_CLOSE}" in sn
    assert sn.replace(HL_OPEN, "").replace(HL_CLOSE, "") == text


def test_render_no_match_returns_prefix():
    sn, n, _, _ = render_snippet("x " * 500, ["missing"])
    assert n == 0
    assert len(sn) <= 640


def test_occurs_capped_at_8():
    text = "hit " * 50
    sn, n, _, _ = render_snippet(text, ["hit"])
    assert n == MAX_HIGHLIGHT_OCCURS
    assert sn.count(HL_OPEN) == MAX_HIGHLIGHT_OCCURS


def test_padding_windows_merge():
    # two distant hits in a long doc produce an elided ' ... ' join
    filler = "pad " * 400  # 1600 bytes >> 2*320 padding
    text = f"needle {filler} needle"
    sn, n, w0s, w0e = render_snippet(text, ["needle"])
    assert w0s == 0 and w0e == len("needle") + 320  # first window, not merged with the far hit
    assert n == 2
    assert " ... " in sn
    assert sn.count(HL_OPEN) == 2


def test_snippets_for_topk(spark, index200):
    q = f"{W(1)} {W(2)}"
    res = search(spark, index200, q, k=10)
    out = snippets_for(index200, res, [W(1), W(2)]).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_highlights"] >= 1
        assert HL_OPEN in r["snippet"]
        assert r["title"].startswith("title doc")
        assert r["url"].startswith("https://example.org/")
