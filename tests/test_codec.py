"""Varbyte/delta codec round-trip (reference codec/for.c contract)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**50 - 1), max_size=500))
@settings(max_examples=100, deadline=None)
def test_vb_roundtrip(values):
    arr = np.asarray(values, dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=100, deadline=None)
def test_ids_roundtrip(ids):
    arr = np.sort(np.fromiter(ids, dtype=np.uint64))
    assert np.array_equal(codec.decode_ids(codec.encode_ids(arr)), arr)


def test_edge_values():
    for v in ([0], [0, 0, 0], [127], [128], [2**32 - 1], [2**62]):
        arr = np.asarray(v, dtype=np.uint64)
        assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)
    assert codec.vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(codec.vb_decode(b"")) == 0


def test_compression_beats_raw():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**8, size=100_000, replace=False)).astype(np.uint64)
    assert len(codec.encode_ids(ids)) < ids.nbytes // 2
