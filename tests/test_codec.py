"""Codec round-trip tests (FIXTURES.md §4): varint/delta/block identity on
adversarial doc_id runs — empty, single, dense consecutive, sparse 2^40 gaps.
Property-style via hypothesis where cheap."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from picdexer_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
)


CASES = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([2**40], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64),  # dense consecutive
    np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**40 + 7], np.uint64),
    np.array([2**63, 2**64 - 1], dtype=np.uint64),
]


@pytest.mark.parametrize("vals", CASES, ids=range(len(CASES)))
def test_varint_roundtrip(vals):
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_property(xs):
    ids = np.array(sorted(set(xs)), dtype=np.uint64)
    base = int(ids[0])
    assert np.array_equal(delta_decode(delta_encode(ids, base), base), ids)


def test_varint_compactness():
    # dense consecutive ids: gap-1 == 0 -> exactly 1 byte per posting after first
    ids = np.arange(10_000, 10_000 + BLOCK_SIZE, dtype=np.uint64)
    enc = varint_encode(delta_encode(ids, int(ids[0])))
    assert len(enc) == BLOCK_SIZE  # 1 byte each


def test_encode_blocks_roundtrip_and_metadata():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 2**33, size=1000).astype(np.uint64))
    tfs = rng.integers(1, 50, size=ids.size).astype(np.uint64)
    dls = rng.integers(1, 500, size=ids.size).astype(np.uint64)
    blocks = encode_blocks(ids, tfs, dls)
    assert len(blocks) == (ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    got_ids, got_tfs = [], []
    for i, blk in enumerate(blocks):
        assert blk["block_no"] == i
        d, t = decode_block(blk["first_doc"], blk["doc_ids_enc"], blk["tfs_enc"])
        assert blk["first_doc"] == int(d[0])
        assert blk["last_doc"] == int(d[-1])
        assert blk["n"] == d.size
        assert blk["max_tf"] == int(t.max())
        got_ids.append(d)
        got_tfs.append(t)
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)


def test_empty_blocks():
    assert encode_blocks(np.array([], np.uint64), np.array([], np.uint64),
                         np.array([], np.uint64)) == []
