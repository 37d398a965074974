"""Property tests for the varint/delta/block-max codec."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bm25_chroma_spark.index.encode import (
    block_upper_bound,
    decode_all,
    decode_block,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    buf, lens = varint_encode(arr)
    assert len(buf) == int(lens.sum())
    out = varint_decode(buf)
    assert out.tolist() == values


def test_varint_boundaries():
    edges = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21,
             2**28, 2**35, 2**42, 2**49, 2**56, 2**63 - 1]
    buf, _ = varint_encode(np.array(edges, dtype=np.uint64))
    assert varint_decode(buf).tolist() == edges


@given(
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0),
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(n, block_size, seed):
    rng = np.random.RandomState(seed % 2**31)
    doc_ids = np.cumsum(rng.randint(1, 10_000, size=n)).astype(np.int64)
    tfs = rng.randint(1, 500, size=n).astype(np.int64)
    dls = rng.randint(1, 100_000, size=n).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, dls, block_size=block_size)
    assert enc.count == n
    d, t, l = decode_all(enc.doc_bytes, enc.tf_bytes, enc.dl_bytes, enc.blocks)
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)

    # per-block independent decode agrees, and block-max bounds hold
    k1, b, avgdl = 1.5, 0.75, float(dls.mean())
    for i, blk in enumerate(enc.blocks):
        if i + 1 < len(enc.blocks):
            nxt = enc.blocks[i + 1]
            ends = (nxt["doc_off"], nxt["tf_off"], nxt["dl_off"])
        else:
            ends = (len(enc.doc_bytes), len(enc.tf_bytes), len(enc.dl_bytes))
        bd, bt, bl = decode_block(
            enc.doc_bytes, enc.tf_bytes, enc.dl_bytes, blk, ends
        )
        s = sum(b2["n"] for b2 in enc.blocks[:i])
        e = s + blk["n"]
        np.testing.assert_array_equal(bd, doc_ids[s:e])
        np.testing.assert_array_equal(bt, tfs[s:e])
        np.testing.assert_array_equal(bl, dls[s:e])
        ub = block_upper_bound(blk["max_tf"], blk["min_dl"], 1.0, k1, b, avgdl)
        scores = (bt * (k1 + 1)) / (bt + k1 * (1 - b + b * bl / avgdl)) / np.sqrt(bl)
        assert (scores <= ub + 1e-12).all()


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3]), np.array([1, 1]), np.array([1, 1])
        )


def test_empty():
    enc = encode_postings(np.array([]), np.array([]), np.array([]))
    assert enc.count == 0 and enc.blocks == []
    d, t, l = decode_all(enc.doc_bytes, enc.tf_bytes, enc.dl_bytes, enc.blocks)
    assert len(d) == 0


def test_full_range_doc_ids():
    """xxhash64-style ids span the whole signed-64 range; the codec's
    modular uint64 deltas must round-trip across sign boundaries."""
    doc_ids = np.array(
        [-(2**63), -(2**62), -5, 0, 3, 2**40, 2**62, 2**63 - 1],
        dtype=np.int64,
    )
    tfs = np.arange(1, 9, dtype=np.int64)
    dls = np.full(8, 50, dtype=np.int64)
    for bs in (1, 2, 3, 8):
        enc = encode_postings(doc_ids, tfs, dls, block_size=bs)
        d, t, l = decode_all(
            enc.doc_bytes, enc.tf_bytes, enc.dl_bytes, enc.blocks
        )
        np.testing.assert_array_equal(d, doc_ids)
        np.testing.assert_array_equal(t, tfs)
