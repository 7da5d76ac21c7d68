import numpy as np
import pytest

from alix_ray import BLOCK
from alix_ray.codec import (
    decode_block,
    decode_doc_deltas,
    decode_posting,
    encode_doc_deltas,
    encode_posting,
    vb_byte_lengths,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**50], np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def test_vb_empty():
    assert vb_encode(np.empty(0, np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_vb_lengths():
    vals = np.array([0, 127, 128, 16383, 16384], np.uint64)
    lens = vb_byte_lengths(vals)
    assert lens.tolist() == [1, 1, 2, 2, 3]
    assert sum(lens) == len(vb_encode(vals))


@pytest.mark.parametrize("n", [1, 5, BLOCK, BLOCK + 1, 3 * BLOCK + 17])
def test_doc_delta_roundtrip(n):
    rng = np.random.default_rng(0)
    docs = np.cumsum(rng.integers(1, 1000, n)).astype(np.int64)
    assert np.array_equal(decode_doc_deltas(encode_doc_deltas(docs)), docs)


def test_posting_roundtrip_and_blocks():
    rng = np.random.default_rng(1)
    n = 5 * BLOCK + 3
    docs = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)
    tfs = rng.integers(1, 20, n).astype(np.int64)
    db, tb, last_doc, off_d, off_t = encode_posting(docs, tfs)
    d2, t2 = decode_posting(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    # block metadata
    n_blocks = (n + BLOCK - 1) // BLOCK
    assert len(last_doc) == len(off_d) == len(off_t) == n_blocks
    for bi in range(n_blocks):
        bd, bt = decode_block(db, tb, bi, n, off_d, off_t)
        s, e = bi * BLOCK, min((bi + 1) * BLOCK, n)
        assert np.array_equal(bd, docs[s:e])
        assert np.array_equal(bt, tfs[s:e])
        assert last_doc[bi] == docs[e - 1]


def test_posting_concat_shards():
    """Shards over disjoint doc ranges decode independently and concatenate."""
    docs1 = np.array([3, 9, 10], np.int64)
    docs2 = np.array([100, 150], np.int64)
    tf1 = np.array([1, 2, 3], np.int64)
    tf2 = np.array([4, 5], np.int64)
    e1 = encode_posting(docs1, tf1)
    e2 = encode_posting(docs2, tf2)
    d = np.concatenate([decode_posting(e1[0], e1[1])[0], decode_posting(e2[0], e2[1])[0]])
    assert np.array_equal(d, np.array([3, 9, 10, 100, 150]))


def test_encode_deterministic():
    docs = np.arange(1, 1000, 3, dtype=np.int64)
    tfs = np.ones_like(docs)
    a = encode_posting(docs, tfs)
    b = encode_posting(docs, tfs)
    assert a[0] == b[0] and a[1] == b[1]
