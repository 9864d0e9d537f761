import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ela_lib_spark.index.codecs import (
    bitpack_decode,
    bitpack_encode,
    decode_block,
    encode_block,
    pfor_decode,
    pfor_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=40, deadline=None)
def test_varint_roundtrip(xs):
    a = np.asarray(xs, np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a), len(a)), a)


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=300))
@settings(max_examples=40, deadline=None)
def test_pfor_roundtrip(xs):
    a = np.asarray(xs, np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(a), len(a)), a)


@pytest.mark.parametrize("width", [1, 5, 8, 17, 32])
def test_bitpack_roundtrip(width):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**width, size=1000).astype(np.uint64)
    assert np.array_equal(bitpack_decode(bitpack_encode(a, width), len(a), width), a)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_block_roundtrip(codec):
    rng = np.random.default_rng(11)
    for n in (1, 2, 128):
        ids = np.sort(rng.choice(10**12, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 500, n)
        dls = rng.integers(10, 2000, n)
        d, t, l, first, last = encode_block(ids, tfs, dls, codec)
        i2, t2, l2 = decode_block(d, t, l, n, first, codec)
        assert np.array_equal(i2, ids)
        assert np.array_equal(t2, tfs)
        assert np.array_equal(l2, dls)
        assert first == ids[0] and last == ids[-1]


def test_varint_compresses_dense_deltas():
    # dense doc ids (gap 1) must cost ~1 byte per posting
    deltas = np.ones(10_000, np.uint64)
    assert len(varint_encode(deltas)) == 10_000
