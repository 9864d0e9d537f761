"""Property tests for the uint64 Mersenne-61 modular kernels — the
arithmetic core of the MinHash path. Pure numpy, no Spark session.

The kernels avoid Python bigints via the 2^61 ≡ 1 / 2^64 ≡ 8 split;
these tests pin them against exact bigint arithmetic over adversarial
and random inputs.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ela_lib_spark.functions.hashing import (
    MERSENNE61,
    _fold_m61,
    _mulmod_m61,
)

EDGE = [0, 1, 2, MERSENNE61 - 1, MERSENNE61, MERSENNE61 + 1,
        (1 << 62) - 1, (1 << 63) - 1, (1 << 64) - 1, 1 << 32, (1 << 32) - 1]


def test_fold_edges():
    x = np.array(EDGE, np.uint64)
    got = _fold_m61(x)
    exp = np.array([v % MERSENNE61 for v in EDGE], np.uint64)
    assert (got == exp).all(), (got, exp)


def test_mulmod_edges():
    vals = [v % MERSENNE61 for v in EDGE]
    a = np.array(vals, np.uint64)
    for b_int in vals:
        b = np.full(len(vals), b_int, np.uint64)
        got = _mulmod_m61(a, b)
        exp = np.array([(v * b_int) % MERSENNE61 for v in vals], np.uint64)
        assert (got == exp).all(), (b_int, got, exp)


@settings(max_examples=200, deadline=None)
@given(st.integers(0, (1 << 64) - 1))
def test_fold_matches_bigint(x):
    assert int(_fold_m61(np.array([x], np.uint64))[0]) == x % MERSENNE61


@settings(max_examples=200, deadline=None)
@given(st.integers(0, MERSENNE61 - 1), st.integers(0, MERSENNE61 - 1))
def test_mulmod_matches_bigint(a, x):
    got = int(_mulmod_m61(np.array([a], np.uint64), np.array([x], np.uint64))[0])
    assert got == (a * x) % MERSENNE61


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(1 << 63), (1 << 63) - 1), min_size=1, max_size=40))
def test_minhash_position_matches_bigint(hashes):
    """One full signature position computed both ways over arbitrary
    signed-int64 'shingle hashes' (the JVM xxhash64 value domain)."""
    from ela_lib_spark.functions.hashing import minhash_params

    a, b = minhash_params(8)
    h = np.asarray(hashes, np.int64)
    x = _fold_m61(h.astype(np.uint64))
    m = _fold_m61(_mulmod_m61(a[:, None], x[None, :]) + b[:, None])
    got = m.min(axis=1)
    for i in range(8):
        exp = min(((int(v) & ((1 << 64) - 1)) % MERSENNE61 * int(a[i])
                   + int(b[i])) % MERSENNE61 for v in hashes)
        assert int(got[i]) == exp
