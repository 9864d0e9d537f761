"""Vectorized hashing kernels for dedup: MinHash signatures, SimHash,
and shingling. Arrow pandas UDF factories (numpy inside; no per-row
Python UDFs in the Spark plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE61 = (1 << 61) - 1


def _token_hashes(tokens, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hashes of a token list (xxhash-free: FNV-1a)."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):  # bounded by doc length; bytes-level loop
        h = np.uint64(14695981039346656037 + seed)
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def shingle_col(tokens_col, n: int = 3) -> Column:
    """JVM-side n-gram shingles over a token array column.

    Guarded: Spark's sequence(1, 0) counts DOWN ([1, 0]), so short docs
    must short-circuit to an empty array."""
    idx = F.sequence(F.lit(1), F.size(tokens_col) - (n - 1))
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n))),
    ).otherwise(F.array().cast(T.ArrayType(T.StringType())))


def minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE61, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 64, seed: int = 42):
    """pandas UDF: array<string> shingles → array<long> MinHash signature.

    h_i(x) = (a_i * x + b_i) mod M61 over 64-bit shingle hashes.
    """
    a, b = minhash_params(num_hashes, seed)
    a_o = a.astype(object)
    b_o = b.astype(object)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append(np.zeros(num_hashes, np.int64).tolist())
                continue
            x = _token_hashes(list(sh)).astype(object)  # exact mod-M61 math
            # (num_hashes, n) permuted hashes, min over shingles
            m = (a_o[:, None] * x[None, :] + b_o[:, None]) % MERSENNE61
            out.append(np.asarray(m.min(axis=1), dtype=np.uint64).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def make_simhash_udf():
    """pandas UDF: array<string> tokens → long SimHash (64-bit)."""

    @F.pandas_udf(T.LongType())
    def simhash(tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            h = _token_hashes(list(toks))
            uniq, counts = np.unique(h, return_counts=True)
            bits = ((uniq[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    ).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for j in np.flatnonzero(v > 0):
                sig |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return simhash


def hamming64(c1, c2) -> Column:
    """Popcount of xor — JVM-side via bin() trick."""
    x = c1.bitwiseXOR(c2)
    return F.length(F.regexp_replace(F.bin(x), "0", ""))


def band_cols(sig_col, num_bands: int, rows_per_band: int) -> list[Column]:
    """LSH banding: hash each signature band; equal band-hash ⇒ candidate."""
    return [
        F.xxhash64(
            F.concat_ws(",", *[sig_col.getItem(b * rows_per_band + r).cast("string")
                               for r in range(rows_per_band)])
        ).alias(f"band_{b}")
        for b in range(num_bands)
    ]
