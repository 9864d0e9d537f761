"""Pure-Python XXH64 matching Spark's `F.xxhash64` (seed 42).

The index stores term IDs as `xxhash64(term)` int64 (computed JVM-side
at build time by whole-stage-codegen'd expressions); the query driver
needs the SAME hash for a handful of query terms without launching a
Spark job. XXH64 is a public, spec-stable algorithm (Yann Collet,
github.com/Cyan4973/xxHash); Spark's implementation
(org.apache.spark.sql.catalyst.expressions.XXH64) follows the spec over
the UTF-8 bytes of a string, default seed 42. Parity is asserted by
tests/test_text.py::test_py_xxhash64_matches_jvm over random tokens.

Only ever called on query terms (a handful of short strings), so pure
Python is fine — corpus-side hashing always runs JVM-side.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of `data` → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        for i in range(0, n - 31, 32):
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def spark_xxhash64(s: str, seed: int = SPARK_XXHASH_SEED) -> int:
    """Signed int64, identical to Spark's `xxhash64(s)` for a string."""
    h = xxhash64_bytes(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_ids(terms: list[str]) -> list[int]:
    return [spark_xxhash64(t) for t in terms]
