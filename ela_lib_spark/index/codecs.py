"""Posting-list block codecs: varint (LEB128), bit-packed FOR, and
exception-patched PForDelta. All numpy-vectorized — these run inside
Arrow UDFs on the executors, so no per-element Python loops.

The reference stores documents as NDJSON and delegates posting-list
storage to Lucene; this module is the from-scratch replacement
(north rule: "delta/varint+PForDelta block compression").
"""

from __future__ import annotations

import numpy as np

_PAD8 = np.zeros(8, np.uint8)  # bitpack_decode window-gather tail pad
_GATHER_BITS = 16384  # below this, unpackbits beats the window gather
_POW2 = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))

# ---------------------------------------------------------------- varint


def varint_encode(arr: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (any dtype ≤ uint64).

    Fast paths for the batch's max value needing 1 or 2 bytes — in an
    inverted index these cover almost every stream (dense doc-id
    deltas ≈ 1, tf ≈ 1, doc lengths ≤ 2 bytes), and profiling showed
    the generic per-byte-level loop dominating the SPIMI kernel."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b""
    mx = int(a.max())
    if mx < 128:  # every value is its own byte
        return a.astype(np.uint8).tobytes()
    if mx < (1 << 14):  # 1-2 bytes: two vectorized scatters
        two = a >= np.uint64(128)
        nb = 1 + two.astype(np.int64)
        starts = np.zeros(n, np.int64)
        np.cumsum(nb[:-1], out=starts[1:])
        out = np.zeros(int(starts[-1]) + int(nb[-1]), np.uint8)
        out[starts] = (a & np.uint64(0x7F)).astype(np.uint8) | (
            two.astype(np.uint8) << 7
        )
        out[starts[two] + 1] = (a[two] >> np.uint64(7)).astype(np.uint8)
        return out.tobytes()
    nbytes = np.ones(n, np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    starts = np.zeros(n, np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    out = np.zeros(int(nbytes.sum()), np.uint8)
    v = a.copy()
    offset = np.zeros(n, np.int64)
    live = np.arange(n)
    while len(live):
        idx = starts[live] + offset[live]
        cont = offset[live] < nbytes[live] - 1
        out[idx] = (v[live] & np.uint64(0x7F)).astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
        v[live] >>= np.uint64(7)
        offset[live] += 1
        live = live[cont]
    return out.tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 values from buf → uint64 array.

    Fast paths mirror varint_encode's: all-1-byte (buf length == n)
    and all-≤2-byte streams decode with plain vectorized ops instead
    of the generic np.add.at scatter."""
    if n == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    if len(b) == n:  # n values in n bytes ⇒ every value is one byte
        return b.astype(np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:n]
    starts2 = np.zeros(n, np.int64)
    starts2[1:] = ends[:-1] + 1
    if int((ends - starts2).max()) <= 1:  # all values ≤ 2 bytes
        vals = b[ends].astype(np.uint64)
        two = ends > starts2
        vals[two] = (vals[two] << np.uint64(7)) | (
            b[starts2[two]] & np.uint8(0x7F)
        )
        return vals
    nbytes_total = int(ends[-1]) + 1
    b = b[:nbytes_total]
    is_last = is_last[:nbytes_total]
    val_idx = np.zeros(nbytes_total, np.int64)
    np.cumsum(is_last[:-1], out=val_idx[1:])
    starts = np.zeros(n, np.int64)
    starts[1:] = ends[:-1] + 1
    shift = ((np.arange(nbytes_total) - starts[val_idx]) * 7).astype(np.uint64)
    vals = np.zeros(n, np.uint64)
    np.add.at(vals, val_idx, (b & np.uint8(0x7F)).astype(np.uint64) << shift)
    return vals


def varint_lengths(arr: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (vectorized)."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    n = np.ones(len(a), np.int64)
    for k in range(7, 64, 7):
        n += (a >= (np.uint64(1) << np.uint64(k))).astype(np.int64)
    return n


def varint_encode_segmented(values: np.ndarray, seg_value_counts: np.ndarray) -> list[bytes]:
    """Encode `values` once, return per-segment byte strings.

    Segments are consecutive runs of `seg_value_counts[i]` values. ONE
    vectorized encode for the whole batch; slicing is cheap. This is
    what makes merging millions of tiny posting lists viable — the
    zipf long tail means per-list encode calls would dominate.
    """
    enc = varint_encode(values)
    lens = varint_lengths(values)
    val_ends = np.cumsum(seg_value_counts)  # cumulative → empty segs inherit
    cl = np.cumsum(lens) if len(lens) else np.zeros(1, np.int64)
    byte_ends = np.where(val_ends > 0, cl[np.maximum(val_ends, 1) - 1], 0)
    byte_starts = np.empty(len(val_ends), np.int64)
    byte_starts[0] = 0
    byte_starts[1:] = byte_ends[:-1]
    return [enc[s:e] for s, e in zip(byte_starts, byte_ends)]


# ------------------------------------------------------------- bitpacking


def _bits_needed(x: int) -> int:
    return max(1, int(x).bit_length())


def bitpack_encode(arr: np.ndarray, width: int) -> bytes:
    """Pack values (< 2**width, width ≤ 32) MSB-first into bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    if len(a) == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def bitpack_decode(buf: bytes, n: int, width: int) -> np.ndarray:
    """Two decode regimes (r6, both exact for width ≤ 32):

    - small blocks (n·width below _GATHER_BITS): one unpackbits +
      matmul — tiny fixed cost (~8 µs at the 128-posting block size,
      where per-call overhead, not bit work, is the budget);
    - large arrays: gather each value's 8-byte window and reinterpret
      as big-endian uint64 in one view — 8 bytes/value instead of
      width unpacked BYTES per value, ~5× less memory traffic for
      bulk decodes (validate --deep, whole-list rebuilds)."""
    if n == 0:
        return np.zeros(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    if n * width < _GATHER_BITS:
        bits = np.unpackbits(b, count=n * width)
        m = bits.reshape(n, width)
        return m.astype(np.uint64) @ _POW2[64 - width:]
    bp = np.concatenate([b, _PAD8])
    starts = np.arange(n, dtype=np.int64) * width
    byte0 = starts >> 3
    win = np.lib.stride_tricks.sliding_window_view(bp, 8)[byte0]
    acc = np.ascontiguousarray(win).view(">u8")[:, 0]
    shift = (np.uint64(64) - (starts & 7).astype(np.uint64)
             - np.uint64(width))
    return ((acc >> shift) & np.uint64((1 << width) - 1)).astype(np.uint64)


# ------------------------------------------------------------- PForDelta
# Layout: [width:1B][n_exc varint][packed normals][exc idx varint deltas]
#         [exc values varint]
# Normals are values < 2**width; exceptions are zeroed in the packed
# stream and patched back on decode.


def pfor_encode(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return bytes([0])
    w90 = _bits_needed(int(np.percentile(a, 90)))
    w90 = min(w90, 32)
    limit = np.uint64(1) << np.uint64(w90)
    exc_idx = np.flatnonzero(a >= limit)
    normals = a.copy()
    normals[exc_idx] = 0
    header = bytes([w90]) + varint_encode(np.array([len(exc_idx)], np.uint64))
    body = bitpack_encode(normals, w90)
    if len(exc_idx):
        gaps = np.diff(exc_idx, prepend=0).astype(np.uint64)
        body += varint_encode(gaps) + varint_encode(a[exc_idx])
    return header + body


def pfor_decode(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, np.uint64)
    width = buf[0]
    # inline n_exc varint parse — a plain byte loop over ≤ 10 bytes is
    # ~5 µs cheaper per call than a vectorized varint_decode round
    # trip, and per-call cost is the whole budget at the 128-posting
    # block size (r6)
    n_exc = 0
    shift = 0
    i = 1
    while True:
        byt = buf[i]
        n_exc |= (byt & 0x7F) << shift
        i += 1
        if not byt & 0x80:
            break
        shift += 7
    packed_len = (n * width + 7) // 8
    vals = bitpack_decode(buf[i:i + packed_len], n, width)
    if n_exc:
        both = varint_decode(buf[i + packed_len:], 2 * n_exc)
        idx = np.cumsum(both[:n_exc].astype(np.int64))
        vals[idx] = both[n_exc:]
    return vals


# ----------------------------------------------------------- block codec

CODEC_VARINT = "varint"
CODEC_PFOR = "pfor"

_ENC = {CODEC_VARINT: varint_encode, CODEC_PFOR: pfor_encode}


def _dec(codec: str, buf: bytes, n: int) -> np.ndarray:
    return varint_decode(buf, n) if codec == CODEC_VARINT else pfor_decode(buf, n)


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, codec: str = CODEC_VARINT
) -> tuple[bytes, bytes, bytes, int, int]:
    """Encode one posting block. doc_ids strictly increasing.

    Returns (doc_deltas, tfs, dls, first_doc_id, last_doc_id); the
    delta stream holds diff(doc_ids) (n-1 values) — first id lives in
    the block metadata column.
    """
    enc = _ENC[codec]
    deltas = np.diff(doc_ids.astype(np.uint64))
    return (
        enc(deltas),
        enc(tfs),
        enc(dls),
        int(doc_ids[0]),
        int(doc_ids[-1]),
    )


def decode_block(
    doc_deltas: bytes,
    tfs: bytes,
    dls: bytes,
    n: int,
    first_doc_id: int,
    codec: str = CODEC_VARINT,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = np.empty(n, np.int64)
    ids[0] = first_doc_id
    if n > 1:
        ids[1:] = _dec(codec, doc_deltas, n - 1).astype(np.int64)
        np.cumsum(ids, out=ids)
    return ids, _dec(codec, tfs, n).astype(np.int64), _dec(codec, dls, n).astype(np.int64)
