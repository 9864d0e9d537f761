"""Compute driver-verifiable pinned fixtures for the rows-only entry
queries (the four whose kernels DuckDB cannot express: xxhash64-based
MinHash/SimHash/winnowing and the IVF k-means quantizer).

Pure Python/numpy over the sf0.01 parquet — NO Spark, no engine
kernels beyond the parity-tested XXH64 twin (functions/xxh.py, proven
bit-identical to JVM xxhash64 in tests/test_text.py) and module-level
constants both sides must share by definition. The same derivations as
tests/test_pinned_oracles.py, re-run standalone so the expected
outputs can be COMMITTED (tests/fixtures/pinned_expected.json) and
re-checked round-over-round by tools/check_entry.py without pytest.

Usage: python tools/pin_fixtures.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import struct
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ela_lib_spark.functions.xxh import spark_xxhash64, xxhash64_bytes  # noqa: E402

M61 = (1 << 61) - 1
M64 = (1 << 64) - 1
_TOK = re.compile(r"[a-z0-9]+")


def _toks(text):
    return [] if text is None else _TOK.findall(text.lower())


def _xxh(s: str) -> int:
    h = spark_xxhash64(s)
    return h - (1 << 64) if h >= (1 << 63) else h


def _chain_xxh_longs(ls):
    h = 42
    for v in ls:
        h = xxhash64_bytes(struct.pack("<q", v), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def minhash_dedup_expected(docs: pd.DataFrame) -> list[list]:
    from ela_lib_spark.functions.hashing import minhash_params

    a_np, b_np = minhash_params(64)
    a, b = [int(x) for x in a_np], [int(x) for x in b_np]
    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        th = [_xxh(t) for t in _toks(text)]
        sh = ([_chain_xxh_longs(th[i:i + 3]) for i in range(len(th) - 2)]
              if len(th) >= 3 else [])
        if not sh:
            sigs[int(doc_id)] = [0] * 64
        else:
            xs = [(h & M64) % M61 for h in sh]
            sigs[int(doc_id)] = [
                min((ai * x + bi) % M61 for x in xs) for ai, bi in zip(a, b)
            ]
    buckets = {}
    for doc_id, sig in sigs.items():
        for band in range(16):
            bh = _xxh(",".join(str(v) for v in sig[band * 4:band * 4 + 4]))
            buckets.setdefault((band, bh), []).append(doc_id)
    parent = {d: d for d in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in buckets.values():
        if len(members) > 10_000:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                x, y = ms[i], ms[j]
                eq = sum(1 for u, v in zip(sigs[x], sigs[y]) if u == v)
                if eq / 64.0 >= 0.5:
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        parent[max(rx, ry)] = min(rx, ry)
    comp = {}
    for d in sigs:
        comp.setdefault(find(d), []).append(d)
    losers = {d for mem in comp.values() for d in mem if d != min(mem)}
    return [[d] for d in sorted(set(sigs) - losers)]


def simhash_pairs_expected(docs: pd.DataFrame) -> list[list]:
    sig = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = _toks(text)
        if not t:
            sig[int(doc_id)] = 0
            continue
        votes = np.zeros(64, np.int64)
        for tok in t:
            h = _xxh(tok) & M64
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            votes += np.where(bits.astype(bool), 1, -1)
        s = 0
        for i in range(64):
            if votes[i] > 0:
                s |= 1 << i
        sig[int(doc_id)] = s
    ids = sorted(sig)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(sig[ids[i]] ^ sig[ids[j]]).count("1")
            if ham <= 3:
                out.append([ids[i], ids[j], ham])
    return out


def winnow_overlap_expected(docs: pd.DataFrame) -> list[list]:
    K, W, BASE = 5, 4, 1000003

    def winnow(tokens):
        h = [_xxh(t) & M64 for t in tokens]
        if len(h) < K:
            return set()
        powers = [1] * K
        for i in range(K - 2, -1, -1):
            powers[i] = (powers[i + 1] * BASE) & M64
        rh = [sum(h[i + j] * powers[j] for j in range(K)) & M64
              for i in range(len(h) - K + 1)]
        sel = (set(rh) if len(rh) <= W
               else {min(rh[i:i + W]) for i in range(len(rh) - W + 1)})
        return {v - (1 << 64) if v >= (1 << 63) else v for v in sel}

    fps = {int(d): winnow(_toks(t))
           for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(fps)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            common = len(fps[ids[i]] & fps[ids[j]])
            if common >= 2:
                out.append([ids[i], ids[j], common])
    return out


def ann_ivf_expected(emb: pd.DataFrame) -> list[list]:
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), np.float64)
            for r in emb.itertuples()}
    q = vecs[0]
    corpus_ids = sorted(v for v in vecs if v != 0)
    x = np.array([vecs[v] for v in corpus_ids])
    cent = x[:16].copy()
    for _ in range(10):
        d2 = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = d2.argmin(axis=1)
        for c in range(16):
            m = assign == c
            if m.any():
                cent[c] = x[m].sum(axis=0) / m.sum()
    d2q = ((cent - q[None, :]) ** 2).sum(axis=1)
    probes = set(np.argsort(d2q)[:4].tolist())
    final = ((cent ** 2).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)).argmin(axis=1)
    qn = np.sqrt(q @ q)
    cands = [
        (float(x[i] @ q / (np.sqrt(x[i] @ x[i]) * qn)), corpus_ids[i])
        for i in range(len(corpus_ids)) if final[i] in probes
    ]
    cands.sort(key=lambda t: (-t[0], t[1]))
    return [[vid, round(c, 6)] for c, vid in cands[:10]]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), "tests", "fixtures",
               "pinned_expected.json"))
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    fixtures = {
        "sf_dir": sf_dir,
        "q_minhash_dedup": {"columns": ["doc_id"],
                            "rows": minhash_dedup_expected(docs)},
        "q_simhash_pairs": {"columns": ["a", "b", "hamming"],
                            "rows": simhash_pairs_expected(docs)},
        "q_winnow_overlap": {"columns": ["a", "b", "common_fps"],
                             "rows": winnow_overlap_expected(docs)},
        "q_ann_ivf": {"columns": ["vec_id", "cosine"],
                      "rows": ann_ivf_expected(emb)},
    }
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixtures, f, indent=1)
    for k, v in fixtures.items():
        if isinstance(v, dict):
            print(f"{k}: {len(v['rows'])} rows")
    print("wrote", out)


if __name__ == "__main__":
    main()
