"""Independent ground-truth oracles for the rows-only driver queries
(VERDICT r1 "What's missing" #1).

Each test re-derives the EXACT sf0.01 output of a `__spark_entry__`
query with a from-scratch pure-Python/numpy implementation — no shared
kernels with the engine beyond the parity-tested XXH64 twin
(functions/xxh.py, asserted bit-identical to JVM xxhash64 in
tests/test_text.py) and module-level constants (stopword lists, LSH
parameters), which both sides must agree on by definition.

Covered: q_minhash_dedup, q_simhash_pairs, q_ann_srp,
q_image_features, q_lang_detect (also DuckDB-gated now), and the
xxhash64 doc_fingerprint variant.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)

M61 = (1 << 61) - 1
M64 = (1 << 64) - 1

_TOK = re.compile(r"[a-z0-9]+")


def _toks(text: str | None) -> list[str]:
    return [] if text is None else _TOK.findall(text.lower())


def _xxh(s: str) -> int:
    """Signed-int64 view of Spark xxhash64(seed=42) — via the twin."""
    from ela_lib_spark.functions.xxh import spark_xxhash64

    h = spark_xxhash64(s)
    return h - (1 << 64) if h >= (1 << 63) else h


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


# ------------------------------------------------------------- minhash


def _chain_xxh_longs(ls: list[int]) -> int:
    """Spark multi-arg xxhash64 over signed int64s: seed-chained XXH64
    of each value's little-endian 8 bytes."""
    import struct

    from ela_lib_spark.functions.xxh import xxhash64_bytes

    h = 42
    for v in ls:
        h = xxhash64_bytes(struct.pack("<q", v), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def _minhash_sig(shingle_hashes: list[int], a: list[int], b: list[int]) -> list[int]:
    if not shingle_hashes:
        return [0] * len(a)
    xs = [(h & M64) % M61 for h in shingle_hashes]
    return [min((ai * x + bi) % M61 for x in xs) for ai, bi in zip(a, b)]


def test_q_minhash_dedup_matches_pure_python(spark, docs_pdf):
    """Full pipeline oracle: token-hash → chained shingle hash →
    minhash → band → candidate → verify → union-find → keep-min — all
    in pure Python bigints."""
    import __spark_entry__ as entry
    from ela_lib_spark.functions.hashing import minhash_params

    a_np, b_np = minhash_params(64)
    a, b = [int(x) for x in a_np], [int(x) for x in b_np]

    sigs: dict[int, list[int]] = {}
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        t = _toks(text)
        th = [_xxh(tok) for tok in t]
        sh = ([_chain_xxh_longs(th[i:i + 3]) for i in range(len(th) - 2)]
              if len(th) >= 3 else [])
        sigs[int(doc_id)] = _minhash_sig(sh, a, b)

    # banding: 16 bands × 4 rows; band hash = xxh64 of comma-joined sig values
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for band in range(16):
            bh = _xxh(",".join(str(v) for v in sig[band * 4:band * 4 + 4]))
            buckets.setdefault((band, bh), []).append(doc_id)

    cand = set()
    for members in buckets.values():
        if len(members) > 10_000:
            continue  # max_bucket_size guard (no-op at this scale)
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    # verify: est jaccard = agreeing positions / 64 >= 0.5 (q threshold)
    parent = {d: d for d in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in cand:
        eq = sum(1 for u, v in zip(sigs[x], sigs[y]) if u == v)
        if eq / 64.0 >= 0.5:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)

    comp: dict[int, int] = {}
    for d in sigs:
        comp.setdefault(find(d), []).append(d)
    losers = {d for members in comp.values() for d in members if d != min(members)}
    expected = sorted(set(sigs) - losers)

    got = sorted(
        r.doc_id for r in entry.q_minhash_dedup(spark, SF_DIR).collect()
    )
    assert got == expected


# ------------------------------------------------------------- simhash


def test_q_simhash_pairs_matches_brute_hamming(spark, docs_pdf):
    """The Manku candidate scheme is recall-exact for hamming ≤ h
    (pigeonhole: ≥2 clean blocks ⇒ ≥1 shared 2-block key), so with no
    bucket drops the query output EQUALS brute-force all-pairs
    hamming ≤ 3 — computable independently in numpy."""
    import __spark_entry__ as entry

    sig = {}
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
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
    arr = np.array([sig[d] for d in ids], dtype=np.uint64)
    x = arr[:, None] ^ arr[None, :]
    ham = np.zeros(x.shape, np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    expected = set()
    ii, jj = np.nonzero(np.triu(ham <= 3, k=1))
    for i, j in zip(ii, jj):
        a, b = ids[int(i)], ids[int(j)]
        expected.add((min(a, b), max(a, b), int(ham[i, j])))

    got = {
        (r.a, r.b, r.hamming)
        for r in entry.q_simhash_pairs(spark, SF_DIR).collect()
    }
    assert got == expected


# ------------------------------------------------------------- ann srp


def test_q_ann_srp_matches_numpy(spark):
    import __spark_entry__ as entry

    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), np.float64)
            for r in emb.itertuples()}
    q = vecs[0]
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((10, len(q)))

    def bucket(v):
        return int(((planes @ v >= 0).astype(np.int64)
                    * (1 << np.arange(10))).sum())

    qb = bucket(q)
    probes = {qb} | {qb ^ (1 << i) for i in range(10)}
    cands = [vid for vid, v in vecs.items() if vid != 0 and bucket(v) in probes]
    qn = np.sqrt(q @ q)
    scored = sorted(
        ((float(vecs[vid] @ q / (np.sqrt(vecs[vid] @ vecs[vid]) * qn)), vid)
         for vid in cands),
        key=lambda t: (-t[0], t[1]),
    )[:10]

    got = entry.q_ann_srp(spark, SF_DIR).collect()
    assert [r.vec_id for r in got] == [vid for _, vid in scored]
    np.testing.assert_allclose(
        [r.cosine for r in got], [c for c, _ in scored], atol=1e-6
    )


# ------------------------------------------------------- image features


def test_q_image_features_matches_pure_python(spark):
    import __spark_entry__ as entry

    expected = {}
    for i in range(64):
        if i % 4 not in (0, 1):  # only kind == image survives the filter
            continue
        w, h = 64 + (i % 8) * 16, 48 + (i % 5) * 16
        payload = struct.pack("<II", w, h) + bytes(
            (i * 7 + j) % 256 for j in range(120)
        )
        expected[i] = (w, h, hashlib.sha256(payload).hexdigest())

    got = {
        r.media_id: (r.width, r.height, r.sha256)
        for r in entry.q_image_features(spark, SF_DIR).collect()
    }
    assert got == expected


# ----------------------------------------------------------- lang + fp


def test_q_lang_detect_matches_pure_python(spark, docs_pdf):
    """Per-row Python re-derivation (independent of the numpy kernel
    AND of the new DuckDB oracle SQL)."""
    import __spark_entry__ as entry
    from ela_lib_spark.functions.analysis import LANG_STOPWORDS

    langs = sorted(LANG_STOPWORDS)
    expected = {}
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        if text is None:
            expected[int(doc_id)] = None
            continue
        toks = text.lower().split()[:200]
        counts = [sum(1 for t in toks if t in LANG_STOPWORDS[lg]) for lg in langs]
        expected[int(doc_id)] = (
            "und" if not counts or max(counts) == 0
            else langs[counts.index(max(counts))]
        )

    got = {r.doc_id: r.detected
           for r in entry.q_lang_detect(spark, SF_DIR).collect()}
    assert got == expected


def test_doc_fingerprint_xxhash64_matches_twin(spark, docs_pdf):
    from pyspark.sql import functions as F

    from ela_lib_spark.functions.analysis import doc_fingerprint

    sample = docs_pdf.head(50)
    sdf = spark.createDataFrame(sample[["doc_id", "text"]])
    got = {r.doc_id: r.fp for r in sdf.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    for doc_id, text in zip(sample["doc_id"], sample["text"]):
        assert got[int(doc_id)] == _xxh("\x1f".join(_toks(text)))


def _half_up6(x: float) -> float:
    import math

    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def test_q_embed_near_dup_matches_numpy(spark):
    import __spark_entry__ as entry

    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), np.float64)
            for r in emb.itertuples()}
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((4, 64))

    def bucket(v):
        return int(((planes @ v >= 0).astype(np.int64)
                    * (1 << np.arange(4))).sum())

    by_bucket: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        by_bucket.setdefault(bucket(v), []).append(vid)
    expected = set()
    for members in by_bucket.values():
        ms = sorted(members)
        for i in range(len(ms)):
            a = vecs[ms[i]]
            na = np.sqrt(a @ a)
            for j in range(i + 1, len(ms)):
                b = vecs[ms[j]]
                c = _half_up6(float(a @ b / (na * np.sqrt(b @ b))))
                if c >= 0.25:
                    expected.add((ms[i], ms[j], c))

    got = {(r.a, r.b, r.cosine)
           for r in entry.q_embed_near_dup(spark, SF_DIR).collect()}
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in expected}
    exp_by_pair = {(a, b): c for a, b, c in expected}
    for a, b, c in got:
        assert abs(c - exp_by_pair[(a, b)]) < 1e-5, (a, b, c)


def test_q_knn_join_matches_numpy(spark):
    import __spark_entry__ as entry

    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), np.float64)
            for r in emb.itertuples()}
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64))

    def bucket(v):
        return int(((planes @ v >= 0).astype(np.int64)
                    * (1 << np.arange(8))).sum())

    corpus = {vid: v for vid, v in vecs.items() if vid >= 5}
    cb = {vid: bucket(v) for vid, v in corpus.items()}
    expected = {}
    for qid in range(5):
        qv = vecs[qid]
        qb = bucket(qv)
        probes = {qb} | {qb ^ (1 << i) for i in range(8)}
        qn = np.sqrt(qv @ qv)
        cands = [
            (float(corpus[vid] @ qv / (np.sqrt(corpus[vid] @ corpus[vid]) * qn)), vid)
            for vid in corpus if cb[vid] in probes
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        expected[qid] = [(vid, c, rk + 1) for rk, (c, vid) in enumerate(cands[:5])]

    rows = entry.q_knn_join(spark, SF_DIR).collect()
    got: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.q_id, r.rank)):
        got.setdefault(r.q_id, []).append((r.vec_id, r.cosine, r.rank))
    assert set(got) == set(expected)
    for qid in expected:
        assert [(v, rk) for v, _, rk in got[qid]] == [
            (v, rk) for v, _, rk in expected[qid]
        ], (qid, got[qid], expected[qid])
        np.testing.assert_allclose(
            [c for _, c, _ in got[qid]], [c for _, c, _ in expected[qid]],
            atol=1e-5,
        )


def test_q_winnow_overlap_matches_pure_python(spark, docs_pdf):
    """Winnowing re-derived with Python ints: Karp-Rabin mod-2^64
    rolling hash over xxh64 token hashes, min-per-window selection,
    then the pair-count join."""
    import __spark_entry__ as entry

    K, W, BASE = 5, 4, 1000003

    def winnow(tokens: list[str]) -> set[int]:
        h = [_xxh(t) & M64 for t in tokens]
        if len(h) < K:
            return set()
        powers = [1] * K
        for i in range(K - 2, -1, -1):
            powers[i] = (powers[i + 1] * BASE) & M64
        rh = [
            sum(h[i + j] * powers[j] for j in range(K)) & M64
            for i in range(len(h) - K + 1)
        ]
        if len(rh) <= W:
            sel = set(rh)
        else:
            sel = {min(rh[i:i + W]) for i in range(len(rh) - W + 1)}
        return {v - (1 << 64) if v >= (1 << 63) else v for v in sel}

    fps = {int(d): winnow(_toks(t))
           for d, t in zip(docs_pdf["doc_id"], docs_pdf["text"])}
    ids = sorted(fps)
    expected = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            common = len(fps[ids[i]] & fps[ids[j]])
            if common >= 2:
                expected[(ids[i], ids[j])] = common

    got = {(r.a, r.b): r.common_fps
           for r in entry.q_winnow_overlap(spark, SF_DIR).collect()}
    assert got == expected


def test_q_ann_ivf_matches_numpy(spark):
    """Full IVF re-derivation: deterministic sample (smallest keys),
    first-n init, fixed Lloyd iterations, probe-list selection, exact
    cosine rerank."""
    import __spark_entry__ as entry

    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
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
    expected = cands[:10]

    got = entry.q_ann_ivf(spark, SF_DIR).collect()
    assert [r.vec_id for r in got] == [vid for _, vid in expected]
    np.testing.assert_allclose(
        [r.cosine for r in got], [c for c, _ in expected], atol=1e-6
    )
