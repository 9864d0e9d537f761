"""Property tests for the chunk-store GC rewrite kernel
(streaming/incremental._gc_transform) — pure pandas/numpy, no Spark.

Two properties over randomized chunk stores and tombstone sets:
1. semantic: decoding the rewritten chunks yields exactly the input
   postings minus the tombstoned doc ids, per (term, part), with tf/dl
   values carried through untouched;
2. cogroup-split equivalence: running the kernel per part with ONLY
   that part's tombstones (what the distributed cogroup path does)
   produces the same surviving postings as one run with the full set —
   the partitioning is semantically invisible.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ela_lib_spark.index.codecs import varint_decode, varint_encode
from ela_lib_spark.streaming.incremental import _gc_transform

DOC_BITS = 40


@st.composite
def chunk_store(draw):
    """A tiny random chunk store: per (term, part), 1-2 chunk rows of
    ascending doc ids within the part's bucket range, plus the part's
    candidate tombstones."""
    n_parts = draw(st.integers(1, 3))
    n_terms = draw(st.integers(1, 4))
    rows = []
    truth = {}  # (term, part) -> list[(doc, tf, dl)]
    all_docs = set()
    for p in range(n_parts):
        base = p << DOC_BITS
        for t in range(n_terms):
            if not draw(st.booleans()):
                continue
            n = draw(st.integers(1, 12))
            offs = sorted(draw(st.sets(st.integers(0, 200),
                                       min_size=n, max_size=n)))
            docs = [base + o for o in offs]
            tfs = [draw(st.integers(1, 9)) for _ in docs]
            dls = [draw(st.integers(1, 500)) for _ in docs]
            truth[(t, p)] = list(zip(docs, tfs, dls))
            all_docs.update(docs)
            # split into 1-2 chunk rows (delta stream restarts per row)
            cut = draw(st.integers(1, len(docs))) if len(docs) > 1 else 1
            for seg in ([docs[:cut], docs[cut:]] if cut < len(docs)
                        else [docs]):
                if not seg:
                    continue
                i0 = docs.index(seg[0])
                seg_tf = tfs[i0:i0 + len(seg)]
                seg_dl = dls[i0:i0 + len(seg)]
                deltas = np.diff(np.array([seg[0]] + list(seg)))
                rows.append({
                    "term_id": t, "part_id": p, "shard": 0,
                    "doc_ids": varint_encode(deltas.astype(np.int64)),
                    "tfs": varint_encode(np.array(seg_tf, np.int64)),
                    "dls": varint_encode(np.array(seg_dl, np.int64)),
                    "n_docs": len(seg), "first_doc_id": seg[0],
                })
    dead = draw(st.sets(st.sampled_from(sorted(all_docs))
                        if all_docs else st.integers(0, 0), max_size=8))
    return pd.DataFrame(rows), truth, np.array(sorted(dead), np.int64)


def _decode_out(frames):
    got = {}
    for f in frames:
        for r in f.itertuples(index=False):
            deltas = varint_decode(r.doc_ids, r.n_docs).astype(np.int64)
            ids = np.cumsum(deltas) + r.first_doc_id
            tfs = varint_decode(r.tfs, r.n_docs)
            dls = varint_decode(r.dls, r.n_docs)
            got.setdefault((r.term_id, r.part_id), []).extend(
                zip(ids.tolist(), tfs.tolist(), dls.tolist()))
    return {k: sorted(v) for k, v in got.items()}


@settings(max_examples=60, deadline=None)
@given(chunk_store())
def test_gc_transform_drops_exactly_the_tombstones(case):
    pdf, truth, dead = case
    if len(pdf) == 0:
        return
    out = _gc_transform(pdf, dead, {})
    got = _decode_out(out)
    want = {
        k: sorted((d, tf, dl) for d, tf, dl in v if d not in set(dead.tolist()))
        for k, v in truth.items()
    }
    want = {k: v for k, v in want.items() if v}
    assert got == want


@settings(max_examples=60, deadline=None)
@given(chunk_store())
def test_gc_transform_cogroup_split_equivalent(case):
    pdf, _truth, dead = case
    if len(pdf) == 0:
        return
    full = _decode_out(_gc_transform(pdf, dead, {}))
    split_frames = []
    for p in sorted(pdf["part_id"].unique()):
        part_pdf = pdf[pdf["part_id"] == p].reset_index(drop=True)
        part_dead = dead[(dead >> DOC_BITS) == p]  # the cogroup routing
        split_frames.extend(_gc_transform(part_pdf, part_dead, {}))
    assert _decode_out(split_frames) == full
