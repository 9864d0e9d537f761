"""Brute-force BM25 reference scorer (the rank-identity oracle).

Independent of the index: scores every document from raw token lists
with plain Python/numpy, no Spark. Plays the role the reference's
`compare` action plays for migration (the tool ships its own oracle —
/root/reference/service/task/migrator.go:777-910): an exhaustive
ground truth the fast path must match exactly.

Float semantics are shared with the WAND executor via
query/scoring.bm25_contrib; accumulation is in lexicographic term
order — so matching is exact float64 equality, not approximate.
"""

from __future__ import annotations

import numpy as np

from ela_lib_spark.query.scoring import bm25_contrib, idf


def brute_topk(
    doc_tokens: dict[int, list[str]],
    terms: list[str],
    mode: str = "OR",
    k: int = 10,
    n_docs: int | None = None,
    avg_dl: float | None = None,
    min_match: int | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k [(doc_id, score)] with ties broken by doc_id asc.

    Pass the engine's manifest n_docs/avg_dl so corpus constants are
    bit-identical to the indexed values. `min_match=m` requires ≥ m
    distinct query terms per doc (OR = 1, AND = all — m generalizes
    both, the original WAND formulation)."""
    if n_docs is None:
        n_docs = len(doc_tokens)
    if avg_dl is None:
        avg_dl = sum(len(v) for v in doc_tokens.values()) / n_docs
    terms_sorted = sorted(set(terms))
    score: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for t in terms_sorted:
        ids, tfs, dls = [], [], []
        for d in doc_tokens:
            toks = doc_tokens[d]
            tf = toks.count(t)
            if tf:
                ids.append(d)
                tfs.append(tf)
                dls.append(len(toks))
        if not ids:
            continue
        idf_t = float(idf(len(ids), n_docs))
        contrib = bm25_contrib(
            np.asarray(tfs, np.int64), np.asarray(dls, np.int64), idf_t, avg_dl
        )
        for d, c in zip(ids, contrib):
            score[d] = score.get(d, 0.0) + float(c)
            cnt[d] = cnt.get(d, 0) + 1
    need = (len(terms_sorted) if mode.upper() == "AND"
            else max(1, int(min_match or 1)))
    if need > 1:
        score = {d: s for d, s in score.items() if cnt[d] >= need}
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
