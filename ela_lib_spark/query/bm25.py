"""Closed-form BM25 over flat postings — pure `pyspark.sql.functions`
(zero Python in the plan; whole-stage codegen end to end).

This is the Step-1 path from SURVEY.md §7: join query terms to
postings, join doc stats, groupBy-sum, orderBy-limit. It doubles as the
SQL-expressible oracle surface (DuckDB runs the equivalent SQL), while
the block-max WAND executor (query/wand.py) is the scale path over the
compressed index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ela_lib_spark import BM25_B, BM25_K1


def flat_postings(tokens_df: DataFrame) -> DataFrame:
    """(doc_id, tokens:array) → (term, doc_id, tf). explode + count —
    Catalyst does partial aggregation map-side."""
    ex = tokens_df.select("doc_id", F.explode("tokens").alias("term"))
    return ex.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def doc_lens(tokens_df: DataFrame) -> DataFrame:
    return tokens_df.select(
        "doc_id", F.size("tokens").cast("long").alias("doc_len")
    )


def bm25_score_col(tf, doc_len, df, n_docs: int, avg_dl: float):
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5)
    )
    return (
        idf
        * F.lit(BM25_K1 + 1.0)
        * tf
        / (tf + F.lit(BM25_K1) * (1.0 - BM25_B + F.lit(BM25_B) * doc_len / F.lit(avg_dl)))
    )


def bm25_topk_flat(
    postings: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avg_dl: float,
    terms: list[str],
    mode: str = "OR",
    k: int = 10,
    min_match: int | None = None,
) -> DataFrame:
    """Top-k BM25 with built-ins only. `postings` must cover the whole
    corpus (df is derived by counting within the term filter).
    `min_match=m` requires ≥ m distinct matched terms per doc.

    When `postings` already carries a `doc_len` column (a corpus
    prepared with the length pre-joined — the serving-cache layout),
    pass doc_stats=None: the per-query doc-stats join disappears from
    the plan entirely (r6 — the join cost was re-paid on every query
    for an invariant corpus attribute). A pre-attached `df` column is
    honored the same way (r6): per-term document frequency is as much
    a corpus invariant as doc_len, so a prepared corpus can carry it
    and the per-query groupBy + broadcast-join subquery disappears —
    the query plan becomes one linear pass over the pruned postings.
    The values are identical by construction: the filter keeps whole
    term groups, so counting within it equals the global per-term
    count."""
    q = postings.filter(F.col("term").isin(terms))
    if "df" in postings.columns:
        joined = q
    else:
        dfs = q.groupBy("term").agg(F.count("*").alias("df"))
        # dfs has ≤ len(terms) rows — broadcast, no shuffle this join
        joined = q.join(F.broadcast(dfs), "term")
    if doc_stats is not None:
        joined = joined.join(doc_stats, "doc_id")
    scored = joined.select(
        "doc_id",
        bm25_score_col(
            F.col("tf").cast("double"), F.col("doc_len"), F.col("df"), n_docs, avg_dl
        ).alias("contrib"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("score"), F.count("*").alias("n_terms")
    )
    need = (len(set(terms)) if mode.upper() == "AND"
            else max(1, int(min_match or 1)))
    if need > 1:
        agg = agg.filter(F.col("n_terms") >= need)
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
