"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side `aggregate`/`zip_with` dot
  product — no Python in the plan, SQL-expressible for the oracle.
- LSH-bucketed ANN (signed random projections): scale path — buckets
  prune the candidate set; rerank within buckets is exact cosine.
- batch kNN join (query set × corpus) via bucket equi-join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot_with_lit(vec_col, q: list[float]) -> Column:
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, qlit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(vec_col) -> Column:
    return F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_sim_col(vec_col, q: list[float]) -> Column:
    qn = float(np.sqrt(np.dot(q, q)))
    return _dot_with_lit(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def cosine_topk(
    df: DataFrame, q: list[float], k: int = 10,
    vec_col: str = "embedding", key: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine — the correctness baseline.
    Whole-corpus scan, but embarrassingly parallel: per-partition
    top-k then global limit (Spark's TakeOrdered does exactly this)."""
    return (
        df.select(key, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


def srp_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_bucket_col(vec_col, planes: np.ndarray) -> Column:
    """Signed-random-projection bucket id: bit i = sign(v · plane_i).
    Pure column expression (sum of shifted sign bits)."""
    bits = []
    for i, p in enumerate(planes):
        dot = _dot_with_lit(vec_col, [float(x) for x in p])
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_srp(
    df: DataFrame, q: list[float], k: int = 10,
    vec_col: str = "embedding", key: str = "vec_id",
    n_planes: int = 12, probe_hamming: int = 1, seed: int = 42,
) -> DataFrame:
    """ANN: scan only buckets within `probe_hamming` bit flips of the
    query's bucket (multi-probe SRP-LSH), exact rerank inside.

    At scale the corpus is written partitioned by bucket → partition
    pruning makes this a tiny fraction of a full scan. Recall is
    tunable via n_planes/probe_hamming.
    """
    planes = srp_planes(len(q), n_planes, seed)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if np.dot(p, q) >= 0))
    probes = [qbits]
    if probe_hamming >= 1:
        probes += [qbits ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probes += [
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    bucketed = df.withColumn("_bucket", srp_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return (
        cand.select(key, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame, key: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_planes: int = 8, seed: int = 42, dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: SRP bucket equi-join prunes pairs,
    exact cosine verifies. Same-bucket constraint trades recall for a
    shuffle that moves (bucket, key, vec) instead of all pairs."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = srp_planes(dim, n_planes, seed)
    b = df.select(key, vec_col).withColumn("_bucket", srp_bucket_col(F.col(vec_col), planes))
    l = b.select(F.col(key).alias("a"), F.col(vec_col).alias("va"), "_bucket")
    r = b.select(F.col(key).alias("b"), F.col(vec_col).alias("vb"), "_bucket")
    pairs = l.join(r, "_bucket").filter(F.col("a") < F.col("b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0),
                      lambda acc, v: acc + v)
    cos = dot / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
        .distinct()
    )
