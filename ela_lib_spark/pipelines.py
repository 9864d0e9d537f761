"""End-to-end training-data preparation pipeline: the composed form of
the engine's operators, in the order a 100 TB pretraining-data run
uses them.

    raw web_pages
      → extract text (frozen byte-identical extractor)
      → language filter (vectorized heuristic lang-ID)
      → quality filter (JVM column-expression score)
      → exact dedup (hash-aggregate, keep min key)
      → near-dup removal (MinHash-LSH + connected components)
      → cleaned corpus parquet [+ inverted index]

Stage order matters at scale: each stage shrinks the corpus before the
next, more expensive one runs — lang/quality are pure map-side column
work (no shuffle), exact dedup shuffles only (hash, key), and the
LSH stage — the only multi-shuffle stage — sees the smallest corpus.
Every stage is the already-tested operator; this module only composes
and reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def prepare_training_corpus(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    *,
    use_html: bool = False,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.8,
    key: str = "url",
) -> dict:
    """Run the full preparation chain and write the cleaned corpus.
    Returns per-stage row counts (the pipeline's DiffResult analog)."""
    from ela_lib_spark.functions.analysis import detect_lang, quality_score
    from ela_lib_spark.functions.text import extract_text
    from ela_lib_spark.operators.dedup import dedup_exact, dedup_minhash_lsh

    stats: dict[str, int] = {"input": pages.count()}

    docs = pages.withColumn(
        "text", extract_text(F.col("html")) if use_html else F.col("text")
    )
    docs = docs.withColumn("_lang", detect_lang(F.col("text"))).filter(
        F.col("_lang").isin(list(langs))
    )
    # one materialization boundary: lang+quality are recomputed by
    # every downstream action otherwise (two UDF passes per stage)
    docs = docs.withColumn("_q", quality_score(F.col("text"))).filter(
        F.col("_q") >= min_quality
    ).persist()
    try:
        stats["after_lang_quality"] = docs.count()

        deduped = dedup_exact(docs, key=key, text_col="text")
        stats["after_exact_dedup"] = deduped.count()

        deduped = dedup_minhash_lsh(
            deduped, key=key, text_col="text", threshold=near_dup_threshold
        )
        cleaned = deduped.drop("_lang", "_q")
        cleaned.write.mode("overwrite").parquet(out_path)
    finally:
        docs.unpersist()
    out = spark.read.parquet(out_path)
    stats["after_near_dedup"] = out.count()
    stats["removed_total"] = stats["input"] - stats["after_near_dedup"]
    return stats


def prepare_and_index(
    spark: SparkSession,
    pages: DataFrame,
    corpus_path: str,
    index_path: str,
    *,
    use_html: bool = False,
    n_buckets: int = 32,
    n_shards: int = 8,
    **prep_kwargs,
) -> dict:
    """prepare_training_corpus → build_index over the cleaned corpus.
    Returns {prep stats, index manifest}."""
    from ela_lib_spark.index.build import build_index

    stats = prepare_training_corpus(
        spark, pages, corpus_path, use_html=use_html, **prep_kwargs
    )
    cleaned = spark.read.parquet(corpus_path)
    manifest = build_index(
        spark, cleaned, index_path, n_buckets=n_buckets, n_shards=n_shards,
        use_html=False,
    )
    return {"prep": stats, "manifest": manifest}
