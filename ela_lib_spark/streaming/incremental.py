"""Incremental index maintenance (SURVEY.md §2.8 G6).

The reference has no incremental path (restart = full re-run); its
continuous piece is the dual-write gateway
(/root/reference/service/gateway/gateway.go:160-217), an at-most-once
async replica. We upgrade the semantics to at-least-once, idempotent:

- Structured Streaming over a directory of arriving web_pages parquet
  (`readStream` — swap for Kafka/Iceberg-CDC source on a cluster),
- `foreachBatch`: tokenize the micro-batch, build a *delta postings*
  segment with the SAME SPIMI kernel as the bulk build, append it to a
  `delta_chunks` dataset keyed by epoch (idempotent: an epoch directory
  is overwritten on replay),
- queries read base + delta (the classic main-index + in-memory-segment
  design, here main + delta tables); a periodic `compact()` folds
  deltas into the base via the normal merge stage.

Doc ids for streamed docs come from the same deterministic
(bucket, rank) scheme offset into a reserved high-bucket range, so they
never collide with bulk ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ela_lib_spark.index.build import build_chunks
from ela_lib_spark.schemas import WEB_PAGES

DELTA_BUCKET_BASE = 1 << 20  # streamed buckets live above bulk buckets


def apply_delta_batch(
    batch_df: DataFrame, epoch_id: int, index_dir: str, n_buckets: int = 8
) -> None:
    """foreachBatch body: SPIMI-chunk the micro-batch and commit it
    under an epoch-keyed path (replay-idempotent overwrite)."""
    chunks = build_chunks(batch_df, n_buckets, use_html=False)
    chunks = chunks.withColumn(
        "part_id", (F.col("part_id") + F.lit(DELTA_BUCKET_BASE + epoch_id * n_buckets)).cast("int")
    )
    out = os.path.join(index_dir, "delta_chunks", f"epoch={epoch_id}")
    chunks.write.mode("overwrite").parquet(out)


def incremental_index_maintenance(
    spark: SparkSession,
    incoming_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Start the maintenance stream. Caller stops it (or uses
    trigger(availableNow) semantics via processAllAvailable in tests)."""
    stream = (
        spark.readStream.schema(WEB_PAGES).parquet(incoming_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, epoch: apply_delta_batch(df, epoch, index_dir, n_buckets)
        )
        .start()
    )


def read_delta_postings(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = os.path.join(index_dir, "delta_chunks")
    if not os.path.exists(p):
        return None
    return spark.read.option("basePath", p).parquet(p)
