"""Dual-sink idempotent write — the gateway's master/slave dual write
(SURVEY.md §2.8 G3) upgraded from at-most-once to at-least-once.

Reference behavior (/root/reference/service/gateway/gateway.go:160-217):
master write synchronous; slave written asynchronously fire-and-forget
(no retry, no ordering). Here both sinks are written inside one
foreachBatch with key-idempotent upserts, so Structured Streaming's
checkpointed epoch gives at-least-once on BOTH sinks and replays
converge (upsert on `url` is idempotent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_parquet(batch: DataFrame, path: str, key: str) -> None:
    """Key-idempotent upsert into a parquet dataset (MERGE emulation;
    becomes a real `MERGE INTO` on Iceberg/Delta)."""
    spark = batch.sparkSession
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        existing = spark.read.parquet(path)
        keep = existing.join(batch.select(key), key, "left_anti")
        out = keep.unionByName(batch)
    else:
        out = batch
    # write-audit-publish: stage, then atomic swap
    staged = path + ".staging"
    out.write.mode("overwrite").parquet(staged)
    tmp_old = path + ".old"
    if os.path.exists(path):
        os.rename(path, tmp_old)
    os.rename(staged, path)
    if os.path.exists(tmp_old):
        import shutil

        shutil.rmtree(tmp_old, ignore_errors=True)


def dual_write_stream(
    spark: SparkSession,
    incoming_dir: str,
    master_path: str,
    slave_path: str,
    checkpoint_dir: str,
    schema,
    key: str = "url",
):
    """readStream over arriving files → upsert BOTH sinks per epoch."""

    def write_both(batch: DataFrame, epoch_id: int) -> None:
        b = batch.dropDuplicates([key]).localCheckpoint(eager=True)
        upsert_parquet(b, master_path, key)
        upsert_parquet(b, slave_path, key)

    return (
        spark.readStream.schema(schema)
        .parquet(incoming_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_both)
        .start()
    )


def verify_replicas(master: DataFrame, slave: DataFrame, key: str = "url") -> dict:
    """Replica consistency check — the compare action applied to the
    gateway's two sinks."""
    from ela_lib_spark.operators.diff import classify_diff, diff_result

    return diff_result(classify_diff(master, slave, key))
