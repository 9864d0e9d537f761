"""Dual-sink idempotent write — the gateway's master/slave dual write
(SURVEY.md §2.8 G3) upgraded from at-most-once to at-least-once.

Reference behavior (/root/reference/service/gateway/gateway.go:160-217):
master write synchronous; slave written asynchronously fire-and-forget
(no retry, no ordering). Here both sinks are written inside one
foreachBatch with key-idempotent upserts, so Structured Streaming's
checkpointed epoch gives at-least-once on BOTH sinks and replays
converge (upsert on the key is idempotent).

Scale (VERDICT r1 fix): the sink is hash-bucketed on the key
(`_kb = pmod(xxhash64(key), n_buckets)` directory partitions) and each
micro-batch rewrites ONLY the buckets it touches via dynamic partition
overwrite — per-epoch IO is O(batch ∪ touched buckets), not O(sink).
Untouched buckets' files are left byte-identical (asserted in
tests/test_dual_write_and_tasks.py). On Iceberg/Delta this whole
function becomes a single `MERGE INTO`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_kb"


def _bucket_expr(key: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")


def upsert_parquet(batch: DataFrame, path: str, key: str,
                   n_buckets: int = 64) -> None:
    """Key-idempotent bucket-scoped upsert into a parquet dataset.

    Only bucket partitions present in the batch are read (partition
    pruning) and rewritten (dynamic partition overwrite). A crash mid-
    commit leaves some buckets updated and others not — the streaming
    replay re-applies the same idempotent upsert and converges."""
    spark = batch.sparkSession
    b = batch.withColumn(BUCKET_COL, _bucket_expr(key, n_buckets))
    # NOTE: dynamic-partition-overwrite commits do NOT write a root
    # _SUCCESS marker — detect an existing sink by its partition dirs.
    sink_exists = os.path.isdir(path) and any(
        name.startswith(f"{BUCKET_COL}=") for name in os.listdir(path)
    )
    if sink_exists:
        touched = [r[0] for r in b.select(BUCKET_COL).distinct().collect()]
        existing = spark.read.parquet(path).filter(
            F.col(BUCKET_COL).isin(touched)
        )
        keep = existing.join(b.select(key), key, "left_anti")
        # materialize BEFORE the overwrite: the plan reads the same path
        # it writes, and a lazy scan under an in-place overwrite silently
        # loses the kept rows (read-modify-overwrite hazard). The
        # checkpoint is bucket-scoped — O(touched buckets), not O(sink).
        out = keep.unionByName(b).localCheckpoint(eager=True)
    else:
        out = b
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a dual-write sink without its physical bucket column."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def dual_write_stream(
    spark: SparkSession,
    incoming_dir: str,
    master_path: str,
    slave_path: str,
    checkpoint_dir: str,
    schema,
    key: str = "url",
    n_buckets: int = 64,
):
    """readStream over arriving files → upsert BOTH sinks per epoch."""

    def write_both(batch: DataFrame, epoch_id: int) -> None:
        b = batch.dropDuplicates([key]).localCheckpoint(eager=True)
        upsert_parquet(b, master_path, key, n_buckets)
        upsert_parquet(b, slave_path, key, n_buckets)

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
