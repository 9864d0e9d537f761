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

Publish atomicity: compaction writes postings/chunks into *versioned*
snapshot directories and flips the `postings_dir`/`chunks_dir` pointers
in manifest.json via an atomic os.replace — a crash at any point leaves
either the old or the new snapshot fully readable (never a window with
no postings directory).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ela_lib_spark.schemas import WEB_PAGES

DELTA_BUCKET_BASE = 1 << 20  # streamed buckets live above bulk buckets


def apply_delta_batch(
    batch_df: DataFrame, epoch_id: int, index_dir: str, n_buckets: int = 8
) -> None:
    """foreachBatch body: SPIMI-chunk the micro-batch and commit it
    under an epoch-keyed path (replay-idempotent overwrite).

    Streamed docs get bucket/doc ids shifted into a per-epoch reserved
    range ABOVE all bulk buckets, so ids never collide with the base
    index — required for compaction to interleave postings correctly."""
    from ela_lib_spark.index.build import (
        DOC_BITS,
        chunks_from_docs,
        doc_stats_from_docs,
        docs_with_term_ids,
    )

    offset = DELTA_BUCKET_BASE + epoch_id * n_buckets
    docs = docs_with_term_ids(batch_df, n_buckets)
    docs = docs.withColumn("bucket", (F.col("bucket") + offset).cast("int")).withColumn(
        "doc_id", F.col("doc_id") + (offset << DOC_BITS)
    )
    out = os.path.join(index_dir, "delta_chunks", f"epoch={epoch_id}")
    chunks_from_docs(docs).write.mode("overwrite").parquet(out)
    # doc dictionary for the streamed docs (url ↔ doc_id ↔ doc_len)
    ds_out = os.path.join(index_dir, "delta_doc_stats", f"epoch={epoch_id}")
    doc_stats_from_docs(docs).write.mode("overwrite").parquet(ds_out)


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


def compact_index(spark: SparkSession, index_dir: str, n_shards: int = 8) -> dict:
    """Fold accumulated delta chunks into the base index: re-run the
    normal salted merge over base ∪ delta chunks, refresh corpus stats,
    and atomically republish via versioned snapshot dirs + a manifest
    pointer flip (the parquet stand-in for an Iceberg snapshot swap).

    The main-index + delta-segment + periodic-compaction design is the
    classic Lucene segment model, expressed as two Spark tables."""
    import shutil

    from pyspark.sql import functions as F2

    from ela_lib_spark.index.build import (
        METRICS_TERM_ID,
        chunks_path,
        merge_chunks,
        read_manifest,
        write_manifest,
    )

    base = spark.read.parquet(chunks_path(index_dir))
    delta = read_delta_postings(spark, index_dir)
    if delta is None:
        return {"compacted_epochs": 0}
    n_epochs = delta.select("epoch").distinct().count()
    delta = delta.drop("epoch")
    chunks = base.unionByName(delta)

    manifest = read_manifest(index_dir)
    metrics = chunks.filter(F2.col("term_id") == METRICS_TERM_ID)
    n_docs, n_tokens = metrics.agg(
        F2.sum("n_docs"), F2.sum("first_doc_id")
    ).first()
    avg_dl = float(n_tokens) / float(n_docs)

    gen = int(manifest.get("compaction_gen", 0)) + 1
    old_chunks = os.path.join(index_dir, manifest["chunks_dir"])
    old_postings = os.path.join(index_dir, manifest["postings_dir"])
    new_postings_name = f"postings-c{gen}"
    new_chunks_name = f"chunks-c{gen}"

    merged = merge_chunks(chunks, avg_dl, n_shards, manifest["n_buckets"],
                          manifest["codec"])
    merged.write.mode("overwrite").parquet(
        os.path.join(index_dir, new_postings_name)
    )
    # fold delta chunks into the base chunk set for future compactions —
    # keeping the is_m metrics-sidecar partitioning, or every later
    # resume/ledger scan degrades to reading all posting bytes
    chunks.write.mode("overwrite").partitionBy("is_m").parquet(
        os.path.join(index_dir, new_chunks_name)
    )

    # refresh the control tables the manifest's n_docs/avg_dl describe
    # (corpus_stats + per-bucket ledger) — load_index must never return
    # datasets that contradict the manifest after a compaction
    from ela_lib_spark.index.build import _write_small_parquet

    ledger_rows = (
        metrics.groupBy("part_id")
        .agg(
            F2.sum("n_docs").cast("long").alias("n_docs"),
            F2.sum("first_doc_id").cast("long").alias("n_tokens"),
            (F2.max("shard") / 1000.0).alias("secs"),
        )
        .collect()
    )
    snapshot = f"compact-{gen}"
    _write_small_parquet(
        os.path.join(index_dir, "ledger"),
        {
            "part_id": [int(r.part_id) for r in ledger_rows],
            "status": ["done"] * len(ledger_rows),
            "n_docs": [int(r.n_docs) for r in ledger_rows],
            "n_tokens": [int(r.n_tokens) for r in ledger_rows],
            "secs": [float(r.secs) for r in ledger_rows],
            "snapshot_id": [snapshot] * len(ledger_rows),
        },
        "part_id int32, status string, n_docs int64, n_tokens int64, "
        "secs double, snapshot_id string",
    )
    _write_small_parquet(
        os.path.join(index_dir, "corpus_stats"),
        {"n_docs": [int(n_docs)], "avg_dl": [float(avg_dl)]},
        "n_docs int64, avg_dl double",
    )

    # single atomic commit point: the manifest pointer flip
    manifest["postings_dir"] = new_postings_name
    manifest["chunks_dir"] = new_chunks_name
    manifest["compaction_gen"] = gen
    manifest["snapshot_id"] = f"compact-{gen}"
    manifest["n_docs"] = int(n_docs)
    manifest["avg_dl"] = avg_dl
    write_manifest(index_dir, manifest)

    # post-commit cleanup (safe: readers resolve via the manifest)
    shutil.rmtree(old_postings, ignore_errors=True)
    shutil.rmtree(old_chunks, ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "delta_chunks"), ignore_errors=True)
    return {"compacted_epochs": int(n_epochs), "n_docs": int(n_docs)}
