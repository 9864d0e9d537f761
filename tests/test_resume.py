"""Resumable build (north rule: checkpoint + per-partition lineage).

Simulate a crash: build with half the buckets' chunks committed, then
resume and assert the final index is identical to a single-shot build.
"""

import os

from pyspark.sql import functions as F

from ela_lib_spark.index.build import (
    METRICS_TERM,
    build_chunks,
    build_doc_stats,
    build_index,
    load_index,
)


def _postings_fingerprint(postings):
    return (
        postings.select(
            F.bit_xor(F.xxhash64("term", "shard", "block_id", "first_doc_id",
                                 "last_doc_id", "doc_ids_delta", "tfs", "dls",
                                 "n_docs", "df")).alias("h"),
            F.count("*").alias("n"),
        )
        .first()
    )


def test_resume_after_partial_build(spark, tmp_root):
    from ela_lib_spark.sources.synth import write_web_pages

    small = os.path.join(tmp_root, "pages_small")
    write_web_pages(spark, 500, small, num_partitions=2)
    pages = spark.read.parquet(small)
    full_dir = os.path.join(tmp_root, "idx_full")
    part_dir = os.path.join(tmp_root, "idx_partial")

    build_index(spark, pages, full_dir, n_buckets=8, n_shards=4, use_html=True)

    # simulate a crashed run: doc_stats written, chunks only for buckets 0-3
    build_doc_stats(pages, 8, use_html=True).write.mode("overwrite").parquet(
        os.path.join(part_dir, "doc_stats")
    )
    half = build_chunks(pages, 8, use_html=True, skip_buckets={4, 5, 6, 7})
    half.write.mode("overwrite").parquet(os.path.join(part_dir, "chunks"))
    # derive the ledger exactly like build_index does (data-derived)
    chunks = spark.read.parquet(os.path.join(part_dir, "chunks"))
    (
        chunks.filter(F.col("term") == METRICS_TERM)
        .groupBy("part_id")
        .agg(F.sum("n_docs").cast("long").alias("n_docs"),
             F.sum("first_doc_id").cast("long").alias("n_tokens"),
             (F.max("shard") / 1000.0).alias("secs"))
        .withColumn("status", F.lit("done"))
        .withColumn("snapshot_id", F.lit("crashed-run"))
        .select("part_id", "status", "n_docs", "n_tokens", "secs", "snapshot_id")
        .write.mode("overwrite").parquet(os.path.join(part_dir, "ledger"))
    )
    done_before = {r.part_id for r in
                   spark.read.parquet(os.path.join(part_dir, "ledger")).collect()}
    assert done_before == {0, 1, 2, 3}

    # resume: must only process buckets 4-7, then produce an identical index
    m = build_index(spark, pages, part_dir, n_buckets=8, n_shards=4,
                    use_html=True, resume=True)
    resumed = load_index(spark, part_dir)
    fullidx = load_index(spark, full_dir)

    assert {r.part_id for r in resumed["ledger"].collect()} == set(range(8))
    fp_r = _postings_fingerprint(resumed["postings"])
    fp_f = _postings_fingerprint(fullidx["postings"])
    assert (fp_r.h, fp_r.n) == (fp_f.h, fp_f.n)
    assert m["n_docs"] == fullidx["manifest"]["n_docs"]
    # no bucket double-processed: per-bucket doc counts match doc_stats
    per_bucket = {r.part_id: r.n_docs for r in resumed["ledger"].collect()}
    truth = {r.bucket: r.cnt for r in
             resumed["doc_stats"].groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert per_bucket == truth
