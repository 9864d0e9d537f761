"""Incremental index maintenance via Structured Streaming foreachBatch."""

import os

from pyspark.sql import functions as F

from ela_lib_spark.index.build import METRICS_TERM_ID
from ela_lib_spark.sources.synth import synth_pages_df
from ela_lib_spark.streaming.incremental import (
    incremental_index_maintenance,
    read_delta_postings,
)


def test_incremental_maintenance(spark, tmp_root):
    incoming = os.path.join(tmp_root, "incoming")
    idx_dir = os.path.join(tmp_root, "stream_idx")
    ckpt = os.path.join(tmp_root, "ckpt")
    os.makedirs(incoming, exist_ok=True)

    pages = synth_pages_df(spark, 400).cache()
    pages.limit(200).write.mode("overwrite").parquet(os.path.join(incoming, "b1"))

    q = incremental_index_maintenance(spark, incoming + "/*", idx_dir, ckpt, n_buckets=4)
    q.processAllAvailable()

    # second file arrives → second micro-batch
    pages.orderBy(F.desc("url")).limit(150).write.mode("overwrite").parquet(
        os.path.join(incoming, "b2")
    )
    q.processAllAvailable()
    q.stop()

    delta = read_delta_postings(spark, idx_dir)
    assert delta is not None
    real = delta.filter(F.col("term_id") != METRICS_TERM_ID)
    assert real.count() > 0
    # per-epoch metrics rows carry doc counts → all arrivals indexed
    n_docs = (
        delta.filter(F.col("term_id") == METRICS_TERM_ID)
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    assert n_docs == 350
    # delta buckets never collide with bulk bucket ids
    assert delta.agg(F.min("part_id")).first()[0] >= (1 << 20)
