"""Inverted-index build pipeline (SURVEY.md §2.9, §7 steps 2–3, 5).

Spark-first design, three jobs over the `web_pages` table:

1. **doc_stats / corpus_stats** — pure JVM: tokenize with a codegen'd
   `split`, `size(tokens)` → doc_len; deterministic dense-ish doc ids
   (see below); one shuffle (hash on url-bucket).
2. **SPIMI chunk stage** — `mapInPandas` per partition builds in-memory
   term→postings segments and flushes them as varint-encoded chunk rows
   (classic SPIMI, Manning IR ch.4). This is map-side combine: the term
   shuffle moves compressed chunks, not raw (term, doc, tf) rows.
3. **salted term-partitioned merge** — shuffle by (term, shard) where
   shard = bucket-range group: a deterministic, order-preserving salt.
   A head term's postings are split across shards by doc-id range, so
   no single `applyInPandas` group ever holds a head term's full list
   (the skew mitigation the north rule requires), and every shard holds
   a disjoint, sorted doc range — which is exactly the layout block-max
   WAND wants (query/wand.py groups by shard for doc-at-a-time scoring).

**Doc-id scheme.** doc_id = (bucket << 40) | rank_within_bucket, where
bucket = pmod(xxhash64(url), P) and rank is the row_number over urls in
the bucket. Fully deterministic (no range-sampling, no
monotonically_increasing_id), independent of physical partitioning —
this is what makes the build resumable and reproducible across cluster
sizes. Gaps within a bucket are 1 → delta streams compress to ~1
byte/posting.

Reference parity: the scan/slice surface maps to the reference's sliced
scroll (pkg/es/es5.go:106-163, slice spec es5.go:116-122); `bucket`
plays the role of the slice id; chunk flush size plays `scroll_size`;
the ledger is the Progress analog (utils/progress.go:40-141) made
durable for resume (north rule: per-partition lineage).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ela_lib_spark import BM25_B, BM25_K1
from ela_lib_spark.functions.text import extract_text, tokenize_col
from ela_lib_spark.index.codecs import (
    CODEC_VARINT,
    encode_block,
    varint_decode,
    varint_encode,
)
from ela_lib_spark.schemas import BLOCK_SIZE, POSTING_CHUNKS, POSTINGS

DOC_BITS = 40
METRICS_TERM = ""  # reserved: real tokens match [a-z0-9]+, never empty
FLUSH_POSTINGS = 2_000_000  # SPIMI in-memory segment bound per partition


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


def doc_id_expr():
    return (
        F.shiftleft(F.col("bucket").cast("long"), DOC_BITS) + F.col("rk") - 1
    ).alias("doc_id")


def pages_with_tokens(pages: DataFrame, use_html: bool = False) -> DataFrame:
    """Project (url, tokens) — tokenization stays JVM-side (codegen)."""
    text = extract_text(F.col("html")) if use_html else F.col("text")
    return pages.select("url", tokenize_col(text).alias("tokens"))


def with_doc_ids(tokens_df: DataFrame, n_buckets: int) -> DataFrame:
    w = Window.partitionBy("bucket").orderBy("url")
    return (
        tokens_df.withColumn("bucket", bucket_expr(n_buckets))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("doc_id", doc_id_expr())
        .drop("rk")
    )


def build_doc_stats(pages: DataFrame, n_buckets: int, use_html: bool = False) -> DataFrame:
    df = with_doc_ids(pages_with_tokens(pages, use_html), n_buckets)
    return df.select(
        "doc_id", "url", F.size("tokens").cast("long").alias("doc_len"), "bucket"
    )


# ------------------------------------------------------------- stage A


def _spimi_fn(missing_buckets=None):
    """mapInPandas closure: per-partition SPIMI segment builder."""

    def fn(it):
        t0 = time.monotonic()
        # acc[(bucket, term)] = [ids_parts, tfs_parts, dls_parts]
        acc: dict = {}
        pending = 0
        bucket_docs: dict = {}
        bucket_tokens: dict = {}

        def flush():
            nonlocal acc, pending
            rows = {k: [] for k in POSTING_CHUNKS.fieldNames()}
            for (bkt, term), (ids_l, tfs_l, dls_l) in acc.items():
                ids = np.concatenate(ids_l)
                tfs = np.concatenate(tfs_l)
                dls = np.concatenate(dls_l)
                rows["term"].append(term)
                rows["part_id"].append(bkt)
                rows["shard"].append(0)
                rows["doc_ids"].append(varint_encode(np.diff(ids, prepend=ids[0])))
                rows["tfs"].append(varint_encode(tfs))
                rows["dls"].append(varint_encode(dls))
                rows["n_docs"].append(len(ids))
                rows["first_doc_id"].append(int(ids[0]))
            acc = {}
            pending = 0
            return pd.DataFrame(rows)

        for pdf in it:
            if len(pdf) == 0:
                continue
            dl = pdf["tokens"].map(len)
            ex = pd.DataFrame(
                {
                    "bucket": pdf["bucket"].repeat(dl).values,
                    "doc_id": pdf["doc_id"].repeat(dl).values,
                    "term": np.concatenate([np.asarray(t, dtype=object) for t in pdf["tokens"]])
                    if dl.sum()
                    else np.array([], dtype=object),
                }
            )
            for b, n in pdf.groupby("bucket")["doc_id"].count().items():
                bucket_docs[b] = bucket_docs.get(b, 0) + int(n)
            for b, n in ex.groupby("bucket")["term"].count().items():
                bucket_tokens[b] = bucket_tokens.get(b, 0) + int(n)
            tf = (
                ex.groupby(["bucket", "term", "doc_id"], sort=True)
                .size()
                .reset_index(name="tf")
            )
            dl_map = pd.Series(dl.values, index=pdf["doc_id"].values)
            tf["dl"] = tf["doc_id"].map(dl_map)
            for (b, term), g in tf.groupby(["bucket", "term"], sort=False):
                slot = acc.setdefault((b, term), ([], [], []))
                slot[0].append(g["doc_id"].to_numpy(np.int64))
                slot[1].append(g["tf"].to_numpy(np.int64))
                slot[2].append(g["dl"].to_numpy(np.int64))
            pending += len(tf)
            if pending >= FLUSH_POSTINGS:
                yield flush()
        if acc:
            yield flush()
        # one metrics row per bucket seen by this partition (ledger feed)
        if bucket_docs:
            elapsed_ms = int((time.monotonic() - t0) * 1000)
            yield pd.DataFrame(
                {
                    "term": METRICS_TERM,
                    "part_id": list(bucket_docs.keys()),
                    "shard": elapsed_ms,
                    "doc_ids": b"",
                    "tfs": b"",
                    "dls": b"",
                    "n_docs": [bucket_docs[b] for b in bucket_docs],
                    "first_doc_id": [bucket_tokens.get(b, 0) for b in bucket_docs],
                }
            )

    return fn


def build_chunks(
    pages: DataFrame, n_buckets: int, use_html: bool = False, skip_buckets=None
) -> DataFrame:
    """Stage A: SPIMI posting chunks, one+ per (bucket, term)."""
    ids = with_doc_ids(pages_with_tokens(pages, use_html), n_buckets)
    if skip_buckets:
        ids = ids.filter(~F.col("bucket").isin(list(skip_buckets)))
    return ids.select("bucket", "doc_id", "tokens").mapInPandas(
        _spimi_fn(), schema=POSTING_CHUNKS
    )


# ------------------------------------------------------------- stage B


def _merge_group(out: dict, term, shard: int, df_val: int, g: pd.DataFrame,
                 avg_dl: float, codec: str, block_size: int) -> None:
    """Merge one (term, shard) group's chunks into encoded blocks."""
    k1, b = BM25_K1, BM25_B
    ids_l, tfs_l, dls_l = [], [], []
    for r in g.itertuples(index=False):
        deltas = varint_decode(r.doc_ids, r.n_docs).astype(np.int64)
        ids = np.cumsum(deltas) + (r.first_doc_id - int(deltas[0]))
        ids_l.append(ids)
        tfs_l.append(varint_decode(r.tfs, r.n_docs).astype(np.int64))
        dls_l.append(varint_decode(r.dls, r.n_docs).astype(np.int64))
    ids = np.concatenate(ids_l) if len(ids_l) > 1 else ids_l[0]
    tfs = np.concatenate(tfs_l) if len(tfs_l) > 1 else tfs_l[0]
    dls = np.concatenate(dls_l) if len(dls_l) > 1 else dls_l[0]
    impact = tfs / (tfs + k1 * (1 - b + b * dls / avg_dl))
    for blk, s in enumerate(range(0, len(ids), block_size)):
        e = min(s + block_size, len(ids))
        d_enc, t_enc, l_enc, first, last = encode_block(
            ids[s:e], tfs[s:e], dls[s:e], codec
        )
        out["term"].append(term)
        out["shard"].append(shard)
        out["block_id"].append(blk)
        out["first_doc_id"].append(first)
        out["last_doc_id"].append(last)
        out["doc_ids_delta"].append(d_enc)
        out["tfs"].append(t_enc)
        out["dls"].append(l_enc)
        out["n_docs"].append(e - s)
        out["block_max_impact"].append(float(impact[s:e].max()))
        out["df"].append(df_val)


def _merge_stream_fn(avg_dl: float, codec: str, block_size: int = BLOCK_SIZE):
    """mapInPandas merge: the input partition is sorted by
    (term, shard, first_doc_id); groups are detected by key change and
    the trailing (possibly batch-spanning) group is buffered. This
    avoids applyInPandas's per-group JVM round trip — critical because
    the zipf long tail makes most groups tiny."""

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in POSTINGS.fieldNames()}
        for (term, shard), g in pdf.groupby(["term", "shard"], sort=False):
            _merge_group(out, term, int(shard), int(g["df"].iloc[0]), g,
                         avg_dl, codec, block_size)
        return pd.DataFrame(out)

    def fn(it):
        buf = None
        for pdf in it:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_t = pdf["term"].iloc[-1]
            last_s = pdf["shard"].iloc[-1]
            mask_last = (pdf["term"] == last_t) & (pdf["shard"] == last_s)
            buf = pdf[mask_last]
            body = pdf[~mask_last]
            if len(body):
                yield process(body)
        if buf is not None and len(buf):
            yield process(buf)

    return fn


def merge_chunks(
    chunks: DataFrame,
    avg_dl: float,
    n_shards: int,
    n_buckets: int,
    codec: str = CODEC_VARINT,
    merge_partitions: int | None = None,
) -> DataFrame:
    """Stage B: salted merge. shard = bucket-range group (order-preserving
    salt); df per term aggregated from chunk metadata (cheap — no
    decode), then carried into each salted group. The shuffle is an
    explicit repartition on (term, shard) + in-partition sort; the merge
    itself streams through mapInPandas (see _merge_stream_fn)."""
    group = max(1, (n_buckets + n_shards - 1) // n_shards)
    pre = chunks.filter(F.col("term") != METRICS_TERM).withColumn(
        "shard", (F.col("part_id") / group).cast("int")
    )
    df_tbl = pre.groupBy("term").agg(F.sum("n_docs").alias("df"))
    joined = pre.join(df_tbl, "term")
    if merge_partitions is None:
        merge_partitions = max(n_shards, 8)
    part = joined.repartition(merge_partitions, "term", "shard").sortWithinPartitions(
        "term", "shard", "first_doc_id"
    )
    return part.mapInPandas(_merge_stream_fn(avg_dl, codec), schema=POSTINGS)


# ------------------------------------------------------------ pipeline


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    n_buckets: int = 32,
    n_shards: int = 8,
    codec: str = CODEC_VARINT,
    use_html: bool = False,
    resume: bool = False,
) -> dict:
    """Full build: doc_stats → corpus_stats → chunks (resumable) →
    merged postings. Returns the manifest dict.

    Resumability (north rule): the chunk stage appends per-bucket; the
    ledger is *derived from committed chunk data* (metrics rows), so a
    crash between data and ledger writes cannot desynchronize them —
    rerunning with resume=True recomputes done-buckets from the data.
    """
    t_start = time.monotonic()
    done: set[int] = set()
    if resume and os.path.exists(os.path.join(out_dir, "ledger")):
        done = {
            r.part_id
            for r in spark.read.parquet(os.path.join(out_dir, "ledger"))
            .filter(F.col("status") == "done")
            .select("part_id")
            .collect()
        }

    # job 1: doc stats (skip if resuming and complete — ids are
    # bucket-deterministic; _SUCCESS guards against a crashed write)
    ds_path = os.path.join(out_dir, "doc_stats")
    if not (resume and os.path.exists(os.path.join(ds_path, "_SUCCESS"))):
        build_doc_stats(pages, n_buckets, use_html).write.mode("overwrite").parquet(ds_path)
    doc_stats = spark.read.parquet(ds_path)
    n_docs, avg_dl = doc_stats.agg(
        F.count("*").cast("long"), F.avg("doc_len")
    ).first()
    cs_path = os.path.join(out_dir, "corpus_stats")
    spark.createDataFrame(
        [(int(n_docs), float(avg_dl))], "n_docs long, avg_dl double"
    ).write.mode("overwrite").parquet(cs_path)

    # job 2: SPIMI chunks (append missing buckets only)
    ch_path = os.path.join(out_dir, "chunks")
    chunks_out = build_chunks(pages, n_buckets, use_html, skip_buckets=done or None)
    mode = "append" if (resume and os.path.exists(ch_path)) else "overwrite"
    chunks_out.write.mode(mode).parquet(ch_path)
    chunks = spark.read.parquet(ch_path)

    # ledger derived from committed metrics rows
    ledger = (
        chunks.filter(F.col("term") == METRICS_TERM)
        .groupBy("part_id")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("first_doc_id").cast("long").alias("n_tokens"),
            (F.max("shard") / 1000.0).alias("secs"),
        )
        .withColumn("status", F.lit("done"))
        .withColumn("snapshot_id", F.lit(f"build-{int(t_start)}"))
        .select("part_id", "status", "n_docs", "n_tokens", "secs", "snapshot_id")
    )
    ledger.write.mode("overwrite").parquet(os.path.join(out_dir, "ledger"))

    # job 3: salted merge → final postings, sorted for parquet min/max
    # pushdown on `term` (the query path filters term.isin(...))
    merged = merge_chunks(chunks, float(avg_dl), n_shards, n_buckets, codec)
    (
        merged.repartition(n_shards, "term")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings"))
    )

    manifest = {
        "codec": codec,
        "n_buckets": n_buckets,
        "n_shards": n_shards,
        "n_docs": int(n_docs),
        "avg_dl": float(avg_dl),
        "block_size": BLOCK_SIZE,
        "bm25": {"k1": BM25_K1, "b": BM25_B},
        "build_secs": time.monotonic() - t_start,
        "extractor_version": 1,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_index(spark: SparkSession, out_dir: str) -> dict:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return {
        "manifest": manifest,
        "postings": spark.read.parquet(os.path.join(out_dir, "postings")),
        "doc_stats": spark.read.parquet(os.path.join(out_dir, "doc_stats")),
        "corpus_stats": spark.read.parquet(os.path.join(out_dir, "corpus_stats")),
        "ledger": spark.read.parquet(os.path.join(out_dir, "ledger")),
    }
