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
    varint_encode_segmented,
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


def ids_with_tokens(pages: DataFrame, n_buckets: int, use_html: bool = False) -> DataFrame:
    """Scale-tuned id assignment: the shuffle moves (url, text) — NOT
    token arrays — and tokenization runs in the post-shuffle stage, so
    its parallelism follows shuffle partitions (≈ cluster cores), not
    the input file count. html→text extraction stays map-side (it
    shrinks the payload). Same deterministic ids as with_doc_ids."""
    text = extract_text(F.col("html")) if use_html else F.col("text")
    base = pages.select("url", text.alias("text"))
    w = Window.partitionBy("bucket").orderBy("url")
    ids = (
        base.withColumn("bucket", bucket_expr(n_buckets))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("doc_id", doc_id_expr())
    )
    return ids.select(
        "url", "bucket", "doc_id", tokenize_col(F.col("text")).alias("tokens")
    )


def doc_stats_from_ids(ids_df: DataFrame) -> DataFrame:
    return ids_df.select(
        "doc_id", "url", F.size("tokens").cast("long").alias("doc_len"), "bucket"
    )


def build_doc_stats(pages: DataFrame, n_buckets: int, use_html: bool = False) -> DataFrame:
    return doc_stats_from_ids(with_doc_ids(pages_with_tokens(pages, use_html), n_buckets))


# ------------------------------------------------------------- stage A


def _spimi_fn(missing_buckets=None):
    """mapInPandas closure: per-partition SPIMI segment builder."""

    def fn(it):
        t0 = time.monotonic()
        frames: list[pd.DataFrame] = []  # per-batch (bucket,term,doc_id,tf,dl)
        pending = 0
        bucket_docs: dict = {}
        bucket_tokens: dict = {}

        def flush():
            nonlocal frames, pending
            allf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
            frames = []
            pending = 0
            # stable multi-key sort: within (bucket, term) the original
            # order — ascending doc_id across batches — is preserved
            allf = allf.sort_values(["bucket", "term"], kind="stable",
                                    ignore_index=True)
            b_arr = allf["bucket"].to_numpy(np.int64)
            t_arr = allf["term"].to_numpy()
            ids = allf["doc_id"].to_numpy(np.int64)
            tfs = allf["tf"].to_numpy(np.int64)
            dls = allf["dl"].to_numpy(np.int64)
            n = len(allf)
            new_chunk = np.ones(n, bool)
            if n > 1:
                new_chunk[1:] = (b_arr[1:] != b_arr[:-1]) | (t_arr[1:] != t_arr[:-1])
            starts = np.flatnonzero(new_chunk)
            counts = np.diff(np.append(starts, n))
            d = np.empty(n, np.int64)
            d[0] = 0
            np.subtract(ids[1:], ids[:-1], out=d[1:])
            d[starts] = 0  # chunk delta streams start at 0 (decoder contract)
            return pd.DataFrame(
                {
                    "term": t_arr[starts],
                    "part_id": b_arr[starts].astype(np.int32),
                    "shard": np.zeros(len(starts), np.int32),
                    "doc_ids": varint_encode_segmented(d, counts),
                    "tfs": varint_encode_segmented(tfs, counts),
                    "dls": varint_encode_segmented(dls, counts),
                    "n_docs": counts,
                    "first_doc_id": ids[starts],
                }
            )

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
            for b, cnt in pdf.groupby("bucket")["doc_id"].count().items():
                bucket_docs[b] = bucket_docs.get(b, 0) + int(cnt)
            for b, cnt in ex.groupby("bucket")["term"].count().items():
                bucket_tokens[b] = bucket_tokens.get(b, 0) + int(cnt)
            tf = (
                ex.groupby(["bucket", "term", "doc_id"], sort=True)
                .size()
                .reset_index(name="tf")
            )
            dl_map = pd.Series(dl.values, index=pdf["doc_id"].values)
            tf["dl"] = tf["doc_id"].map(dl_map)
            frames.append(tf)
            pending += len(tf)
            if pending >= FLUSH_POSTINGS:
                yield flush()
        if frames:
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


def chunks_from_ids(ids_df: DataFrame, skip_buckets=None) -> DataFrame:
    """Stage A: SPIMI posting chunks, one+ per (bucket, term)."""
    if skip_buckets:
        ids_df = ids_df.filter(~F.col("bucket").isin(list(skip_buckets)))
    return ids_df.select("bucket", "doc_id", "tokens").mapInPandas(
        _spimi_fn(), schema=POSTING_CHUNKS
    )


def build_chunks(
    pages: DataFrame, n_buckets: int, use_html: bool = False, skip_buckets=None
) -> DataFrame:
    return chunks_from_ids(
        with_doc_ids(pages_with_tokens(pages, use_html), n_buckets), skip_buckets
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


def _merge_batch_vectorized(pdf: pd.DataFrame, avg_dl: float,
                            block_size: int) -> pd.DataFrame:
    """Whole-batch merge with ~20 numpy calls total, independent of the
    number of (term, shard) groups — the zipf tail makes most groups
    tiny, so per-group work must be O(0). varint codec only."""
    k1, b = BM25_K1, BM25_B
    n = pdf["n_docs"].to_numpy(np.int64)
    total = int(n.sum())
    nrows = len(pdf)
    term_arr = pdf["term"].to_numpy()
    shard_arr = pdf["shard"].to_numpy()
    first_arr = pdf["first_doc_id"].to_numpy(np.int64)

    # decode the concatenated streams in one call each
    deltas = varint_decode(b"".join(pdf["doc_ids"]), total).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs"]), total).astype(np.int64)
    dls = varint_decode(b"".join(pdf["dls"]), total).astype(np.int64)

    chunk_starts = np.zeros(nrows, np.int64)
    np.cumsum(n[:-1], out=chunk_starts[1:])
    # ids: within-chunk cumsum (chunk delta streams start with 0)
    cs = np.cumsum(deltas)
    ids = cs - np.repeat(cs[chunk_starts] - deltas[chunk_starts], n) + np.repeat(
        first_arr, n
    )

    impact = tfs / (tfs + k1 * (1 - b + b * dls / avg_dl))

    # group boundaries: consecutive chunks with equal (term, shard)
    new_group = np.ones(nrows, bool)
    if nrows > 1:
        new_group[1:] = (term_arr[1:] != term_arr[:-1]) | (
            shard_arr[1:] != shard_arr[:-1]
        )
    g_chunk = np.flatnonzero(new_group)
    g_start = chunk_starts[g_chunk]
    g_end = np.append(g_start[1:], total)
    g_len = g_end - g_start

    # block tiling of each group
    nblk = (g_len + block_size - 1) // block_size
    total_blk = int(nblk.sum())
    blk_group = np.repeat(np.arange(len(g_start)), nblk)
    blk_cum = np.zeros(len(g_start), np.int64)
    np.cumsum(nblk[:-1], out=blk_cum[1:])
    blk_idx = np.arange(total_blk) - np.repeat(blk_cum, nblk)
    b_start = g_start[blk_group] + blk_idx * block_size
    b_end = np.minimum(b_start + block_size, g_end[blk_group])
    b_n = b_end - b_start

    # per-block metadata (blocks tile [0, total) in order → reduceat)
    bmax = np.maximum.reduceat(impact, b_start) if total_blk else np.zeros(0)
    first_ids = ids[b_start]
    last_ids = ids[b_end - 1]

    # per-block encoded streams: ONE encode per stream, sliced per block
    d_all = np.empty(total, np.int64)
    d_all[0] = 0
    np.subtract(ids[1:], ids[:-1], out=d_all[1:])
    keep = np.ones(total, bool)
    keep[b_start] = False  # first id of each block lives in metadata
    tf_enc = varint_encode_segmented(tfs, b_n)
    dl_enc = varint_encode_segmented(dls, b_n)
    d_enc = varint_encode_segmented(d_all[keep], b_n - 1)

    return pd.DataFrame(
        {
            "term": term_arr[g_chunk][blk_group],
            "shard": shard_arr[g_chunk][blk_group].astype(np.int32),
            "block_id": blk_idx.astype(np.int32),
            "first_doc_id": first_ids,
            "last_doc_id": last_ids,
            "doc_ids_delta": d_enc,
            "tfs": tf_enc,
            "dls": dl_enc,
            "n_docs": b_n.astype(np.int32),
            "block_max_impact": bmax,
            "df": pdf["df"].to_numpy(np.int64)[g_chunk][blk_group],
        }
    )


def _merge_stream_fn(avg_dl: float, codec: str, block_size: int = BLOCK_SIZE):
    """mapInPandas merge: the input partition is sorted by
    (term, shard, first_doc_id); groups are detected by key change and
    the trailing (possibly batch-spanning) group is buffered. This
    avoids applyInPandas's per-group JVM round trip — critical because
    the zipf long tail makes most groups tiny."""

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        if codec == CODEC_VARINT:
            return _merge_batch_vectorized(pdf, avg_dl, block_size)
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
    # df_tbl is one row per term — tiny next to the chunk data; AQE
    # turns this into a broadcast join when it fits, leaving the
    # repartition below as the ONLY shuffle of chunk bytes.
    joined = pre.join(df_tbl, "term")
    if merge_partitions is not None:
        part = joined.repartition(merge_partitions, "term", "shard")
    else:
        # session shuffle parallelism (≈ cores) — scales with the cluster
        part = joined.repartition("term", "shard")
    part = part.sortWithinPartitions("term", "shard", "first_doc_id")
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
    reuse_intermediate: bool = True,
) -> dict:
    """Full build: doc_stats → corpus_stats → chunks (resumable) →
    merged postings. Returns the manifest dict.

    Resumability (north rule): the chunk stage appends per-bucket; the
    ledger is *derived from committed chunk data* (metrics rows), so a
    crash between data and ledger writes cannot desynchronize them —
    rerunning with resume=True recomputes done-buckets from the data.
    """
    t_start = time.monotonic()
    stage_secs: dict[str, float] = {}
    done: set[int] = set()
    if resume and os.path.exists(os.path.join(out_dir, "ledger")):
        done = {
            r.part_id
            for r in spark.read.parquet(os.path.join(out_dir, "ledger"))
            .filter(F.col("status") == "done")
            .select("part_id")
            .collect()
        }

    # the id-assigned tokens frame feeds BOTH doc_stats and the SPIMI
    # chunk stage; persisting it reuses the tokenize+shuffle+sort work
    # across the two jobs (one corpus pass instead of two). At extreme
    # scale set reuse_intermediate=False to trade the second pass for
    # zero persist footprint.
    ids_df = ids_with_tokens(pages, n_buckets, use_html)
    if reuse_intermediate:
        from pyspark import StorageLevel

        ids_df = ids_df.persist(StorageLevel.MEMORY_AND_DISK)

    # job 1: doc stats (skip if resuming and complete — ids are
    # bucket-deterministic; _SUCCESS guards against a crashed write)
    ds_path = os.path.join(out_dir, "doc_stats")
    _t = time.monotonic()
    if not (resume and os.path.exists(os.path.join(ds_path, "_SUCCESS"))):
        doc_stats_from_ids(ids_df).write.mode("overwrite").parquet(ds_path)
    stage_secs["doc_stats"] = round(time.monotonic() - _t, 2)
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
    _t = time.monotonic()
    chunks_out = chunks_from_ids(ids_df, skip_buckets=done or None)
    mode = "append" if (resume and os.path.exists(ch_path)) else "overwrite"
    chunks_out.write.mode(mode).parquet(ch_path)
    stage_secs["chunks"] = round(time.monotonic() - _t, 2)
    if reuse_intermediate:
        ids_df.unpersist()
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
    _t = time.monotonic()
    merged = merge_chunks(chunks, float(avg_dl), n_shards, n_buckets, codec)
    (
        merged.repartition("term")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings"))
    )
    stage_secs["merge"] = round(time.monotonic() - _t, 2)

    manifest = {
        "codec": codec,
        "n_buckets": n_buckets,
        "n_shards": n_shards,
        "n_docs": int(n_docs),
        "avg_dl": float(avg_dl),
        "block_size": BLOCK_SIZE,
        "bm25": {"k1": BM25_K1, "b": BM25_B},
        "build_secs": time.monotonic() - t_start,
        "stage_secs": stage_secs,
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
