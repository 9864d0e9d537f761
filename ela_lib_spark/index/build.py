"""Inverted-index build pipeline (SURVEY.md §2.9, §7 steps 2–3, 5).

Spark-first design, three jobs over the `web_pages` table:

1. **docs job** — extract text (Arrow pandas UDF, map-side), tokenize
   with a codegen'd `split`, hash every token to an int64 term id with
   JVM `xxhash64` (whole-stage codegen — zero Python in the token hot
   path), assign deterministic doc ids, and materialize ONE slim
   intermediate parquet: (url, bucket, doc_id, doc_len, term_ids).
   This table doubles as the doc dictionary (doc_stats is a pruned
   column read of it — parquet never touches `term_ids` for stats).
2. **SPIMI chunk stage** — `mapInPandas` over the docs parquet builds
   per-split term→postings segments and flushes them as varint-encoded
   chunk rows (classic SPIMI, Manning IR ch.4). All-int64 numpy kernel:
   one `lexsort` + run-length encode per flush; no pandas object
   strings anywhere (term ids replace term strings). This is map-side
   combine: the term shuffle moves compressed chunks, not raw
   (term, doc, tf) rows.
3. **salted term-partitioned merge** — shuffle by (term_id, shard)
   where shard = bucket-range group: a deterministic, order-preserving
   salt. A head term's postings are split across shards by doc-id
   range, so no single merge group ever holds a head term's full list
   (the skew mitigation the north rule requires), and every shard holds
   a disjoint, sorted doc range — which is exactly the layout block-max
   WAND wants (query/wand.py groups by shard for doc-at-a-time
   scoring). The merge output is written directly (no extra
   repartition): each output file is already sorted by term_id, so
   parquet row-group min/max stats prune query-term scans.

**Term-id scheme.** term_id = xxhash64(term) (seed 42), computed
JVM-side at build time and via the bit-identical pure-Python XXH64
(functions/xxh.py) for query terms at the driver. 64-bit ids make the
SPIMI/merge kernels pure int64 numpy — the string-object version was
3–5× slower and memory-bandwidth-bound. Collision math: P(any
collision among V terms) ≈ V²/2⁶⁵; V=10⁸ → ~3·10⁻⁴ (one merged pair
in ~3000 corpora), detectable by building the optional vocab table
(`vocab_from_pages`) and checking count(distinct term) per term_id.

**Doc-id scheme.** doc_id = (bucket << 40) | rank_within_bucket, where
bucket = pmod(xxhash64(url), n_buckets) and rank is the row_number over
urls in the bucket. Fully deterministic (no range-sampling, no
monotonically_increasing_id), independent of physical partitioning and
parallelism — this is what makes the build resumable and reproducible
across cluster sizes. Gaps within a bucket are 1 → delta streams
compress to ~1 byte/posting. Use n_buckets ≫ cores (bench: 16×cores):
the rank sort parallelism follows n_buckets, and buckets are the
resume/lineage granularity.

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
    varint_encode_segmented,
)
from ela_lib_spark.schemas import BLOCK_SIZE, POSTING_CHUNKS, POSTINGS

DOC_BITS = 40
# Sentinel term_id for per-bucket metrics rows (ledger feed). A real
# token hashing exactly here has probability V/2^64 ≈ 0.
METRICS_TERM_ID = -(1 << 63)
# Metrics sidecar rows ride the POSTING_CHUNKS schema — they are
# emitted inside the same mapInPandas stream as the posting chunks and
# split out via the is_m partition, so they must share its physical
# columns. The carrier-column mapping is defined HERE and only here
# (VERDICT r4 #4: both ends previously hard-coded `first_doc_id means
# n_tokens` / `shard/1000 means seconds` independently):
#   part_id      → bucket id                      (its normal meaning)
#   n_docs       → docs seen in the bucket        (its normal meaning)
#   first_doc_id → tokens seen in the bucket
#   shard        → elapsed millis of the producing read-split
# Writers go through metrics_rows_pdf; readers through
# ledger_rows_from_metrics. Nothing else may touch the mapping.
_METRICS_N_TOKENS_COL = "first_doc_id"
_METRICS_ELAPSED_MS_COL = "shard"


def metrics_rows_pdf(bucket_docs: dict, bucket_tokens: dict,
                     elapsed_ms: int) -> "pd.DataFrame":
    """One POSTING_CHUNKS-shaped metrics row per bucket (writer side
    of the carrier mapping above)."""
    return pd.DataFrame(
        {
            "term_id": METRICS_TERM_ID,
            "part_id": np.fromiter(
                bucket_docs.keys(), np.int64, len(bucket_docs)
            ).astype(np.int32),
            _METRICS_ELAPSED_MS_COL: elapsed_ms,
            "doc_ids": b"",
            "tfs": b"",
            "dls": b"",
            "n_docs": [bucket_docs[x] for x in bucket_docs],
            _METRICS_N_TOKENS_COL: [bucket_tokens.get(x, 0)
                                    for x in bucket_docs],
        }
    )


def ledger_rows_from_metrics(metrics_df: DataFrame) -> list:
    """Per-bucket ledger rows (part_id, n_docs, n_tokens, secs) from
    committed metrics rows (reader side of the carrier mapping)."""
    return (
        metrics_df.groupBy("part_id")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum(_METRICS_N_TOKENS_COL).cast("long").alias("n_tokens"),
            (F.max(_METRICS_ELAPSED_MS_COL) / 1000.0).alias("secs"),
        )
        .collect()
    )
FLUSH_POSTINGS = 2_000_000  # SPIMI in-memory segment bound per partition

# Absolute tombstone bounds (VERDICT r3 #1 — the driver must never
# become the scaling limit of the delete path):
# - above DRIVER cap, tombstones are NEVER materialized driver-side;
#   query/GC switch to a distributed co-grouped filter (the set stays
#   a DataFrame end to end). 10^7 × 8 B = 80 MB per closure ship —
#   the comfortable ceiling for task-broadcast state.
# - above GC cap, compact_index(mode="auto") forces a chunk-store GC
#   even if the tombstone FRACTION is still small (10^8 ≈ 800 MB of
#   delete-log state is where rewrite-and-truncate beats carrying it).
TOMBSTONE_DRIVER_CAP = 10_000_000
TOMBSTONE_GC_CAP = 100_000_000


def bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


def shard_group(n_buckets: int, n_shards: int) -> int:
    """Buckets per merge shard — THE shared formula behind the salted
    merge (merge_chunks), the SPIMI chunk granularity (build_index)
    and the doc_id→shard derivation the distributed tombstone filter
    uses (query/wand.tombstones_with_shard, gc cogroup). One
    definition so the mapping can't drift."""
    return max(1, (n_buckets + n_shards - 1) // n_shards)


def tombstone_part_expr(manifest: dict):
    """Column expr mapping a tombstoned `doc_id` to the part_id of the
    chunk row holding its postings — the shared half of the
    doc_id→shard derivation (query/wand.tombstones_with_shard and the
    GC cogroup both use it; one definition, review r4). Bulk chunk
    rows carry their bucket-GROUP's base bucket; delta epochs chunk at
    group=1 so part = the (offset) bucket itself.

    Legacy manifests without `chunk_bucket_group` fall back to
    shard_group(n_buckets, n_shards) — exact as long as the index was
    never re-sharded, and compact/gc stamp the true value into the
    manifest before any re-shard can change n_shards."""
    from ela_lib_spark.streaming.incremental import DELTA_BUCKET_BASE

    cg = int(manifest.get("chunk_bucket_group") or shard_group(
        int(manifest["n_buckets"]), int(manifest["n_shards"])))
    bucket = F.shiftright("doc_id", DOC_BITS)
    return F.when(
        bucket < DELTA_BUCKET_BASE, F.floor(bucket / cg) * cg
    ).otherwise(bucket)


def stamp_chunk_bucket_group(manifest: dict) -> None:
    """Record the build-time chunk part granularity on a legacy
    manifest BEFORE anything can change n_shards (re-shard major):
    pre-r4 manifests' chunks were produced with
    shard_group(n_buckets, n_shards-at-build), and n_shards still
    holds the build value until the first re-shard."""
    manifest.setdefault(
        "chunk_bucket_group",
        shard_group(int(manifest["n_buckets"]), int(manifest["n_shards"])),
    )


def doc_id_expr():
    return (
        F.shiftleft(F.col("bucket").cast("long"), DOC_BITS) + F.col("rk") - 1
    ).alias("doc_id")


def term_id_expr(tokens_col):
    """array<string> → array<long> of xxhash64 term ids (JVM, codegen)."""
    return F.transform(tokens_col, lambda t: F.xxhash64(t))


# ----------------------------------------------------- string-token path
# (oracle/truth surface for tests; the build itself is all term-ids)


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
    """(url, bucket, doc_id, tokens) with string tokens — the ground-
    truth surface (same ids as the build; tokens for brute-force
    oracles)."""
    return with_doc_ids(pages_with_tokens(pages, use_html), n_buckets).select(
        "url", "bucket", "doc_id", "tokens"
    )


# --------------------------------------------------------- docs job (1)


def docs_with_term_ids(
    pages: DataFrame,
    n_buckets: int,
    use_html: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """(url, bucket, doc_id, doc_len, term_ids) — the one materialized
    intermediate. Extraction, tokenization and term-id hashing all run
    map-side (pre-shuffle), so their parallelism follows input splits;
    the single shuffle is the bucket hash for rank assignment, and its
    sort parallelism follows n_buckets (keep n_buckets ≫ cores).

    `num_partitions` fixes the shuffle/write partition count explicitly
    (an explicit repartition is exempt from AQE coalescing). This
    matters downstream: the docs parquet compresses hard (dictionary-
    encoded zipf term ids), and small files = single row groups = the
    SPIMI stage's read-split ceiling. Write MANY small files (≈3× total
    cores), never few big ones.

    Null-safe: a null text/html row becomes an empty term_ids array
    (doc_len 0) — it gets a doc id and counts toward n_docs."""
    text = extract_text(F.col("html")) if use_html else F.col("text")
    tids = term_id_expr(tokenize_col(text))
    base = pages.select(
        "url",
        F.coalesce(tids, F.array().cast("array<long>")).alias("term_ids"),
    ).withColumn("bucket", bucket_expr(n_buckets))
    if num_partitions is not None:
        # hash on bucket: a bucket stays whole within one output file,
        # and the window below reuses this clustering (no 2nd exchange)
        base = base.repartition(num_partitions, "bucket")
    w = Window.partitionBy("bucket").orderBy("url")
    return (
        base.withColumn("rk", F.row_number().over(w))
        .withColumn("doc_id", doc_id_expr())
        .select(
            "url",
            "bucket",
            "doc_id",
            F.size("term_ids").cast("long").alias("doc_len"),
            "term_ids",
        )
    )


def doc_stats_from_docs(docs_df: DataFrame) -> DataFrame:
    """Pruned projection — parquet reads skip the term_ids column."""
    return docs_df.select("doc_id", "url", "doc_len", "bucket")


def vocab_from_pages(pages: DataFrame, use_html: bool = False) -> DataFrame:
    """Optional (term, term_id, df) dictionary — for term listings and
    hash-collision audits (count(distinct term) per term_id). One
    explode+groupBy pass over the raw pages; not on the build critical
    path."""
    text = extract_text(F.col("html")) if use_html else F.col("text")
    ex = pages.select(
        F.explode(F.array_distinct(tokenize_col(text))).alias("term")
    )
    return ex.groupBy("term").agg(F.count("*").alias("df")).withColumn(
        "term_id", F.xxhash64("term")
    )


# ------------------------------------------------------------- stage A


def _spimi_fn(bucket_group: int = 1):
    """mapInPandas closure: per-split SPIMI segment builder.

    All-int64 numpy: batches accumulate (bucket, term_id, doc_id,
    doc_len) posting streams; flush() does ONE lexsort + run-length
    pass over up to FLUSH_POSTINGS entries and varint-encodes each
    chunk with a single segmented encode call.

    Chunk granularity = `bucket_group` consecutive buckets (r3): the
    merge groups by shard = bucket//group anyway, and doc ids embed
    the bucket in their high bits, so sorting by (bucket//group,
    term, doc) yields doc-ascending runs per (group, term) directly.
    Chunking per BUCKET (r2, group=1) made the zipf tail pay one
    chunk-row overhead per (bucket, term) — measured 162 MB of merge
    shuffle for ~20 MB of postings at 512 buckets. part_id of a chunk
    is the group's first bucket, so merge_chunks' shard derivation
    (part_id // group) is unchanged; METRICS rows stay per-bucket
    (resume/ledger granularity is unaffected)."""

    def fn(it):
        t0 = time.monotonic()
        bufs: list[tuple] = []  # (bucket_rep, term_ids, doc_rep, dl_rep)
        pending = 0
        bucket_docs: dict[int, int] = {}
        bucket_tokens: dict[int, int] = {}

        def flush():
            nonlocal bufs, pending
            if not bufs:
                return None
            cat = (lambda i: np.concatenate([x[i] for x in bufs])
                   if len(bufs) > 1 else bufs[0][i])
            b, t, d, l = cat(0), cat(1), cat(2), cat(3)
            bufs = []
            pending = 0
            n = len(t)
            if n == 0:
                return None
            g = b // bucket_group if bucket_group > 1 else b
            # sort by (group, term, doc): doc embeds bucket in its high
            # bits, so doc order within a (group, term) run is
            # bucket-major ascending — the decoder's delta contract
            order = np.lexsort((d, t, g))
            g, t, d, l = g[order], t[order], d[order], l[order]
            # posting runs: same (group, term, doc) → tf (a doc lives
            # in exactly one bucket, so doc collisions across buckets
            # cannot occur)
            new_post = np.ones(n, bool)
            new_post[1:] = (g[1:] != g[:-1]) | (t[1:] != t[:-1]) | (d[1:] != d[:-1])
            ps = np.flatnonzero(new_post)
            tf = np.diff(np.append(ps, n))
            pg, pt, pdoc, pl = g[ps], t[ps], d[ps], l[ps]
            # chunk runs: same (group, term)
            new_chunk = np.ones(len(ps), bool)
            if len(ps) > 1:
                new_chunk[1:] = (pg[1:] != pg[:-1]) | (pt[1:] != pt[:-1])
            cs = np.flatnonzero(new_chunk)
            counts = np.diff(np.append(cs, len(ps)))
            deltas = np.empty(len(ps), np.int64)
            deltas[0] = 0
            np.subtract(pdoc[1:], pdoc[:-1], out=deltas[1:])
            deltas[cs] = 0  # chunk delta streams start at 0 (decoder contract)
            return pd.DataFrame(
                {
                    "term_id": pt[cs],
                    "part_id": (pg[cs] * bucket_group).astype(np.int32),
                    "shard": np.zeros(len(cs), np.int32),
                    "doc_ids": varint_encode_segmented(deltas, counts),
                    "tfs": varint_encode_segmented(tf, counts),
                    "dls": varint_encode_segmented(pl, counts),
                    "n_docs": counts.astype(np.int64),
                    "first_doc_id": pdoc[cs],
                }
            )

        for pdf in it:
            if len(pdf) == 0:
                continue
            tl = pdf["term_ids"]
            lens = np.fromiter(
                (0 if x is None else len(x) for x in tl), np.int64, len(pdf)
            )
            bkt = pdf["bucket"].to_numpy(np.int64)
            ub, uc = np.unique(bkt, return_counts=True)
            for x, c in zip(ub.tolist(), uc.tolist()):
                bucket_docs[x] = bucket_docs.get(x, 0) + c
            total = int(lens.sum())
            if total == 0:
                continue
            tids = np.concatenate(
                [np.asarray(x, np.int64) for x in tl if x is not None and len(x)]
            )
            doc_rep = np.repeat(pdf["doc_id"].to_numpy(np.int64), lens)
            bkt_rep = np.repeat(bkt, lens)
            dl_rep = np.repeat(lens, lens)
            ub2, uc2 = np.unique(bkt_rep, return_counts=True)
            for x, c in zip(ub2.tolist(), uc2.tolist()):
                bucket_tokens[x] = bucket_tokens.get(x, 0) + c
            bufs.append((bkt_rep, tids, doc_rep, dl_rep))
            pending += total
            if pending >= FLUSH_POSTINGS:
                out = flush()
                if out is not None:
                    yield out
        out = flush()
        if out is not None:
            yield out
        # one metrics row per bucket seen by this split (ledger feed)
        if bucket_docs:
            elapsed_ms = int((time.monotonic() - t0) * 1000)
            yield metrics_rows_pdf(bucket_docs, bucket_tokens, elapsed_ms)

    return fn


def chunks_from_docs(docs_df: DataFrame, skip_buckets=None,
                     bucket_group: int = 1) -> DataFrame:
    """Stage A: SPIMI posting chunks, one+ per (bucket group, term).

    Each chunk is internally doc-id-ascending (each input file is
    sorted by (bucket, url), so any read split of it is too). Chunks
    of the same (group, term) from different read splits may cover
    INTERLEAVED doc ranges — the docs table is hash-partitioned by
    bucket, so a split's bucket subset is scattered — and the merge
    kernel therefore sorts within each (term, shard) group before
    block tiling (r5 fix; see _merge_batch_vectorized).

    `bucket_group` should equal the merge's shard group size
    (ceil(n_buckets/n_shards), what build_index passes): chunking at
    the same granularity the merge groups by collapses the zipf tail's
    per-(bucket, term) chunk-row overhead. Chunks produced at ANY
    granularity stay mergeable together (part_id→shard is monotone in
    doc-id space), which is what keeps resume-append and delta epochs
    (group=1) compatible.

    The output carries `is_m` (1 on per-bucket metrics rows, 0 on
    posting chunks) — written with partitionBy("is_m") so the ledger /
    resume scans read ONLY the tiny metrics sidecar via partition
    pruning instead of every chunk file."""
    if skip_buckets:
        docs_df = docs_df.filter(
            ~F.col("bucket").isin([int(x) for x in skip_buckets])
        )
    out = docs_df.select("bucket", "doc_id", "term_ids").mapInPandas(
        _spimi_fn(bucket_group), schema=POSTING_CHUNKS
    )
    return out.withColumn(
        "is_m", (F.col("term_id") == F.lit(METRICS_TERM_ID)).cast("int")
    )


# ------------------------------------------------------------- stage B


def _merge_batch_vectorized(pdf: pd.DataFrame, avg_dl: float,
                            block_size: int,
                            deleted: np.ndarray | None = None) -> pd.DataFrame:
    """Whole-batch merge with ~20 numpy calls total, independent of the
    number of (term, shard) groups — the zipf tail makes most groups
    tiny, so per-group work must be O(0). varint codec only.

    `deleted` (sorted int64 doc ids) purges tombstoned postings during
    the merge: postings are dropped after id reconstruction and chunk
    lengths recomputed, so emitted blocks contain live docs only."""
    k1, b = BM25_K1, BM25_B
    n = pdf["n_docs"].to_numpy(np.int64)
    total = int(n.sum())
    nrows = len(pdf)
    term_arr = pdf["term_id"].to_numpy(np.int64)
    shard_arr = pdf["shard"].to_numpy(np.int64)
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

    # postings must be doc-id-ascending WITHIN each (term, shard)
    # group before block tiling. Chunks arrive sorted by first_doc_id,
    # but their doc RANGES can interleave: the docs table is
    # hash-partitioned by bucket, so one read split's chunk covers a
    # scattered bucket subset (e.g. {65, 94}) that straddles another
    # split's ({70, 80}) — concatenation alone emits misordered blocks
    # and inverted [first, last] envelopes, which the AND block
    # prefilter then prunes wrongly (caught by validate --deep's
    # full-decode audit at 512-bucket scale, r5; small indexes place
    # ≤1 bucket per file, which is why rank-identity tests never saw
    # it). Stable lexsort on (group, id); skipped when already sorted
    # (the common small-index / single-bucket-per-split case).
    new_group = np.ones(nrows, bool)
    if nrows > 1:
        new_group[1:] = (term_arr[1:] != term_arr[:-1]) | (
            shard_arr[1:] != shard_arr[:-1]
        )
    post_group = np.repeat(np.cumsum(new_group) - 1, n)
    unsorted = bool(
        ((ids[1:] <= ids[:-1]) & (post_group[1:] == post_group[:-1])).any()
    ) if total > 1 else False
    if unsorted:
        order = np.lexsort((ids, post_group))
        ids, tfs, dls = ids[order], tfs[order], dls[order]

    if deleted is not None and len(deleted) and total:
        pos = np.searchsorted(deleted, ids)
        dead = (pos < len(deleted)) & (deleted[np.minimum(pos, len(deleted) - 1)] == ids)
        if dead.any():
            keep = ~dead
            n = np.add.reduceat(keep.astype(np.int64), chunk_starts) \
                if nrows else n
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            total = int(n.sum())
            chunk_starts = np.zeros(nrows, np.int64)
            np.cumsum(n[:-1], out=chunk_starts[1:])
            # a chunk may now be empty; groups/blocks below handle n=0
            # rows naturally (zero blocks are emitted for them)

    if total == 0:  # every posting in the batch was tombstoned
        return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in (
            ("term_id", "int64"), ("shard", "int32"), ("block_id", "int32"),
            ("first_doc_id", "int64"), ("last_doc_id", "int64"),
            ("doc_ids_delta", "object"), ("tfs", "object"), ("dls", "object"),
            ("n_docs", "int32"), ("block_max_impact", "float64"),
            ("df", "int64"))})

    impact = tfs / (tfs + k1 * (1 - b + b * dls / avg_dl))

    # group boundaries: consecutive chunks with equal (term, shard)
    # (new_group computed above, before the in-group sort)
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
            "term_id": term_arr[g_chunk][blk_group],
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


def _merge_group(out: dict, term_id: int, shard: int, df_val: int,
                 g: pd.DataFrame, avg_dl: float, codec: str,
                 block_size: int, deleted: np.ndarray | None = None) -> None:
    """Merge one (term, shard) group's chunks into encoded blocks
    (non-varint codecs; the varint path is batch-vectorized above)."""
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
    # same in-group ordering requirement as the vectorized path: chunk
    # doc RANGES can interleave (hash-scattered buckets per read
    # split), so concatenation order is not doc-id order
    if len(ids) > 1 and (ids[1:] <= ids[:-1]).any():
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]
    if deleted is not None and len(deleted) and len(ids):
        pos = np.searchsorted(deleted, ids)
        keep = ~((pos < len(deleted))
                 & (deleted[np.minimum(pos, len(deleted) - 1)] == ids))
        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if len(ids) == 0:
            return
    impact = tfs / (tfs + k1 * (1 - b + b * dls / avg_dl))
    for blk, s in enumerate(range(0, len(ids), block_size)):
        e = min(s + block_size, len(ids))
        d_enc, t_enc, l_enc, first, last = encode_block(
            ids[s:e], tfs[s:e], dls[s:e], codec
        )
        out["term_id"].append(term_id)
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


def _merge_stream_fn(avg_dl: float, codec: str, block_size: int = BLOCK_SIZE,
                     deleted: np.ndarray | None = None):
    """mapInPandas merge: the input partition is sorted by
    (term_id, shard, first_doc_id); groups are detected by key change
    and the trailing (possibly batch-spanning) group is buffered. This
    avoids applyInPandas's per-group JVM round trip — critical because
    the zipf long tail makes most groups tiny."""

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        if codec == CODEC_VARINT:
            return _merge_batch_vectorized(pdf, avg_dl, block_size, deleted)
        out = {k: [] for k in POSTINGS.fieldNames()}
        for (term_id, shard), g in pdf.groupby(["term_id", "shard"], sort=False):
            _merge_group(out, int(term_id), int(shard), int(g["df"].iloc[0]),
                         g, avg_dl, codec, block_size, deleted)
        return pd.DataFrame(out)

    def fn(it):
        buf = None
        for pdf in it:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_t = pdf["term_id"].iloc[-1]
            last_s = pdf["shard"].iloc[-1]
            mask_last = (pdf["term_id"] == last_t) & (pdf["shard"] == last_s)
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
    deleted: np.ndarray | None = None,
) -> DataFrame:
    """Stage B: salted merge. shard = bucket-range group (order-preserving
    salt); df per term aggregated from chunk metadata (cheap — no
    decode), then carried into each salted group. The shuffle is an
    explicit repartition on (term_id, shard) + in-partition sort; the
    merge itself streams through mapInPandas (see _merge_stream_fn).

    `deleted` (sorted int64 doc ids — tombstones from upsert/delete
    delta batches) purges those docs' postings during the merge; the
    STORED per-block df then still counts purged docs (it comes from
    chunk metadata, which is immutable history), so compactions that
    purge set `df_stale` in the manifest and the query path recomputes
    live df per term (query/wand.py — the same cheap branch tiered
    indexes use)."""
    group = shard_group(n_buckets, n_shards)
    pre = chunks.filter(F.col("term_id") != METRICS_TERM_ID).withColumn(
        "shard", (F.col("part_id") / group).cast("int")
    )
    df_tbl = pre.groupBy("term_id").agg(F.sum("n_docs").alias("df"))
    # df_tbl is one row per term — tiny next to the chunk data; AQE
    # turns this into a broadcast join when it fits, leaving the
    # repartition below as the ONLY shuffle of chunk bytes.
    joined = pre.join(df_tbl, "term_id")
    if merge_partitions is None:
        # explicit count — a bare repartition(cols) is subject to AQE
        # coalescing, which can collapse the merge to a near-serial
        # task. 1× slots (r6, was 2×): the merge kernel pays a fixed
        # Python/Arrow cost per task and the shard salting bounds any
        # (term, shard) group far below a partition, so one wave of
        # full-width tasks wins (A/B at 32 cores: merge 4.7 → 3.1 s).
        # Production merges over TB-scale chunk stores should pass
        # merge_partitions sized by chunk bytes (≈256 MB/partition,
        # guide §2.2) rather than cores.
        spark = chunks.sparkSession
        merge_partitions = max(spark.sparkContext.defaultParallelism, 16)
    part = joined.repartition(merge_partitions, "term_id", "shard")
    part = part.sortWithinPartitions("term_id", "shard", "first_doc_id")
    return part.mapInPandas(_merge_stream_fn(avg_dl, codec, deleted=deleted),
                            schema=POSTINGS)


# ------------------------------------------------------------ pipeline


def _write_small_parquet(path: str, columns: dict, schema_str: str) -> None:
    """Driver-side parquet write for tiny control tables (ledger,
    corpus_stats) — a Spark job per kilobyte-sized write is pure
    scheduling overhead. Layout matches a Spark write (dir + _SUCCESS)
    so spark.read.parquet() reads it back unchanged."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    types = {"int32": pa.int32(), "int64": pa.int64(),
             "double": pa.float64(), "string": pa.string()}
    fields = [pa.field(n, types[t]) for n, t in
              (p.strip().split() for p in schema_str.split(","))]
    tbl = pa.table({f.name: pa.array(columns[f.name], f.type) for f in fields})
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _read_if_exists(spark, path):
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def done_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    """Buckets whose chunks are durably committed. Derived from the
    committed chunk METRICS rows (the data itself), with the ledger as
    a secondary source — so a crash *between* the chunks commit and the
    ledger write cannot cause buckets to be re-appended (which would
    duplicate postings)."""
    done: set[int] = set()
    ch = chunks_path(out_dir)
    if os.path.exists(ch):
        df = _read_if_exists(spark, ch)
        if df is not None:
            if "is_m" in df.columns:  # partition-pruned metrics sidecar
                df = df.filter(F.col("is_m") == 1)
            done |= {
                r.part_id
                for r in df.filter(F.col("term_id") == METRICS_TERM_ID)
                .select("part_id")
                .distinct()
                .collect()
            }
    # both the literal dir (pre-manifest crashed builds) and the
    # manifest-resolved one (compactions version the control tables)
    for led in dict.fromkeys(
        (os.path.join(out_dir, "ledger"), ledger_path(out_dir))
    ):
        if os.path.exists(led):
            df = _read_if_exists(spark, led)
            if df is not None:
                done |= {
                    r.part_id
                    for r in df.filter(F.col("status") == "done")
                    .select("part_id")
                    .collect()
                }
    return done


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def read_manifest(out_dir: str) -> dict | None:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def new_snapshot_id(prefix: str) -> str:
    """Globally unique snapshot id: wall-clock millis + random suffix.
    time.monotonic() (the r2 scheme) has a boot-relative epoch, so two
    builds into the same out_dir from different processes (or within
    one second) could collide and silently merge history entries."""
    import uuid

    return f"{prefix}-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"


def write_manifest(out_dir: str, manifest: dict) -> None:
    """Atomic manifest flip (os.replace) — THE single commit point for
    index publishes: data dirs are written to versioned names first,
    then the manifest pointer switches readers over.

    Snapshot log (Iceberg metadata-log analog): every committed
    manifest is also archived under snapshots/<snapshot_id>.json —
    refusing to overwrite an existing snapshot file (ids must be
    unique; see new_snapshot_id) — so `load_index(snapshot_id=...)`
    can time-travel to any published state whose data dirs still
    exist (compaction prunes old data; the log itself is append-only
    and tiny). The snapshot archive also captures the ledger sidecar
    (tiny) so time-traveled reads see snapshot-consistent lineage."""
    snap = manifest.get("snapshot_id")
    prior = read_manifest(out_dir) or {}
    hist = list(prior.get("history", []))
    for s in list(manifest.get("history", [])) + ([snap] if snap else []):
        if s not in hist:
            hist.append(s)
    manifest = dict(manifest, history=hist)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    if snap:
        sdir = os.path.join(out_dir, "snapshots")
        os.makedirs(sdir, exist_ok=True)
        spath = os.path.join(sdir, f"{snap}.json")
        if os.path.exists(spath):
            raise ValueError(
                f"snapshot id {snap!r} already archived in {sdir!r} — "
                "snapshot ids must be unique (use new_snapshot_id)"
            )
        # tmp+replace: a crash mid-write must not leave a truncated
        # snapshot JSON for retention's json.load to trip over forever
        with open(spath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(spath + ".tmp", spath)
        ledger_dir = os.path.join(out_dir, manifest.get("ledger_dir") or "ledger")
        if os.path.exists(ledger_dir):
            import shutil

            shutil.copytree(
                ledger_dir, os.path.join(sdir, f"{snap}-ledger"),
                dirs_exist_ok=True,
            )
    os.replace(tmp, _manifest_path(out_dir))
    return manifest


def rewrite_manifest_in_place(out_dir: str, manifest: dict) -> None:
    """Atomically overwrite the LIVE manifest without archiving a new
    snapshot — for metadata-only mutations that don't publish new data
    (retention policy set, history pruning by expire_snapshots).
    write_manifest would refuse (its snapshot id is already archived)."""
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(out_dir))


def docs_dir_path(out_dir: str, manifest: dict | None = None) -> str:
    m = manifest if manifest is not None else (read_manifest(out_dir) or {})
    return os.path.join(out_dir, m.get("docs_dir") or "docs")


def ledger_path(out_dir: str, manifest: dict | None = None) -> str:
    """Manifest-resolved ledger dir. Compactions write VERSIONED
    control tables (ledger-{snapshot}) and flip this pointer with the
    manifest, so readers can never observe stats that contradict the
    manifest's snapshot (ADVICE r3 crash-window fix)."""
    m = manifest if manifest is not None else (read_manifest(out_dir) or {})
    return os.path.join(out_dir, m.get("ledger_dir") or "ledger")


def corpus_stats_path(out_dir: str, manifest: dict | None = None) -> str:
    m = manifest if manifest is not None else (read_manifest(out_dir) or {})
    return os.path.join(out_dir, m.get("corpus_stats_dir") or "corpus_stats")


def delta_doc_stats_dirs(out_dir: str,
                         manifest: dict | None = None) -> list[str]:
    """Existing delta doc-dictionary dirs: the GC-consolidated dir the
    manifest points at (if any) plus the default live dir new epochs
    keep writing into. Deduped, existing-only."""
    m = manifest if manifest is not None else (read_manifest(out_dir) or {})
    names = []
    if m.get("delta_doc_stats_dir"):
        names.append(m["delta_doc_stats_dir"])
    # the live ingest dir — snapshot-retention GC rewrites archived
    # manifests to point this at the relocated archive copy
    names.append(m.get("delta_doc_stats_live_dir") or "delta_doc_stats")
    out = []
    for n in dict.fromkeys(names):
        p = os.path.join(out_dir, n)
        if os.path.exists(p):
            out.append(p)
    return out


def delta_deletes_path(out_dir: str, manifest: dict | None = None) -> str:
    """Delete-log dir. Live manifests use the default literal name;
    archived (time-travel) manifests may point at a snapshot-retention
    archive copy relocated by GC."""
    m = manifest or {}
    return os.path.join(out_dir, m.get("delta_deletes_dir") or "delta_deletes")


def delete_epochs_on_disk(out_dir: str,
                          manifest: dict | None = None) -> list[int]:
    p = delta_deletes_path(out_dir, manifest)
    if not os.path.exists(p):
        return []
    return sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(p)
        if e.startswith("epoch=") and os.path.isdir(os.path.join(p, e))
    )


def read_tombstones(spark: SparkSession, out_dir: str,
                    epochs: list[int] | None = None,
                    manifest: dict | None = None) -> DataFrame | None:
    """Tombstoned doc ids from upsert/delete delta batches
    (delta_deletes/epoch=N, one `doc_id long` column). `epochs`
    restricts to a snapshot's pinned set (time travel); None = all.
    `manifest` resolves the delete-log dir (time-traveled manifests
    may point at a retention-archive copy)."""
    p = delta_deletes_path(out_dir, manifest)
    if not os.path.exists(p):
        return None
    df = spark.read.option("basePath", p).parquet(p)
    if epochs is not None:
        df = df.filter(F.col("epoch").isin([int(e) for e in epochs]))
    return df.select("doc_id")


def collect_tombstones(spark: SparkSession, out_dir: str,
                       epochs: list[int] | None = None) -> np.ndarray:
    """Sorted int64 tombstone array for merge-time purge / query-time
    filtering. Callers must gate on TOMBSTONE_DRIVER_CAP first (the
    distributed deleted_df / cogroup paths take over above it) — this
    materializes the whole set driver-side (Arrow toPandas, not
    row-at-a-time collect)."""
    t = read_tombstones(spark, out_dir, epochs)
    if t is None:
        return np.zeros(0, np.int64)
    return np.unique(t.toPandas()["doc_id"].to_numpy(np.int64))


def postings_path(out_dir: str) -> str:
    m = read_manifest(out_dir)
    return os.path.join(out_dir, (m or {}).get("postings_dir", "postings"))


def chunks_path(out_dir: str) -> str:
    m = read_manifest(out_dir)
    return os.path.join(out_dir, (m or {}).get("chunks_dir", "chunks"))


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
    docs_partitions: int | None = None,
    merge_partitions: int | None = None,
) -> dict:
    """Full build: docs (ids+term_ids) → chunks (resumable) → ledger →
    merged postings. Returns the manifest dict.

    Resumability (north rule): the chunk stage appends per-bucket; the
    done-set is *derived from committed chunk data* (metrics rows), so
    a crash between data and ledger writes cannot desynchronize them —
    rerunning with resume=True recomputes done-buckets from the data.
    """
    t_start = time.monotonic()
    stage_secs: dict[str, float] = {}
    done: set[int] = done_buckets(spark, out_dir) if resume else set()
    sc = spark.sparkContext
    par = sc.defaultParallelism
    if docs_partitions is None:
        # 1× slots (r6, was 3× then 2×): the chunks stage pays a fixed
        # Arrow boundary cost per read split and the merge scans one
        # chunk file per chunk task, so fewer/larger docs files win as
        # long as splits still cover the cluster — A/Bs at 32 cores:
        # 3×→2× full build 8.4 → 6.6 s, then 2×→1× 7.5-7.7 → 6.3-6.7 s
        # clean-window (the win shows in the merge stage, 3.4-3.6 →
        # 2.7-3.0 s). Still parameterised on parallelism; floor 48
        # keeps the resume/SPIMI granularity of small runs and leaves
        # the 1c/4c scaling levels byte-identical (floor dominates
        # there).
        docs_partitions = max(par, 48)

    # job 1: the docs table (skip if resuming and committed — ids are
    # (bucket, url)-deterministic; _SUCCESS guards a crashed write).
    # Resume resolves the dir through the manifest: a chunk-store GC
    # renames it (docs-g{gen}) — resuming must not rebuild a docs
    # table that already exists under the manifest pointer.
    docs_dir = (docs_dir_path(out_dir) if resume
                else os.path.join(out_dir, "docs"))
    _t = time.monotonic()
    sc.setJobDescription("build:docs")
    if not (resume and os.path.exists(os.path.join(docs_dir, "_SUCCESS"))):
        # Probe prunability without directory partitioning: each file's
        # rows are (bucket, url)-sorted (the rank window), so parquet
        # row-group min/max stats on `bucket` serve any url-keyed probe
        # (upsert/delete reconciliation — incremental._existing_doc_dict
        # pushes In(bucket, …) into this scan) at O(batch) data IO.
        # A partitionBy("bucket") layout was tried in r4 and REVERTED:
        # with n_buckets = 16×cores it shattered the table into one
        # tiny file per bucket, exploding every downstream stage's task
        # count (chunks/ledger 49 → 513 tasks) and cutting measured
        # build throughput ~6× — per-file scheduling overhead dwarfed
        # the probe win. Row-group pruning gives the same IO bound with
        # zero write-path cost.
        docs_with_term_ids(
            pages, n_buckets, use_html, num_partitions=docs_partitions
        ).write.mode("overwrite").parquet(docs_dir)
    stage_secs["docs"] = round(time.monotonic() - _t, 2)
    docs = spark.read.parquet(docs_dir)

    # job 2: SPIMI chunks (append missing buckets only). partitionBy
    # the is_m flag: metrics rows land in a tiny sidecar directory that
    # ledger/resume scans read via partition pruning.
    ch_dir = chunks_path(out_dir)
    _t = time.monotonic()
    sc.setJobDescription("build:chunks")
    # chunk at the merge's shard-group granularity (see chunks_from_docs)
    group = shard_group(n_buckets, n_shards)
    chunks_out = chunks_from_docs(docs, skip_buckets=done or None,
                                  bucket_group=group)
    if resume and os.path.exists(ch_dir):
        # layout guard: a chunks dir from the pre-sidecar layout (flat,
        # no is_m= partition dirs) cannot take a partitionBy append —
        # Spark's partition discovery rejects the mixed layout on the
        # next read. Refuse with a clear error instead of corrupting.
        has_partition_dirs = any(
            e.startswith("is_m=") for e in os.listdir(ch_dir)
            if os.path.isdir(os.path.join(ch_dir, e))
        )
        if not has_partition_dirs:
            from ela_lib_spark.errors import IndexCorruptError

            raise IndexCorruptError(
                f"chunks dir {ch_dir!r} uses the legacy flat layout "
                "(layout_version < 2, no is_m= partitions); resume onto "
                "it would produce a mixed layout Spark cannot read. "
                "Rebuild without resume=True, or migrate the directory."
            )
        mode = "append"
    else:
        mode = "overwrite"
    chunks_out.write.mode(mode).partitionBy("is_m").parquet(ch_dir)
    stage_secs["chunks"] = round(time.monotonic() - _t, 2)
    chunks = spark.read.parquet(ch_dir)

    # ledger + corpus stats, derived from committed metrics rows: ONE
    # partition-pruned scan; the (tiny) ledger/corpus_stats tables are
    # then written driver-side with pyarrow — no extra Spark jobs.
    _t = time.monotonic()
    sc.setJobDescription("build:ledger")
    ledger_rows = ledger_rows_from_metrics(
        chunks.filter((F.col("is_m") == 1)
                      & (F.col("term_id") == METRICS_TERM_ID))
    )
    snapshot = new_snapshot_id("build")
    _write_small_parquet(
        os.path.join(out_dir, "ledger"),
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
    n_docs = sum(r.n_docs for r in ledger_rows)
    n_tokens = sum(r.n_tokens for r in ledger_rows)
    avg_dl = float(n_tokens) / float(n_docs) if n_docs else 0.0
    _write_small_parquet(
        os.path.join(out_dir, "corpus_stats"),
        {"n_docs": [int(n_docs)], "avg_dl": [float(avg_dl)]},
        "n_docs int64, avg_dl double",
    )
    stage_secs["ledger"] = round(time.monotonic() - _t, 2)

    # job 3: salted merge → final postings. Written directly: each merge
    # output partition is already sorted by term_id, so parquet
    # row-group min/max stats prune the query path's term_id filter
    # without an extra repartition shuffle.
    _t = time.monotonic()
    sc.setJobDescription("build:merge")
    merged = merge_chunks(chunks, float(avg_dl), n_shards, n_buckets, codec,
                          merge_partitions)
    merged.write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
    stage_secs["merge"] = round(time.monotonic() - _t, 2)
    sc.setJobDescription(None)

    manifest = {
        "layout_version": 2,
        "codec": codec,
        "n_buckets": n_buckets,
        "n_shards": n_shards,
        # chunk-row part_id granularity: bulk chunk rows carry the
        # bucket-GROUP base bucket (delta epochs use group=1 → exact
        # bucket) — the distributed tombstone→chunk mapping needs this
        "chunk_bucket_group": group,
        "n_docs": int(n_docs),
        "avg_dl": float(avg_dl),
        "avg_dl_at_merge": float(avg_dl),
        "block_size": BLOCK_SIZE,
        "bm25": {"k1": BM25_K1, "b": BM25_B},
        "build_secs": time.monotonic() - t_start,
        "stage_secs": stage_secs,
        "extractor_version": 1,
        "postings_dir": "postings",
        "chunks_dir": "chunks",
        "ledger_dir": "ledger",
        "corpus_stats_dir": "corpus_stats",
        "docs_dir": os.path.basename(docs_dir),
        "snapshot_id": snapshot,
        "delete_epochs": delete_epochs_on_disk(out_dir),
    }
    write_manifest(out_dir, manifest)
    return manifest


def load_index(spark: SparkSession, out_dir: str,
               snapshot_id: str | None = None,
               driver_tombstone_cap: int | None = None) -> dict:
    """Open a published index. `snapshot_id` time-travels to an
    archived snapshot manifest (snapshots/<id>.json) — readable as
    long as compaction hasn't pruned the data dirs it references.

    Snapshot consistency: a time-traveled load returns `corpus_stats`
    SYNTHESIZED from the snapshot manifest (n_docs/avg_dl as written
    at publish time) and the `ledger` archived beside the snapshot —
    never the live tables, which later compactions overwrite. The
    `docs`/`doc_stats` surface is the live doc dictionary (doc rows
    are append-only between full rebuilds, so snapshot doc ids all
    resolve; rows added after the snapshot may also be present).

    With tiered delta compaction (streaming/incremental.py) the
    manifest may carry `tier_postings`: extra postings directories
    merged from delta segments. `postings` is the union; tier rows
    may carry per-tier df values — query paths recompute global df
    per term when `manifest['tiers']` is present (query/wand.py)."""
    from ela_lib_spark.errors import IndexCorruptError, IndexNotFoundError

    if snapshot_id is not None:
        p = os.path.join(out_dir, "snapshots", f"{snapshot_id}.json")
        if not os.path.exists(p):
            raise IndexNotFoundError(
                f"snapshot {snapshot_id!r} not in {out_dir!r}/snapshots"
            )
        with open(p) as f:
            manifest = json.load(f)
    else:
        manifest = read_manifest(out_dir)
    if manifest is None:
        raise IndexNotFoundError(
            f"no manifest.json under {out_dir!r} — not a published index"
        )
    try:
        docs = spark.read.parquet(docs_dir_path(out_dir, manifest))
        doc_stats = doc_stats_from_docs(docs)
        # streamed docs' dictionary rows live beside the bulk docs table
        # (delta_doc_stats/epoch=N, written by apply_delta_batch; plus
        # the GC-consolidated dir when one exists) — the doc-stats
        # surface must cover them too after compaction
        # time-traveled loads pin the delta doc-dictionary to the
        # epochs the snapshot's POSTINGS cover (base_epochs + tier
        # epochs; -1 = the GC-consolidated dir a post-GC manifest
        # points at): epochs ingested after the snapshot are invisible
        # to its postings, so they must be invisible to its doc
        # surface too. Live loads see everything on disk.
        pinned_epochs = None
        if snapshot_id is not None:
            pinned_epochs = {-1} | set(manifest.get("base_epochs", []))
            for t in manifest.get("tiers", []):
                pinned_epochs.update(t.get("epochs", []))
        for delta_ds in delta_doc_stats_dirs(out_dir, manifest):
            extra = spark.read.option("basePath", delta_ds).parquet(delta_ds)
            if pinned_epochs is not None:
                extra = extra.filter(
                    F.col("epoch").isin([int(e) for e in pinned_epochs])
                )
            doc_stats = doc_stats.unionByName(
                extra.select("doc_id", "url", "doc_len", "bucket")
            )
        # tombstones (upsert/delete delta batches): live loads see every
        # delete epoch on disk; time-traveled loads see the epoch set
        # pinned in the snapshot manifest (absent field = none existed)
        del_epochs = (manifest.get("delete_epochs", [])
                      if snapshot_id is not None else None)
        tomb = read_tombstones(spark, out_dir, del_epochs, manifest)
        if del_epochs and tomb is None:
            # the snapshot PINS delete epochs but its delete log is
            # gone — treating that as "no tombstones" would silently
            # resurrect deleted docs. Fail loudly instead (a crashed
            # GC relocation is auto-repaired by the next maintenance
            # op's _replay_relocations; otherwise the snapshot's data
            # has been expired).
            raise IndexCorruptError(
                f"snapshot {snapshot_id!r} pins delete epochs "
                f"{del_epochs} but its delete log is missing — run a "
                "maintenance op to replay a crashed relocation, or "
                "the snapshot has been expired"
            )
        deleted_df = None
        if tomb is not None:
            doc_stats = doc_stats.join(tomb, "doc_id", "left_anti")
            cap = (TOMBSTONE_DRIVER_CAP if driver_tombstone_cap is None
                   else driver_tombstone_cap)
            # ONE bounded job: pull at most cap+1 DISTINCT ids; under
            # the cap that IS the tombstone array (no separate count
            # job). distinct() matters (ADVICE r4): the delete log
            # holds duplicates (each upsert epoch re-tombstones a
            # still-present bulk doc), so probing raw rows would push
            # indexes with a small distinct set but a long epoch
            # history onto the expensive full-shuffle cogroup path —
            # the same distinct-count gating _gc_index_impl uses.
            head = tomb.distinct().limit(cap + 1).toPandas()["doc_id"] \
                .to_numpy(np.int64)
            if len(head) <= cap:
                deleted_ids = np.unique(head)
            else:
                # absolute driver bound (VERDICT r3 #1): past the cap
                # the tombstone set stays a DataFrame — query paths
                # apply it via a shard-co-grouped filter (wand.py), GC
                # via a part-co-grouped chunk rewrite (incremental.py)
                deleted_ids = None
                deleted_df = tomb
        else:
            deleted_ids = np.zeros(0, np.int64)
        postings = spark.read.parquet(
            os.path.join(out_dir, manifest.get("postings_dir", "postings"))
        )
        for tier in manifest.get("tiers", []):
            postings = postings.unionByName(
                spark.read.parquet(os.path.join(out_dir, tier["postings_dir"]))
            )
        if snapshot_id is not None:
            corpus_stats = spark.createDataFrame(
                [(int(manifest["n_docs"]), float(manifest["avg_dl"]))],
                "n_docs long, avg_dl double",
            )
            snap_ledger = os.path.join(
                out_dir, "snapshots", f"{snapshot_id}-ledger"
            )
            ledger = spark.read.parquet(
                snap_ledger if os.path.exists(snap_ledger)
                else ledger_path(out_dir, manifest)
            )
        else:
            corpus_stats = spark.read.parquet(
                corpus_stats_path(out_dir, manifest)
            )
            ledger = spark.read.parquet(ledger_path(out_dir, manifest))
        out = {
            "manifest": manifest,
            "postings": postings,
            "docs": docs,
            "doc_stats": doc_stats,
            "corpus_stats": corpus_stats,
            "ledger": ledger,
            "deleted_ids": deleted_ids,
            "deleted_df": deleted_df,
            # provenance for serving-cache revalidation (query/wand.py):
            # a pinned serving session compares the live manifest's
            # snapshot_id against its pin before each query
            "dir": out_dir,
            "time_travel": snapshot_id is not None,
            "driver_tombstone_cap": driver_tombstone_cap,
        }
    except Exception as e:  # manifest points at missing/unreadable data
        raise IndexCorruptError(
            f"manifest at {out_dir!r} references unreadable datasets: {e}"
        ) from e
    return out
