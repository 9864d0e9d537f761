"""Tiered compaction: base index + streamed delta epochs → tier
postings (minor, O(delta) IO — base files byte-identical) and a
periodic major merge; queries stay rank-identical over the combined
corpus at every step."""

import os

from pyspark.sql import functions as F

from ela_lib_spark.index.build import DOC_BITS, build_index, ids_with_tokens, load_index
from ela_lib_spark.oracle.brute import brute_topk
from ela_lib_spark.query.wand import wand_topk
from ela_lib_spark.sources.synth import synth_pages_df
from ela_lib_spark.streaming.incremental import (
    DELTA_BUCKET_BASE,
    apply_delta_batch,
    compact_index,
)

QUERIES = (
    (["term0000"], "OR"),
    (["term0002", "term0045"], "AND"),
    (["term0005", "term0417"], "OR"),
)


def _file_stats(root):
    """{relpath: (size, mtime_ns)} over every data file under root."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def _check_rank_identity(idx, toks):
    m = idx["manifest"]
    for terms, mode in QUERIES:
        want = brute_topk(toks, terms, mode, k=10, n_docs=m["n_docs"],
                          avg_dl=m["avg_dl"])
        got = [(r.doc_id, r.score)
               for r in wand_topk(idx, terms, mode, k=10).collect()]
        assert got == want, (terms, mode)


def test_compaction_rank_identity_and_base_untouched(spark, tmp_root):
    idx_dir = os.path.join(tmp_root, "compact_idx")
    all_pages = synth_pages_df(spark, 600).cache()
    # deterministic split: base / two delta micro-batches
    base = all_pages.filter(F.pmod(F.xxhash64("url"), 4) != 0)
    extra = all_pages.filter(F.pmod(F.xxhash64("url"), 4) == 0)
    batch0 = extra.filter(F.pmod(F.xxhash64("url", F.lit(1)), 2) == 0)
    batch1 = extra.filter(F.pmod(F.xxhash64("url", F.lit(1)), 2) != 0)
    n_base, n0, n1 = base.count(), batch0.count(), batch1.count()
    assert n_base + n0 + n1 == 600

    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2, use_html=True)
    apply_delta_batch(batch0, 0, idx_dir, n_buckets=4)
    apply_delta_batch(batch1, 1, idx_dir, n_buckets=4)

    # VERDICT r2 #2: minor compaction must not rewrite the base — pin
    # every base chunk AND base postings file (size + mtime) first
    base_chunks_before = _file_stats(os.path.join(idx_dir, "chunks"))
    base_postings_before = _file_stats(os.path.join(idx_dir, "postings"))

    res = compact_index(spark, idx_dir, n_shards=2)
    assert res["mode"] == "minor"
    assert res["compacted_epochs"] == 2
    assert res["n_docs"] == 600

    assert _file_stats(os.path.join(idx_dir, "chunks")) == base_chunks_before
    assert _file_stats(os.path.join(idx_dir, "postings")) == base_postings_before

    idx = load_index(spark, idx_dir)
    assert idx["manifest"]["n_docs"] == 600
    assert len(idx["manifest"]["tiers"]) == 1

    # ground truth over the COMBINED corpus with the ids the engine used
    toks = {
        r.doc_id: list(r.tokens)
        for r in ids_with_tokens(base, 4, use_html=True)
        .select("doc_id", "tokens").collect()
    }
    for epoch, batch in ((0, batch0), (1, batch1)):
        off = DELTA_BUCKET_BASE + epoch * 4
        for r in (
            ids_with_tokens(batch, 4)
            .withColumn("doc_id", F.col("doc_id") + (off << DOC_BITS))
            .select("doc_id", "tokens")
            .collect()
        ):
            toks[r.doc_id] = list(r.tokens)
    assert len(toks) == 600

    _check_rank_identity(idx, toks)

    # a second minor compact with no new epochs is a no-op
    res2 = compact_index(spark, idx_dir, n_shards=2)
    assert res2 == {"compacted_epochs": 0, "mode": "minor"}

    # major compaction folds base + tiers into ONE postings dir and
    # stays rank-identical; the chunk store is still untouched
    chunks_before_major = _file_stats(os.path.join(idx_dir, "chunks"))
    res3 = compact_index(spark, idx_dir, n_shards=2, mode="major")
    assert res3["mode"] == "major"
    assert res3["n_docs"] == 600
    assert _file_stats(os.path.join(idx_dir, "chunks")) == chunks_before_major

    idx2 = load_index(spark, idx_dir)
    assert idx2["manifest"]["tiers"] == []
    assert idx2["manifest"]["n_docs"] == 600
    assert not os.path.exists(os.path.join(idx_dir, "postings"))  # pruned
    _check_rank_identity(idx2, toks)


def test_snapshot_log_and_time_travel(spark, tmp_root):
    """Every publish archives its manifest under snapshots/ (Iceberg
    metadata-log analog). Minor compaction preserves old snapshots'
    readability (base postings survive); a major compaction prunes the
    superseded postings dirs, after which loading the stale snapshot
    raises the typed corruption error. Time-traveled loads return
    snapshot-consistent corpus_stats/ledger (ADVICE r2)."""
    import pytest as _pytest

    from ela_lib_spark.errors import IndexCorruptError, IndexNotFoundError

    idx_dir = os.path.join(tmp_root, "snap_idx")
    pages = synth_pages_df(spark, 300).cache()
    m0 = build_index(spark, pages.limit(200), idx_dir, n_buckets=4, n_shards=2)
    snap0 = m0["snapshot_id"]
    assert os.path.exists(os.path.join(idx_dir, "snapshots", f"{snap0}.json"))

    via_snap = load_index(spark, idx_dir, snapshot_id=snap0)
    assert via_snap["manifest"]["n_docs"] == 200

    apply_delta_batch(pages.subtract(pages.limit(200)), 0, idx_dir, n_buckets=4)
    compact_index(spark, idx_dir, n_shards=2)  # minor → tier
    cur = load_index(spark, idx_dir)
    snap1 = cur["manifest"]["snapshot_id"]
    assert cur["manifest"]["n_docs"] == 300
    assert cur["manifest"]["history"] == [snap0, snap1]
    assert load_index(spark, idx_dir, snapshot_id=snap1)["manifest"][
        "n_docs"
    ] == 300

    # time travel to the PRE-compaction snapshot still works after a
    # minor compact (nothing pruned), and its corpus_stats/ledger are
    # the snapshot's own, not the live (post-compaction) tables
    old = load_index(spark, idx_dir, snapshot_id=snap0)
    assert old["manifest"]["n_docs"] == 200
    assert old["postings"].count() > 0
    cs = old["corpus_stats"].first()
    assert cs.n_docs == 200
    assert abs(cs.avg_dl - old["manifest"]["avg_dl"]) < 1e-9
    assert sum(r.n_docs for r in old["ledger"].collect()) == 200
    # live tables meanwhile describe the compacted corpus
    assert load_index(spark, idx_dir)["corpus_stats"].first().n_docs == 300

    # major compaction prunes the old base postings dir → stale
    # snapshot now raises the typed corruption error
    compact_index(spark, idx_dir, n_shards=2, mode="major")
    with _pytest.raises(IndexCorruptError):
        load_index(spark, idx_dir, snapshot_id=snap0)
    with _pytest.raises(IndexNotFoundError):
        load_index(spark, idx_dir, snapshot_id="nope")


def test_compaction_refreshes_control_tables(spark, tmp_root):
    """Review r2: after compaction, corpus_stats / ledger / doc_stats
    must agree with the manifest (not describe the pre-compaction
    corpus), and the chunk store must keep the is_m sidecar
    partitioning so resume/ledger scans stay partition-pruned."""
    idx_dir = os.path.join(tmp_root, "ctrl_idx")
    pages = synth_pages_df(spark, 300).cache()
    build_index(spark, pages.limit(200), idx_dir, n_buckets=4, n_shards=2)
    apply_delta_batch(pages.subtract(pages.limit(200)), 0, idx_dir, n_buckets=4)
    compact_index(spark, idx_dir, n_shards=2)

    idx = load_index(spark, idx_dir)
    assert idx["manifest"]["n_docs"] == 300
    cs = idx["corpus_stats"].first()
    assert cs.n_docs == 300
    assert sum(r.n_docs for r in idx["ledger"].collect()) == 300
    assert idx["doc_stats"].count() == 300
    assert idx["doc_stats"].select("doc_id").distinct().count() == 300
    chunks_dir = os.path.join(idx_dir, idx["manifest"]["chunks_dir"])
    assert os.path.isdir(os.path.join(chunks_dir, "is_m=1"))


def test_upsert_delete_tombstones_and_purge(spark, tmp_root):
    """Upsert/delete delta semantics (r3): re-ingested urls tombstone
    their old doc ids (last-write-wins); tombstoned docs never appear
    in results (query-side filter pre-compaction, merge-time purge
    after); corpus stats exclude them from the next compaction on; a
    major compaction physically removes their postings and restores
    exact rank-identity vs brute force over the LIVE corpus."""
    from ela_lib_spark.index.build import collect_tombstones

    idx_dir = os.path.join(tmp_root, "upsert_idx")
    pages = synth_pages_df(spark, 400).cache()
    base = pages.limit(300).cache()
    extra = pages.subtract(base).cache()
    assert extra.count() == 100

    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2, use_html=True)

    # epoch 0 (upsert): 50 re-crawled urls with CHANGED text + 50 new
    changed = base.limit(50).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzupdated zzupdated"))
    )
    new50 = extra.limit(50)
    apply_delta_batch(changed.unionByName(new50), 0, idx_dir,
                      n_buckets=4, mode="upsert")

    idx1 = load_index(spark, idx_dir)
    assert len(idx1["deleted_ids"]) == 50
    old_ids = set(int(x) for x in idx1["deleted_ids"])
    # pre-compaction: the query-side filter hides tombstoned docs even
    # though their postings are still in the base index
    got = {r.doc_id for r in wand_topk(idx1, ["term0000"], "OR", 300).collect()}
    assert not (got & old_ids), "tombstoned doc leaked into results"
    # doc_stats surface excludes tombstones too
    assert idx1["doc_stats"].join(
        spark.createDataFrame([(i,) for i in old_ids], "doc_id long"),
        "doc_id", "left_semi").count() == 0

    # minor compaction: new versions become searchable, stats go live
    res = compact_index(spark, idx_dir, n_shards=2)
    assert res["mode"] == "minor"
    idx2 = load_index(spark, idx_dir)
    assert idx2["manifest"]["n_docs"] == 350  # 300 - 50 + 100
    assert idx2["corpus_stats"].first().n_docs == 350
    upd = {r.doc_id for r in
           wand_topk(idx2, ["zzupdated"], "OR", 100).collect()}
    assert len(upd) == 50 and not (upd & old_ids)
    got = {r.doc_id for r in wand_topk(idx2, ["term0000"], "OR", 350).collect()}
    assert not (got & old_ids)
    # serving mode (cached envelopes + literal AND prefilter) must
    # apply the same tombstone filter
    from ela_lib_spark.query.wand import prepare_serving

    served = prepare_serving(dict(idx2))
    got_and = {r.doc_id for r in
               wand_topk(served, ["term0002", "term0045"], "AND", 350).collect()}
    assert not (got_and & old_ids)

    # epoch 1 (delete): drop 30 of the new docs by url
    apply_delta_batch(new50.limit(30).select("url"), 1, idx_dir,
                      n_buckets=4, mode="delete")
    assert len(collect_tombstones(spark, idx_dir)) == 80

    # major compaction: postings physically purged, df recomputed live
    res = compact_index(spark, idx_dir, n_shards=2, mode="major")
    assert res["mode"] == "major"
    idx3 = load_index(spark, idx_dir)
    assert idx3["manifest"]["n_docs"] == 320
    assert idx3["manifest"]["df_stale"] is True

    # ground truth over the LIVE corpus with the engine's ids
    toks = {
        r.doc_id: list(r.tokens)
        for r in ids_with_tokens(base, 4, use_html=True)
        .select("doc_id", "tokens").collect()
        if r.doc_id not in old_ids
    }
    dead_urls = {r.url for r in new50.limit(30).select("url").collect()}
    off = DELTA_BUCKET_BASE
    for r in (
        ids_with_tokens(changed.unionByName(new50), 4)
        .withColumn("doc_id", F.col("doc_id") + (off << DOC_BITS))
        .select("url", "doc_id", "tokens").collect()
    ):
        if r.url not in dead_urls:
            toks[r.doc_id] = list(r.tokens)
    assert len(toks) == 320

    m = idx3["manifest"]
    for terms, mode in ([["term0000"], "OR"], [["zzupdated"], "OR"],
                        [["term0002", "term0045"], "AND"]):
        want = brute_topk(toks, terms, mode, k=10, n_docs=m["n_docs"],
                          avg_dl=m["avg_dl"])
        got = [(r.doc_id, r.score)
               for r in wand_topk(idx3, terms, mode, k=10).collect()]
        assert got == want, (terms, mode)


def test_gc_index_reclaims_tombstones_and_deltas(spark, tmp_root):
    """gc_index (r3): one chunk-store rewrite purges tombstoned
    postings, consolidates delta epochs and doc dictionaries, clears
    the delete log and df_stale, and leaves the index equivalent to a
    fresh bulk build of the live corpus (same doc ids). Maintenance
    continues normally afterwards."""
    from ela_lib_spark.index.build import collect_tombstones
    from ela_lib_spark.streaming.incremental import gc_index

    idx_dir = os.path.join(tmp_root, "gc_idx")
    pages = synth_pages_df(spark, 400).cache()
    base = pages.limit(300).cache()
    extra = pages.subtract(base).cache()

    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2, use_html=True)
    changed = base.limit(40).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzgcupdated"))
    )
    new40 = extra.limit(40)
    apply_delta_batch(changed.unionByName(new40), 0, idx_dir,
                      n_buckets=4, mode="upsert")
    apply_delta_batch(new40.limit(20).select("url"), 1, idx_dir,
                      n_buckets=4, mode="delete")
    compact_index(spark, idx_dir, n_shards=2)  # minor, pre-GC state
    assert len(collect_tombstones(spark, idx_dir)) == 60

    res = gc_index(spark, idx_dir, n_shards=2)
    assert res["mode"] == "gc" and res["purged"] == 60
    assert res["n_docs"] == 320  # 300 - 40 + 80 - 20

    assert not os.path.exists(os.path.join(idx_dir, "delta_chunks"))
    assert not os.path.exists(os.path.join(idx_dir, "delta_deletes"))

    idx = load_index(spark, idx_dir)
    m = idx["manifest"]
    assert m["n_docs"] == 320 and m["df_stale"] is False
    assert m["delete_epochs"] == [] and m["tiers"] == []
    assert len(idx["deleted_ids"]) == 0
    assert idx["doc_stats"].count() == 320
    assert idx["corpus_stats"].first().n_docs == 320

    # ground truth over the live corpus — ids unchanged by GC
    old_ids = set()  # recompute which base ids were replaced
    replaced_urls = {r.url for r in changed.select("url").collect()}
    toks = {}
    for r in (ids_with_tokens(base, 4, use_html=True)
              .select("url", "doc_id", "tokens").collect()):
        if r.url not in replaced_urls:
            toks[r.doc_id] = list(r.tokens)
        else:
            old_ids.add(r.doc_id)
    dead_urls = {r.url for r in new40.limit(20).select("url").collect()}
    off = DELTA_BUCKET_BASE
    for r in (
        ids_with_tokens(changed.unionByName(new40), 4)
        .withColumn("doc_id", F.col("doc_id") + (off << DOC_BITS))
        .select("url", "doc_id", "tokens").collect()
    ):
        if r.url not in dead_urls:
            toks[r.doc_id] = list(r.tokens)
    assert len(toks) == 320

    for terms, mode in ([["term0000"], "OR"], [["zzgcupdated"], "OR"],
                        [["term0002", "term0045"], "AND"]):
        want = brute_topk(toks, terms, mode, k=10, n_docs=m["n_docs"],
                          avg_dl=m["avg_dl"])
        got = [(r.doc_id, r.score)
               for r in wand_topk(idx, terms, mode, k=10).collect()]
        assert got == want, (terms, mode)
    assert not ({r.doc_id for r in
                 wand_topk(idx, ["term0000"], "OR", 320).collect()} & old_ids)

    # maintenance continues after GC: a fresh upsert epoch + compact
    next20 = extra.subtract(new40).limit(20)
    apply_delta_batch(next20, 5, idx_dir, n_buckets=4, mode="upsert")
    res2 = compact_index(spark, idx_dir, n_shards=2)
    assert res2["mode"] == "minor" and res2["n_docs"] == 340
    idx2 = load_index(spark, idx_dir)
    assert idx2["doc_stats"].count() == 340
    assert wand_topk(idx2, ["term0000"], "OR", 10).count() == 10


def test_compact_auto_escalates_to_gc(spark, tmp_root):
    """auto mode runs GC (not a tier merge) once tombstones exceed the
    configured fraction of the live corpus."""
    from ela_lib_spark.streaming.incremental import gc_index  # noqa: F401

    idx_dir = os.path.join(tmp_root, "autogc_idx")
    pages = synth_pages_df(spark, 200).cache()
    build_index(spark, pages, idx_dir, n_buckets=4, n_shards=2)
    # delete 80/200 urls (40% > default 25% threshold)
    apply_delta_batch(pages.limit(80).select("url"), 0, idx_dir,
                      n_buckets=4, mode="delete")
    res = compact_index(spark, idx_dir, n_shards=2)  # auto
    assert res["mode"] == "gc" and res["purged"] == 80
    idx = load_index(spark, idx_dir)
    assert idx["manifest"]["n_docs"] == 120
    assert len(idx["deleted_ids"]) == 0
    assert wand_topk(idx, ["term0000"], "OR", 200).count() <= 120


def test_delete_only_epoch_refreshes_stats(spark, tmp_root):
    """A delete-only workload (no new chunk epochs) must still publish
    refreshed live stats at compaction — r3 self-review fix: the
    minor-mode no-op early return previously skipped it."""
    idx_dir = os.path.join(tmp_root, "delonly_idx")
    pages = synth_pages_df(spark, 200).cache()
    build_index(spark, pages, idx_dir, n_buckets=4, n_shards=2)
    apply_delta_batch(pages.limit(30).select("url"), 0, idx_dir,
                      n_buckets=4, mode="delete")
    res = compact_index(spark, idx_dir, n_shards=2, mode="minor")
    assert res["mode"] == "minor" and res["compacted_epochs"] == 0
    idx = load_index(spark, idx_dir)
    assert idx["manifest"]["n_docs"] == 170
    assert idx["corpus_stats"].first().n_docs == 170
    assert idx["manifest"]["df_stale"] is True
    assert idx["manifest"]["delete_epochs"] == [0]
    # second minor with nothing new: true no-op
    assert compact_index(spark, idx_dir, n_shards=2, mode="minor") == {
        "compacted_epochs": 0, "mode": "minor"
    }


def test_gc_index_with_empty_delete_log(spark, tmp_root):
    """gc_index with ZERO tombstones (ADVICE r3: the chunk-rewrite
    kernel indexed an empty tombstone array and crashed) — a legitimate
    run that only consolidates delta fragmentation must pass chunks
    through unchanged and stay rank-identical."""
    from ela_lib_spark.streaming.incremental import gc_index

    idx_dir = os.path.join(tmp_root, "gc_empty_idx")
    pages = synth_pages_df(spark, 300).cache()
    base = pages.limit(250).cache()
    extra = pages.subtract(base).cache()
    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2, use_html=True)
    apply_delta_batch(extra, 0, idx_dir, n_buckets=4)  # append-only

    res = gc_index(spark, idx_dir, n_shards=2)
    assert res["purged"] == 0 and res["n_docs"] == 300
    assert not os.path.exists(os.path.join(idx_dir, "delta_chunks"))

    idx = load_index(spark, idx_dir)
    toks = {
        r.doc_id: list(r.tokens)
        for r in ids_with_tokens(base, 4, use_html=True)
        .select("doc_id", "tokens").collect()
    }
    off = DELTA_BUCKET_BASE
    for r in (
        ids_with_tokens(extra, 4)
        .withColumn("doc_id", F.col("doc_id") + (off << DOC_BITS))
        .select("doc_id", "tokens").collect()
    ):
        toks[r.doc_id] = list(r.tokens)
    assert len(toks) == 300
    _check_rank_identity(idx, toks)


def test_compact_mode_validation(spark, tmp_root):
    """Unknown modes raise BEFORE any work; 'gc' delegates to gc_index
    (ADVICE r3: a typo used to silently run a destructive major)."""
    import pytest

    idx_dir = os.path.join(tmp_root, "modeval_idx")
    build_index(spark, synth_pages_df(spark, 100), idx_dir,
                n_buckets=4, n_shards=2)
    with pytest.raises(ValueError, match="auto/minor/major/gc"):
        compact_index(spark, idx_dir, mode="gcc")
    res = compact_index(spark, idx_dir, n_shards=2, mode="gc")
    assert res["mode"] == "gc" and res["purged"] == 0
    assert wand_topk(load_index(spark, idx_dir),
                     ["term0000"], "OR", 10).count() == 10


def test_upsert_intra_batch_last_write_deterministic(spark, tmp_root):
    """Two versions of one url inside a single upsert micro-batch
    resolve to the max-warc_ts row regardless of input row order
    (ADVICE r3: dropDuplicates kept an arbitrary one)."""
    import datetime

    from ela_lib_spark.schemas import WEB_PAGES

    pages = synth_pages_df(spark, 60).cache()
    url = pages.select("url").first().url
    t1 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    t2 = datetime.datetime(2026, 1, 2, 0, 0, 0)
    older = (url, t1, None, "zzolderver zzolderver", "en")
    newer = (url, t2, None, "zznewerver zznewerver", "en")

    for tag, rows in (("fwd", [older, newer]), ("rev", [newer, older])):
        idx_dir = os.path.join(tmp_root, f"upsert_det_{tag}")
        build_index(spark, pages, idx_dir, n_buckets=4, n_shards=2)
        batch = spark.createDataFrame(rows, WEB_PAGES).repartition(2)
        apply_delta_batch(batch, 0, idx_dir, n_buckets=4, mode="upsert")
        compact_index(spark, idx_dir, n_shards=2)
        idx = load_index(spark, idx_dir)
        assert wand_topk(idx, ["zznewerver"], "OR", 10).count() == 1, tag
        assert wand_topk(idx, ["zzolderver"], "OR", 10).count() == 0, tag


def test_control_tables_flip_with_manifest(spark, tmp_root):
    """ADVICE r3: control tables are written to VERSIONED dirs and
    become visible only with the manifest flip. A simulated crash after
    the new tables land but before the flip leaves load_index on the
    OLD stats — never a manifest/table contradiction."""
    from ela_lib_spark.index.build import (
        METRICS_TERM_ID,
        chunks_path,
        read_manifest,
    )
    from ela_lib_spark.streaming.incremental import (
        _refresh_control_tables,
        read_delta_postings,
    )

    idx_dir = os.path.join(tmp_root, "ctrlflip_idx")
    pages = synth_pages_df(spark, 250).cache()
    base = pages.limit(200).cache()
    extra = pages.subtract(base).cache()
    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2)
    apply_delta_batch(extra, 0, idx_dir, n_buckets=4)

    # simulate the compaction crash window: control tables written,
    # manifest NOT flipped
    all_chunks = spark.read.parquet(chunks_path(idx_dir)).unionByName(
        read_delta_postings(spark, idx_dir).drop("epoch")
    )
    metrics = all_chunks.filter(F.col("term_id") == METRICS_TERM_ID)
    _refresh_control_tables(spark, idx_dir, metrics, "crashed-snap")

    idx = load_index(spark, idx_dir)
    assert idx["corpus_stats"].first().n_docs == 200  # still the OLD stats
    assert idx["manifest"]["n_docs"] == 200

    # the real compaction flips manifest + control tables together and
    # cleans up the superseded dirs
    res = compact_index(spark, idx_dir, n_shards=2)
    assert res["n_docs"] == 250
    m = read_manifest(idx_dir)
    assert m["ledger_dir"].startswith("ledger-compact-")
    assert m["corpus_stats_dir"].startswith("corpus_stats-compact-")
    assert not os.path.exists(os.path.join(idx_dir, "ledger"))
    assert not os.path.exists(os.path.join(idx_dir, "corpus_stats"))
    idx2 = load_index(spark, idx_dir)
    assert idx2["corpus_stats"].first().n_docs == 250
    assert idx2["ledger"].count() > 0


def test_serving_cache_revalidates_on_snapshot_flip(spark, tmp_root):
    """VERDICT r3 #4: a pinned serving session (prepare_serving) must
    not silently serve a superseded snapshot after a compaction/GC
    flips the manifest — wand_topk revalidates the pin per query and
    reloads. GC even deletes the old postings dirs, so without the
    reload the pinned scan would read deleted files."""
    from ela_lib_spark.query.wand import prepare_serving
    from ela_lib_spark.streaming.incremental import gc_index

    idx_dir = os.path.join(tmp_root, "servpin_idx")
    pages = synth_pages_df(spark, 300).cache()
    base = pages.limit(250).cache()
    build_index(spark, base, idx_dir, n_buckets=4, n_shards=2)

    idx = prepare_serving(load_index(spark, idx_dir))
    assert wand_topk(idx, ["term0000"], "OR", 10).count() == 10
    assert wand_topk(idx, ["zzflipped"], "OR", 10).count() == 0
    pinned_before = idx["serving_snapshot_id"]

    # upsert 40 re-crawls with changed text UNDER the live session,
    # then compact (manifest flip #1)
    changed = base.limit(40).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzflipped"))
    )
    apply_delta_batch(changed, 0, idx_dir, n_buckets=4, mode="upsert")
    compact_index(spark, idx_dir, n_shards=2)

    assert wand_topk(idx, ["zzflipped"], "OR", 100).count() == 40
    assert idx["serving_snapshot_id"] != pinned_before
    assert idx["manifest"]["n_docs"] == 250  # 250 - 40 + 40
    # AND path (literal envelope prefilter) also serves the new snapshot
    got = {r.doc_id for r in
           wand_topk(idx, ["zzflipped", "term0000"], "AND", 100).collect()}
    old_ids = set(int(x) for x in load_index(spark, idx_dir)["deleted_ids"])
    assert not (got & old_ids)

    # GC (manifest flip #2, old postings dirs DELETED) — pinned session
    # keeps answering correctly
    gc_index(spark, idx_dir, n_shards=2)
    assert wand_topk(idx, ["zzflipped"], "OR", 100).count() == 40
    assert wand_topk(idx, ["term0000"], "OR", 10).count() == 10

    # time-traveled serving stays FROZEN at its snapshot: a later flip
    # must not be picked up
    gc_snap = load_index(spark, idx_dir)["manifest"]["snapshot_id"]
    tt = prepare_serving(load_index(spark, idx_dir, snapshot_id=gc_snap))
    extra = pages.subtract(base).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzpostgc"))
    )
    apply_delta_batch(extra, 7, idx_dir, n_buckets=4, mode="upsert")
    compact_index(spark, idx_dir, n_shards=2)
    assert wand_topk(idx, ["zzpostgc"], "OR", 100).count() == 50  # live
    assert wand_topk(tt, ["zzpostgc"], "OR", 100).count() == 0  # frozen


def test_maintenance_lock_excludes_and_survives_crash(spark, tmp_root):
    """Concurrent compaction/GC is excluded by the maintenance lock
    (two minors would double-count the same epochs); a lock FILE left
    by a crashed process carries no kernel flock, so crashes never
    wedge the index — no liveness heuristic, no steal protocol."""
    import pytest

    from ela_lib_spark.errors import MaintenanceLockError
    from ela_lib_spark.streaming.incremental import _maintenance_lock

    idx_dir = os.path.join(tmp_root, "lock_idx")
    pages = synth_pages_df(spark, 120).cache()
    build_index(spark, pages.limit(100), idx_dir, n_buckets=4, n_shards=2)
    apply_delta_batch(pages.subtract(pages.limit(100)), 0, idx_dir,
                      n_buckets=4)

    lock = os.path.join(idx_dir, ".maintenance.lock")
    holder = _maintenance_lock(idx_dir).__enter__()  # live holder
    try:
        with pytest.raises(MaintenanceLockError, match="already running"):
            compact_index(spark, idx_dir, n_shards=2)
    finally:
        holder.__exit__(None, None, None)

    # crashed holder: the file survives but the kernel lock died with
    # the process — the next maintenance acquires without ceremony
    with open(lock, "w") as f:
        f.write("999999999 -\n")
    res = compact_index(spark, idx_dir, n_shards=2)
    assert res["mode"] == "minor" and res["compacted_epochs"] == 1
    assert not os.path.exists(lock)  # released after success


def test_maintenance_lock_unlink_race_single_winner(tmp_root):
    """The flock design's one subtlety: an acquirer may flock an inode
    that a releasing holder already unlinked while a rival recreates
    the path. The inode re-verify must force a retry on the fresh path
    — a winner on the orphaned inode can never coexist with a winner
    on the recreated file."""
    from ela_lib_spark.streaming.incremental import _maintenance_lock

    idx_dir = os.path.join(tmp_root, "race_idx")
    os.makedirs(idx_dir, exist_ok=True)
    lock_path = os.path.join(idx_dir, ".maintenance.lock")

    # Simulate the interleave deterministically: open an fd to the
    # current inode, then have a holder cycle acquire→release (which
    # unlinks that inode) before we flock our stale fd.
    with open(lock_path, "w") as f:
        f.write("old\n")
    import fcntl

    stale_fd = os.open(lock_path, os.O_RDWR)
    with _maintenance_lock(idx_dir):
        pass  # release unlinks the path (different inode now gone)
    # flock on the orphaned inode SUCCEEDS — exactly the hazard...
    fcntl.flock(stale_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        # ...but a real acquirer opens the PATH, creating a fresh
        # inode, so both can hold their flocks only on DIFFERENT
        # inodes; the inode re-verify is what rejects the stale one.
        with _maintenance_lock(idx_dir) as lk:
            assert os.stat(lock_path).st_ino == os.fstat(lk.fd).st_ino
            assert os.fstat(stale_fd).st_ino != os.fstat(lk.fd).st_ino
    finally:
        os.close(stale_fd)
    assert not os.path.exists(lock_path)


def test_maintenance_lock_reentry_fails_loudly(tmp_root):
    """flock conflicts even between two fds of one process: accidental
    re-entrant maintenance on the same index dir fails with the typed
    error instead of silently double-running."""
    import pytest

    from ela_lib_spark.errors import MaintenanceLockError
    from ela_lib_spark.streaming.incremental import _maintenance_lock

    idx_dir = os.path.join(tmp_root, "reent_idx")
    os.makedirs(idx_dir, exist_ok=True)
    with _maintenance_lock(idx_dir):
        with pytest.raises(MaintenanceLockError, match="already running"):
            _maintenance_lock(idx_dir).__enter__()


def test_maintenance_lock_exit_spares_foreign_lock(tmp_root):
    """__exit__ ownership check: a holder whose lock was stolen (it
    was judged dead) must NOT delete the new writer's lock."""
    from ela_lib_spark.streaming.incremental import _maintenance_lock

    idx_dir = os.path.join(tmp_root, "exit_idx")
    os.makedirs(idx_dir, exist_ok=True)
    lock_path = os.path.join(idx_dir, ".maintenance.lock")
    lk = _maintenance_lock(idx_dir).__enter__()
    # a stealer replaces our lock with its own (new inode)
    os.remove(lock_path)
    with open(lock_path, "w") as f:
        f.write(f"{os.getpid()} -\n")
    foreign_ino = os.stat(lock_path).st_ino
    lk.__exit__(None, None, None)
    assert os.path.exists(lock_path)
    assert os.stat(lock_path).st_ino == foreign_ino
    # ...and a normal acquire→release cycle still cleans up after itself
    os.remove(lock_path)
    with _maintenance_lock(idx_dir):
        assert os.path.exists(lock_path)
    assert not os.path.exists(lock_path)


def test_maintenance_lock_multiprocess_mutual_exclusion(tmp_root):
    """Real contention: 6 forked processes each do read→increment→write
    on an unprotected counter file under the lock. Any mutual-exclusion
    violation (two holders at once) loses updates; the final count
    proves every critical section ran alone. Also exercises acquire
    retry under churn (each iteration unlinks/recreates the lock file,
    hammering the unlink-vs-open inode re-verify)."""
    import multiprocessing as mp
    import time as _t

    from ela_lib_spark.errors import MaintenanceLockError
    from ela_lib_spark.streaming.incremental import _maintenance_lock

    idx_dir = os.path.join(tmp_root, "mp_lock_idx")
    os.makedirs(idx_dir, exist_ok=True)
    counter = os.path.join(idx_dir, "counter")
    with open(counter, "w") as f:
        f.write("0")
    n_procs, iters = 6, 15

    def worker():
        for _ in range(iters):
            while True:
                try:
                    with _maintenance_lock(idx_dir):
                        with open(counter) as f:
                            v = int(f.read())
                        _t.sleep(0.001)  # widen any race window
                        with open(counter, "w") as f:
                            f.write(str(v + 1))
                    break
                except MaintenanceLockError:
                    _t.sleep(0.002)

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=worker) for _ in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    with open(counter) as f:
        assert int(f.read()) == n_procs * iters
