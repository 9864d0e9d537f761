"""Index integrity validation — the operational `fsck` for a
published index.

The reference relies on Elasticsearch's own shard checks; a
from-scratch engine needs an explicit one. Checks the invariants the
build/maintenance lifecycle promises (see index/build.py and
streaming/incremental.py docstrings):

1. manifest present with required keys; every referenced data dir
   exists and is readable;
2. control tables agree with the manifest (corpus_stats == manifest
   n_docs/avg_dl; ledger totals == corpus_stats) — the contradiction
   the r4 versioned-control-table flip makes impossible, verified;
3. the live doc-stats surface has exactly n_docs rows and unique
   doc_ids;
4. every tombstone resolves to a known doc id (a dangling tombstone
   would silently no-op at GC);
5. the current snapshot_id is archived in the snapshot log;
6. `deep=True`: decode every posting block's streams and re-check the
   decoder contract (n_docs > 0, first <= last id, ids strictly
   ascending within the block, block length matches metadata) plus
   df > 0 — a distributed full-scan pass, O(postings), for use after
   suspected corruption rather than per publish.

Returns {"ok": bool, "checks": {name: {"ok", "detail"}}}; CLI
`validate` exits non-zero when any check fails.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _check(out: dict, name: str, ok: bool, detail: str = "") -> None:
    out[name] = {"ok": bool(ok), "detail": detail}


def validate_index(spark: SparkSession, index_dir: str,
                   deep: bool = False) -> dict:
    from ela_lib_spark.index.build import (
        corpus_stats_path,
        docs_dir_path,
        ledger_path,
        read_manifest,
    )

    checks: dict = {}
    manifest = read_manifest(index_dir)
    if manifest is None:
        _check(checks, "manifest", False, f"no manifest.json in {index_dir!r}")
        return {"ok": False, "checks": checks}
    required = ("postings_dir", "chunks_dir", "n_buckets", "n_shards",
                "n_docs", "avg_dl", "codec", "snapshot_id")
    missing = [k for k in required if k not in manifest]
    _check(checks, "manifest", not missing,
           f"missing keys: {missing}" if missing else "all required keys")
    if missing:
        # the remaining checks dereference these keys — report the
        # corruption instead of crashing on it (review r4)
        return {"ok": False, "checks": checks}

    # 1. referenced dirs exist
    dirs = {
        "postings": os.path.join(index_dir, manifest["postings_dir"]),
        "chunks": os.path.join(index_dir, manifest["chunks_dir"]),
        "docs": docs_dir_path(index_dir, manifest),
        "ledger": ledger_path(index_dir, manifest),
        "corpus_stats": corpus_stats_path(index_dir, manifest),
    }
    for t in manifest.get("tiers", []):
        dirs[f"tier:{t['postings_dir']}"] = os.path.join(
            index_dir, t["postings_dir"])
    gone = [k for k, p in dirs.items() if not os.path.exists(p)]
    _check(checks, "data_dirs", not gone,
           f"missing: {gone}" if gone else f"{len(dirs)} dirs present")
    if gone:
        return {"ok": False, "checks": checks}

    # every remaining check reads datasets that can themselves be
    # corrupt (truncated parquet, empty dirs): an unreadable dataset is
    # a FINDING for an fsck tool, never a crash (review r4)
    try:
        _dataset_checks(spark, index_dir, manifest, dirs, checks, deep)
    except Exception as e:
        _check(checks, "datasets_readable", False,
               f"{type(e).__name__}: {str(e)[:300]}")
    return {"ok": all(c["ok"] for c in checks.values()), "checks": checks}


def _dataset_checks(spark, index_dir: str, manifest: dict, dirs: dict,
                    checks: dict, deep: bool) -> None:
    from ela_lib_spark.index.build import (
        delta_doc_stats_dirs,
        read_tombstones,
    )

    # 2. control tables vs manifest
    cs = spark.read.parquet(dirs["corpus_stats"]).first()
    if cs is None:  # dir exists but holds zero rows — corrupt table
        _check(checks, "corpus_stats_vs_manifest", False,
               "corpus_stats table is empty")
        return
    ok_cs = (int(cs.n_docs) == int(manifest["n_docs"])
             and abs(float(cs.avg_dl) - float(manifest["avg_dl"])) < 1e-6)
    _check(checks, "corpus_stats_vs_manifest", ok_cs,
           f"table ({cs.n_docs}, {cs.avg_dl:.4f}) vs manifest "
           f"({manifest['n_docs']}, {manifest['avg_dl']:.4f})")
    led = spark.read.parquet(dirs["ledger"])
    led_docs = led.agg(F.sum("n_docs")).first()[0] or 0
    _check(checks, "ledger_vs_corpus_stats",
           int(led_docs) == int(cs.n_docs),
           f"ledger Σn_docs={led_docs} vs corpus_stats={cs.n_docs}")

    # 3. doc-stats surface: n rows + unique ids (bulk + delta − tombs)
    docs = spark.read.parquet(dirs["docs"]).select("doc_id")
    for d in delta_doc_stats_dirs(index_dir, manifest):
        docs = docs.unionByName(
            spark.read.option("basePath", d).parquet(d).select("doc_id"))
    tomb = read_tombstones(spark, index_dir)
    live = docs.join(tomb, "doc_id", "left_anti") if tomb is not None else docs
    agg = live.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
    ).first()
    # manifest n_docs refreshes at compaction; delta/delete epochs not
    # yet covered by a publish legitimately shift the live count — an
    # expected pre-compaction state, not corruption
    from ela_lib_spark.index.build import delete_epochs_on_disk
    from ela_lib_spark.streaming.incremental import delta_epochs_on_disk

    covered = set(manifest.get("base_epochs", []))
    for t in manifest.get("tiers", []):
        covered.update(t["epochs"])
    pending = (set(delta_epochs_on_disk(index_dir)) - covered) or (
        set(delete_epochs_on_disk(index_dir))
        - set(manifest.get("delete_epochs", []))
    )
    if pending:
        _check(checks, "doc_stats_count", True,
               f"uncompacted epochs {sorted(pending)}: live rows={agg.n} "
               f"vs manifest n_docs={manifest['n_docs']} (refreshes at "
               "next compaction — skipped)")
    else:
        _check(checks, "doc_stats_count",
               int(agg.n) == int(manifest["n_docs"]),
               f"live doc rows={agg.n} vs manifest "
               f"n_docs={manifest['n_docs']}")
    _check(checks, "doc_ids_unique", int(agg.n) == int(agg.nd),
           f"rows={agg.n} distinct={agg.nd}")

    # 4. tombstones resolve to known docs
    if tomb is not None:
        dangling = tomb.join(docs, "doc_id", "left_anti").count()
        _check(checks, "tombstones_resolve", dangling == 0,
               f"{dangling} dangling tombstones")
    else:
        _check(checks, "tombstones_resolve", True, "no delete log")

    # 5. snapshot archive
    snap = manifest.get("snapshot_id")
    spath = os.path.join(index_dir, "snapshots", f"{snap}.json")
    _check(checks, "snapshot_archived", os.path.exists(spath), str(snap))

    if deep:
        checks.update(_deep_postings_check(spark, dirs["postings"],
                                           manifest, index_dir))


def _deep_postings_check(spark, postings_dir: str, manifest: dict,
                         index_dir: str) -> dict:
    """Distributed block-decode audit: every block must satisfy the
    decoder contract. Pure map over the postings (one pass, no
    shuffle); returns aggregate violation counts."""
    import pandas as pd

    codec = manifest["codec"]

    def fn(it):
        from ela_lib_spark.index.codecs import decode_block

        bad_decode = bad_order = bad_meta = n_blocks = 0
        for pdf in it:
            for r in pdf.itertuples(index=False):
                n_blocks += 1
                if r.n_docs <= 0 or r.first_doc_id > r.last_doc_id or r.df <= 0:
                    bad_meta += 1
                    continue
                try:
                    ids, tfs, dls = decode_block(
                        r.doc_ids_delta, r.tfs, r.dls, int(r.n_docs),
                        int(r.first_doc_id), codec)
                except Exception:
                    bad_decode += 1
                    continue
                if (len(ids) != r.n_docs or ids[0] != r.first_doc_id
                        or ids[-1] != r.last_doc_id
                        or (len(ids) > 1 and not (ids[1:] > ids[:-1]).all())
                        or (tfs <= 0).any() or (dls < 0).any()):
                    bad_order += 1
        yield pd.DataFrame({"n_blocks": [n_blocks], "bad_meta": [bad_meta],
                            "bad_decode": [bad_decode],
                            "bad_order": [bad_order]})

    postings = spark.read.parquet(postings_dir)
    for t in manifest.get("tiers", []):
        postings = postings.unionByName(
            spark.read.parquet(os.path.join(index_dir, t["postings_dir"])))
    tot = (
        postings.mapInPandas(
            fn, "n_blocks long, bad_meta long, bad_decode long, bad_order long"
        ).agg(F.sum("n_blocks"), F.sum("bad_meta"), F.sum("bad_decode"),
              F.sum("bad_order")).first()
    )
    out: dict = {}
    _check(out, "deep_block_decode",
           (tot[1] or 0) == 0 and (tot[2] or 0) == 0 and (tot[3] or 0) == 0,
           f"{tot[0]} blocks: bad_meta={tot[1]} bad_decode={tot[2]} "
           f"bad_order={tot[3]}")
    return out
