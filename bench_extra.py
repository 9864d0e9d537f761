"""Round-6 optimization measurement harness (bench.py is FROZEN for
driver measurement; this file holds the extra instrumentation the
optimization guide §1 asks for: per-query repeat timings, noop-sink
isolation, and `.explain("formatted")` plan capture).

Usage:
    python bench_extra.py queries [name ...]   # time headline queries
    python bench_extra.py plans  [name ...]    # dump plans to plans/r06
    python bench_extra.py build               # time the index build
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPS (default 3),
BENCH_EXTRA_SUFFIX (plan file suffix, default "before").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
SUFFIX = os.environ.get("BENCH_EXTRA_SUFFIX", "before")

HEADLINE = [
    "q_bm25_flat", "q_term_df", "q_tpch_q1", "q_nation_revenue",
    "q_diff_classify", "q_dedup_exact", "q_minhash_dedup",
    "q_simhash_pairs", "q_cosine_topk", "q_match_and", "q_events_hourly",
    "q_topk_per_group",
]


def _new_spark():
    from ela_lib_spark.session import get_spark

    return get_spark(
        f"bench-extra-{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS), driver_memory="48g",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )


def _warm(spark):
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    entrymod._flat_corpus(spark, SF_DIR)
    from ela_lib_spark.operators.dedup import dedup_minhash_lsh

    dedup_minhash_lsh(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .limit(50), key="doc_id", text_col="text", threshold=0.5
    ).count()


def cmd_queries(names):
    import __spark_entry__ as entrymod

    spark = _new_spark()
    _warm(spark)
    qs = entrymod.queries()
    out = {}
    for name in names or HEADLINE:
        samples = []
        for _ in range(REPS):
            t0 = time.monotonic()
            n = qs[name](spark, SF_DIR).count()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples, "rows": n}
        print(f"# {name}: min={min(samples)} {samples} ({n} rows)",
              file=sys.stderr)
    print(json.dumps({"sf": SF_DIR, "queries": out}))
    spark.stop()


def cmd_plans(names):
    import __spark_entry__ as entrymod

    spark = _new_spark()
    _warm(spark)
    qs = entrymod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names or HEADLINE:
        df = qs[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{SUFFIX}.txt", "w") as f:
            f.write(p)
        print(f"# wrote plans/r06/{name}_{SUFFIX}.txt", file=sys.stderr)
    spark.stop()


def cmd_build():
    from ela_lib_spark.index.build import build_index
    from ela_lib_spark.sources.synth import write_web_pages

    n_docs = int(os.environ.get("BENCH_N_DOCS", "120000"))
    work = tempfile.mkdtemp(prefix="ela_bx_")
    pages_path = os.path.join(work, "pages")
    spark = _new_spark()
    write_web_pages(spark, n_docs, pages_path)
    pages = spark.read.parquet(pages_path)
    n_buckets, n_shards = 16 * CPUS, max(CPUS // 4, 4)
    reps = []
    for i in range(REPS):
        out = os.path.join(work, f"idx{i}")
        t0 = time.monotonic()
        m = build_index(spark, pages, out, n_buckets=n_buckets,
                        n_shards=n_shards, use_html=True)
        secs = time.monotonic() - t0
        reps.append({"secs": round(secs, 2),
                     "docs_per_sec": round(n_docs / secs, 1),
                     "stage_secs": m["stage_secs"]})
        print(f"# build rep{i}: {reps[-1]}", file=sys.stderr)
    print(json.dumps({"n_docs": n_docs, "reps": reps}))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if cmd == "queries":
        cmd_queries(rest)
    elif cmd == "plans":
        cmd_plans(rest)
    elif cmd == "build":
        cmd_build()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
