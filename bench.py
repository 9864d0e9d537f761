"""Benchmark harness (driver contract: prints ONE JSON line).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

1. headline engine queries over the driver testdata tables,
2. inverted-index build throughput (docs/sec) over a deterministic
   synthetic web_pages corpus (seed=42 — sources/synth.py),
3. the same build at two parallelism levels (N and 4N cores, same
   input) → scaling efficiency = (T_N / T_4N) / 4, the sandbox
   evidence for the north rule's two-cluster-size criterion,
4. block-max WAND query latency (p50/p95 over the reference query set).

Writes BENCH.md with the scaling table and prints the JSON line last.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# large enough that per-stage compute dominates Spark's fixed job
# overhead (~5-8s) — required for a meaningful scaling-efficiency number —
# while keeping the 3-build bench run within a ~12-minute budget
N_DOCS = int(os.environ.get("BENCH_N_DOCS", "120000"))
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"

HEADLINE = [
    "q_bm25_flat",
    "q_term_df",
    "q_tpch_q1",
    "q_nation_revenue",
    "q_diff_classify",
    "q_dedup_exact",
    "q_cosine_topk",
    "q_match_and",
    "q_events_hourly",
    "q_topk_per_group",
]


def _new_spark(cores: int):
    from ela_lib_spark.session import get_spark

    return get_spark(
        f"bench-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(8, cores), driver_memory="48g",
        # small synthetic inputs produce few parquet files; split them so
        # map-stage parallelism isn't capped below the core count
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )


def bench_build(spark, pages_path: str, out_dir: str, n_buckets: int, n_shards: int):
    from ela_lib_spark.index.build import build_index

    pages = spark.read.parquet(pages_path)
    t0 = time.monotonic()
    m = build_index(spark, pages, out_dir, n_buckets=n_buckets,
                    n_shards=n_shards, use_html=True)
    secs = time.monotonic() - t0
    return m, secs


def _cpu_calibration() -> float:
    """Fixed single-core numpy workload (seconds). This sandbox shows
    ±2× wall-clock variance between identical runs (VM CPU steal);
    the calibration lets readers normalize across rounds."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1200, 1200))
    a = a @ a * 1e-3  # warmup (BLAS init dominates the first call)
    t0 = time.monotonic()
    for _ in range(6):
        a = a @ a * 1e-3
        np.sort(a[0])
    return round(time.monotonic() - t0, 3)


def main():
    import __spark_entry__ as entrymod

    work = tempfile.mkdtemp(prefix="ela_bench_")
    result: dict = {"sf": SF_DIR, "unit": "sec"}
    result["cpu_calib_secs"] = _cpu_calibration()
    qsecs: dict[str, float] = {}

    spark = _new_spark(CPUS)

    # 1. headline queries over the driver testdata
    qs = entrymod.queries()
    for name in HEADLINE:
        t0 = time.monotonic()
        n = qs[name](spark, SF_DIR).count()
        qsecs[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {qsecs[name]}s ({n} rows)", file=sys.stderr)

    # 2. index build at full parallelism
    pages_path = os.path.join(work, "pages")
    from ela_lib_spark.sources.synth import reference_queries, write_web_pages

    write_web_pages(spark, N_DOCS, pages_path)
    # n_buckets >> cores: rank-sort parallelism and resume granularity
    # follow n_buckets; identical at both scaling levels
    n_buckets, n_shards = 16 * CPUS, max(CPUS // 4, 4)
    m, secs_full = bench_build(spark, pages_path, os.path.join(work, "idx"),
                               n_buckets, n_shards)
    result["index_build_docs_per_sec"] = round(N_DOCS / secs_full, 1)
    result["index_build_secs"] = round(secs_full, 2)
    result["index_n_docs"] = N_DOCS

    # 3. WAND query latency on the built index
    from ela_lib_spark.index.build import load_index
    from ela_lib_spark.query.wand import wand_topk

    idx = load_index(spark, os.path.join(work, "idx"))
    idx["postings"] = idx["postings"].cache()
    idx["postings"].count()
    lat = []
    for q in reference_queries():
        t0 = time.monotonic()
        wand_topk(idx, q["terms"], q["mode"], 10).collect()
        lat.append(time.monotonic() - t0)
        qsecs[f"wand_{q['name']}"] = round(lat[-1], 3)
    result["wand_p50_sec"] = round(statistics.median(lat), 3)
    result["wand_p95_sec"] = round(sorted(lat)[max(0, int(len(lat) * 0.95) - 1)], 3)
    spark.stop()

    # 4. scaling evidence: same input, N vs 4N cores — each level in a
    # FRESH subprocess (a reused local JVM contaminates timings with
    # leftover heap/threads from the previous context)
    if not SKIP_SCALING:
        import subprocess

        lo, hi = max(2, CPUS // 4), CPUS
        t_by_cores = {}
        me = os.path.dirname(os.path.abspath(__file__))
        for cores in (lo, hi):
            code = (
                "import sys, time, json; sys.path.insert(0, %r)\n"
                "from bench import _new_spark, bench_build\n"
                "s = _new_spark(%d)\n"
                "m, secs = bench_build(s, %r, %r, %d, %d)\n"
                "s.stop()\n"
                "import sys as _s; print('STAGES=' + str(m.get('stage_secs')), file=_s.stderr)\n"
                "print('SECS=' + str(secs))\n"
            ) % (me, cores, pages_path, os.path.join(work, f"idx_{cores}"),
                 n_buckets, n_shards)
            env = dict(os.environ, BENCH_SKIP_SCALING="1")
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                env=env, timeout=1800,
            )
            for ln in out.stderr.splitlines():
                if ln.startswith("STAGES="):
                    print(f"# {cores}c {ln}", file=sys.stderr)
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("SECS=")]
            if not line:
                print(f"# scaling run {cores}c failed: {out.stderr[-500:]}",
                      file=sys.stderr)
                t_by_cores[cores] = float("nan")
                continue
            t_by_cores[cores] = float(line[0][5:])
        eff = (t_by_cores[lo] / t_by_cores[hi]) / (hi / lo)
        result["scaling"] = {
            f"docs_per_sec_{lo}c": round(N_DOCS / t_by_cores[lo], 1),
            f"docs_per_sec_{hi}c": round(N_DOCS / t_by_cores[hi], 1),
            "cores_lo": lo,
            "cores_hi": hi,
            "efficiency": round(eff, 3),
        }
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
            f.write(
                "# BENCH — index-build scaling evidence (north rule)\n\n"
                f"Input: deterministic synthetic web_pages, {N_DOCS} docs "
                f"(seed=42), identical at both parallelism levels.\n\n"
                "| cores | build secs | docs/sec |\n|---|---|---|\n"
                f"| local[{lo}] | {t_by_cores[lo]:.1f} | {N_DOCS / t_by_cores[lo]:.0f} |\n"
                f"| local[{hi}] | {t_by_cores[hi]:.1f} | {N_DOCS / t_by_cores[hi]:.0f} |\n\n"
                f"Scaling efficiency (T_{lo}/T_{hi})/{hi // lo} = **{eff:.3f}** "
                "(target ≥ 0.8).\n\n"
                f"WAND query latency over the reference query set: "
                f"p50 {result['wand_p50_sec']}s, p95 {result['wand_p95_sec']}s.\n\n"
                f"Full-parallelism build: {result['index_build_docs_per_sec']} docs/sec "
                f"({result['index_build_secs']}s for {N_DOCS} docs, "
                f"local[{CPUS}]).\n\n"
                f"Single-core numpy calibration: {result['cpu_calib_secs']}s "
                "(this sandbox VM shows ±2× wall-clock variance between "
                "identical runs — compare rounds via the calibration-"
                "normalized ratio, not raw seconds).\n"
            )

    result["metric"] = "index_build_docs_per_sec"
    result["value"] = result["index_build_docs_per_sec"]
    result["queries"] = qsecs
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
