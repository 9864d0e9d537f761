import os

from pyspark.sql import functions as F

from ela_lib_spark.operators.taskrunner import TaskRunner, filter_tables
from ela_lib_spark.schemas import WEB_PAGES
from ela_lib_spark.sources.synth import synth_pages_df
from ela_lib_spark.streaming.dual_write import (
    dual_write_stream,
    read_sink,
    upsert_parquet,
    verify_replicas,
)


def test_dual_write_at_least_once(spark, tmp_root):
    incoming = os.path.join(tmp_root, "dw_in")
    master = os.path.join(tmp_root, "dw_master")
    slave = os.path.join(tmp_root, "dw_slave")
    ckpt = os.path.join(tmp_root, "dw_ckpt")
    os.makedirs(incoming, exist_ok=True)

    pages = synth_pages_df(spark, 300).cache()
    pages.limit(200).write.mode("overwrite").parquet(os.path.join(incoming, "f1"))

    q = dual_write_stream(spark, incoming + "/*", master, slave, ckpt, WEB_PAGES)
    q.processAllAvailable()
    # overlapping second delivery (100 duplicates + 100 new) → upsert
    pages.write.mode("overwrite").parquet(os.path.join(incoming, "f2"))
    q.processAllAvailable()
    q.stop()

    m = read_sink(spark, master)
    s = read_sink(spark, slave)
    assert m.count() == 300  # no duplicate keys despite replay overlap
    res = verify_replicas(m, s, key="url")
    assert res["same"] == 300 and res["total"] == 300


def _bucket_state(path):
    state = {}
    for root, _dirs, files in os.walk(path):
        if "_kb=" not in root:
            continue
        kb = root.split("_kb=")[1].split("/")[0]
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                with open(os.path.join(root, fn), "rb") as f:
                    state.setdefault(kb, []).append((fn, f.read()))
    return state


def test_upsert_rewrites_only_touched_buckets(spark, tmp_root):
    sink = os.path.join(tmp_root, "dw_bucketed")
    pages = synth_pages_df(spark, 200).cache()
    upsert_parquet(pages, sink, key="url", n_buckets=8)
    before = _bucket_state(sink)
    assert len(before) > 4  # keys spread across buckets

    # epoch 2: a single-row batch touches exactly one bucket
    # (deterministic row — limit(1) can pick different rows per re-execution)
    some_url = pages.select("url").orderBy("url").first()[0]
    one = pages.filter(F.col("url") == some_url).withColumn("lang", F.lit("xx"))
    kb = one.select(
        F.pmod(F.xxhash64(F.col("url").cast("string")), F.lit(8)).cast("int")
    ).first()[0]
    upsert_parquet(one, sink, key="url", n_buckets=8)
    after = _bucket_state(sink)

    assert after[str(kb)] != before[str(kb)]  # touched bucket rewritten
    for b in before:
        if b != str(kb):
            # untouched buckets byte-identical (same files, same bytes)
            assert after[b] == before[b], b
    # and the upsert applied: exactly one row mutated, count unchanged
    out = read_sink(spark, sink)
    assert out.count() == 200
    assert out.filter(F.col("lang") == "xx").count() == 1


def test_task_runner_collects_errors_and_orders():
    def ok():
        return 42

    def boom():
        raise ValueError("nope")

    r = TaskRunner(parallelism=3)
    results = r.run_pairs([("b_ok", ok), ("a_bad", boom), ("c_ok", ok)])
    assert [x.name for x in results] == ["a_bad", "b_ok", "c_ok"]
    assert [x.ok for x in results] == [False, True, True]
    assert results[0].error and "nope" in results[0].error


def test_task_runner_cancel():
    r = TaskRunner(parallelism=1)
    r.cancel()
    results = r.run_pairs([("x", lambda: 1)])
    assert results[0].error == "cancelled"


def test_filter_tables():
    names = ["orders", "orders_v2", ".system", "lineitem", "events"]
    assert filter_tables(names, ["orders*"]) == ["orders", "orders_v2"]
    assert filter_tables(names, ["*"], skip_system=True) == [
        "events", "lineitem", "orders", "orders_v2",
    ]


def test_cli_end_to_end(spark, tmp_root, capsys):
    """O1/G2 e2e: the CLI dispatch path for every reference action,
    in-process (session injected)."""
    import json as json_mod
    import os

    from ela_lib_spark.cli import main

    wh = os.path.join(tmp_root, "cli_wh")
    pages = os.path.join(wh, "pages_a")
    assert main(["synth", pages, "--n-docs", "600"], spark=spark) == 0
    idx = os.path.join(tmp_root, "cli_idx")
    assert main(["build_index", pages, idx, "--use-html",
                 "--n-buckets", "4", "--n-shards", "2"], spark=spark) == 0
    assert main(["query", idx, "term0000", "--mode", "OR", "-k", "3"],
                spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json_mod.loads(ln) for ln in out[-3:]]
    assert len(rows) == 3 and all("doc_id" in r and "score" in r for r in rows)

    tgt = os.path.join(tmp_root, "cli_tgt")
    assert main(["sync", pages, tgt, "--mode", "overwrite"], spark=spark) == 0
    assert main(["compare", pages, tgt, "--key", "url"], spark=spark) == 0
    res = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["same"] == 600 and res["percent_same"] == 100.0

    exp = os.path.join(tmp_root, "cli_exp")
    assert main(["export", pages, exp, "--key", "url"], spark=spark) == 0
    imp = os.path.join(tmp_root, "cli_imp")
    assert main(["import", exp, imp], spark=spark) == 0
    assert spark.read.parquet(imp).count() == 600

    sd = os.path.join(tmp_root, "cli_sd")
    assert main(["sync_diff", pages, imp, sd, "--key", "url"], spark=spark) == 0

    assert main(["history", idx], spark=spark) == 0
    hist = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hist["current"] and hist["history"] == [hist["current"]]

    tpl = os.path.join(tmp_root, "cli_tpl")
    assert main(["create_template", wh, tpl, "pages_*"], spark=spark) == 0

    # delta upsert + compact through the CLI (r3): re-ingest 20 urls
    # with changed text, then compact and re-query
    from pyspark.sql import functions as F

    batch = os.path.join(tmp_root, "cli_batch")
    spark.read.parquet(pages).limit(20).withColumn(
        "text", F.concat(F.col("text"), F.lit(" cliupdated"))
    ).write.mode("overwrite").parquet(batch)
    assert main(["delta", batch, idx, "0", "--mode", "upsert",
                 "--n-buckets", "4"], spark=spark) == 0
    assert main(["compact", idx, "--n-shards", "2"], spark=spark) == 0
    res = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["mode"] == "minor" and res["n_docs"] == 600
    assert main(["query", idx, "cliupdated", "--mode", "OR", "-k", "25"],
                spark=spark) == 0
    out = [json_mod.loads(ln)
           for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(out) == 20
    t = spark.read.parquet(tpl)
    assert t.count() == 0 and set(t.columns) == set(
        spark.read.parquet(pages).columns
    )
    assert main(["create_template", wh, tpl, "zzz_*"], spark=spark) == 1
