import os

from pyspark.sql import functions as F

from ela_lib_spark.operators.taskrunner import TaskRunner, filter_tables
from ela_lib_spark.schemas import WEB_PAGES
from ela_lib_spark.sources.synth import synth_pages_df
from ela_lib_spark.streaming.dual_write import dual_write_stream, verify_replicas


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

    m = spark.read.parquet(master)
    s = spark.read.parquet(slave)
    assert m.count() == 300  # no duplicate keys despite replay overlap
    res = verify_replicas(m, s, key="url")
    assert res["same"] == 300 and res["total"] == 300


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
