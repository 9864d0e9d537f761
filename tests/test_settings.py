"""Settings/mapping translation (D2/D3) + template resolution (S18) +
catalog listing (S9) — semantics mirrored from
/root/reference/pkg/es/es5settings.go:72-145 and
service/task/migrator.go:590-635."""

import os

from pyspark.sql import types as T

from ela_lib_spark.operators.taskrunner import list_indexes, resolve_template_index
from ela_lib_spark.sources.settings import (
    import_index_merged,
    merge_struct_types,
    merge_type_mappings,
    widen_date_formats,
)


def test_merge_type_mappings_precedence_and_source_enabled():
    unwrapped = {
        "big_type": {"properties": {"a": {"type": "keyword"},
                                    "b": {"type": "long"},
                                    "c": {"type": "text"}}},
        "small_type": {"properties": {"a": {"type": "text"}}},
        "disabled": {"_source": {"enabled": False},
                     "properties": {"z": {"type": "keyword"}}},
        "no_props": {"dynamic": "strict"},
    }
    merged = merge_type_mappings(unwrapped)["properties"]
    # all enabled types' fields present; disabled/propless skipped
    assert set(merged) == {"a", "b", "c"}
    # descending-size merge order → the later (smaller) type overwrites
    # on conflict, exactly like the Go loop (es5settings.go:92-97)
    assert merged["a"] == {"type": "text"}


def test_widen_date_formats():
    props = {"properties": {
        "created": {"type": "date", "format": "yyyy-MM-dd HH:mm:ss"},
        "updated": {"type": "date", "format": "epoch_second"},
        "name": {"type": "keyword"},
    }}
    out = widen_date_formats(props)["properties"]
    assert out["created"]["format"] == "yyyy-MM-dd HH:mm:ss||epoch_millis"
    assert out["updated"]["format"] == "epoch_second"  # only the exact format widens
    assert "format" not in out["name"]


def test_merge_struct_types_widening():
    s1 = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("extra", T.DoubleType()),
    ])
    s2 = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ])
    merged = merge_struct_types([s1, s2])
    by_name = {f.name: f.dataType for f in merged.fields}
    assert isinstance(by_name["ts"], T.TimestampType)  # string widens to ts
    assert isinstance(by_name["k"], T.LongType)
    assert isinstance(by_name["extra"], T.DoubleType)


def test_import_merged_divergent_exports(spark, tmp_root):
    from ela_lib_spark.sources.ndjson import export_index

    a = spark.createDataFrame(
        [(1, "one", 1.5), (2, "two", 2.5)], "id long, name string, score double"
    )
    b = spark.createDataFrame(
        [(3, "three", "de"), (4, "four", "fr")], "id long, name string, lang string"
    )
    da, db = os.path.join(tmp_root, "exp_a"), os.path.join(tmp_root, "exp_b")
    export_index(a, da, "a", key="id")
    export_index(b, db, "b", key="id")

    out, schema = import_index_merged(spark, [da, db])
    names = [f.name for f in schema.fields]
    assert set(names) == {"id", "name", "score", "lang"}
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].score == 1.5 and rows[1].lang is None
    assert rows[3].lang == "de" and rows[3].score is None


def test_resolve_template_index_and_list(tmp_root, spark):
    names = ["logs_2024_01", "logs_2024_02", "metrics_01"]
    assert resolve_template_index(["logs_*"], names) == "logs_2024_01"
    assert resolve_template_index(["nope_*", "metrics_*"], names) == "metrics_01"
    assert resolve_template_index(["x*"], names) is None

    warehouse = os.path.join(tmp_root, "warehouse")
    os.makedirs(os.path.join(warehouse, "not_a_table"), exist_ok=True)
    spark.range(3).write.mode("overwrite").parquet(os.path.join(warehouse, "t1"))
    spark.range(2).write.mode("overwrite").parquet(os.path.join(warehouse, "t2"))
    assert list_indexes(warehouse) == ["t1", "t2"]


def test_create_table_like_stamps_schema(tmp_root, spark):
    """S16: create-index settings analog — empty dataset with the
    source's exact schema (es5.go:319-351 CreateIndex parity)."""
    from ela_lib_spark.sources.ndjson import create_table_like

    src = spark.createDataFrame(
        [(1, "a", 1.5)], "id long, name string, score double"
    )
    path = os.path.join(tmp_root, "stamped")
    create_table_like(spark, src, path)
    out = spark.read.parquet(path)
    assert out.schema == src.schema
    assert out.count() == 0


def test_resolve_template_glob_semantics():
    """Review r2: glob matching must not treat '.' as a regex wildcard
    and must not crash on '['."""
    names = ["logsXv1-2024", "logs.v1-2024", "a[b"]
    assert resolve_template_index(["logs.v1*"], names) == "logs.v1-2024"
    assert resolve_template_index(["logs.v1*"], ["logsXv1-2024"]) is None
    assert resolve_template_index(["a[b"], names) == "a[b"  # no re.error
