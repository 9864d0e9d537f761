"""Export/import: NDJSON directory with a `setting.json` manifest —
parity with the reference's IndexFile format
(/root/reference/service/task/migrator.go:1558-1646: manifest
{total, settings, files, es_version, index} + `part-N` data files of
{"_type","_id","_source"} lines, pkg/es/es0.go:49-56).

Spark-first: `df.write.json` produces the splittable part files (the
reference's modulo line-slicing at migrator.go:1408 is Spark's free
input-split parallelism); the manifest is driver-side metadata.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ES_VERSION = "ela-lib-spark-0.1"


def export_index(
    df: DataFrame, out_dir: str, index_name: str,
    key: str = "url", doc_type: str = "_doc", num_files: int | None = None,
    type_mode: str = "add",
) -> dict:
    """Write docs as {"_type","_id","_source":{...}} NDJSON + manifest.

    `type_mode` mirrors the reference's bulk `_type` surgery modes
    (SURVEY T5; ES5→7 migrations drop the type): "add" stamps
    `doc_type` on every line, "keep" passes an existing `_type` column
    through (falling back to `doc_type`), "delete" omits the field
    from the wire entirely.
    """
    src_cols = [c for c in df.columns if c != key and c != "_type"]
    if type_mode == "delete":
        type_cols = []
    elif type_mode == "keep" and "_type" in df.columns:
        type_cols = [F.coalesce(F.col("_type"), F.lit(doc_type)).alias("_type")]
    elif type_mode in ("keep", "add"):
        type_cols = [F.lit(doc_type).alias("_type")]
    else:
        raise ValueError(f"type_mode must be add|keep|delete, got {type_mode!r}")
    docs = df.select(
        *type_cols,
        F.col(key).cast("string").alias("_id"),
        F.struct(*[F.col(c) for c in src_cols]).alias("_source"),
    )
    if num_files:
        docs = docs.repartition(num_files)
    total = df.count()
    data_dir = os.path.join(out_dir, "data")
    docs.write.mode("overwrite").json(data_dir)
    files = sorted(
        os.path.relpath(p, out_dir)
        for p in glob.glob(os.path.join(data_dir, "part-*"))
        if not p.endswith(".crc")
    )
    # the manifest schema describes the round-trippable row shape; a
    # passthrough `_type` column is wire metadata, not row data
    schema_df = df.drop("_type") if "_type" in df.columns else df
    manifest = {
        "total": total,
        "settings": {"schema": schema_df.schema.jsonValue(), "key": key},
        "files": files,
        "es_version": ES_VERSION,
        "index": index_name,
    }
    with open(os.path.join(out_dir, "setting.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def import_index(spark: SparkSession, in_dir: str) -> tuple[DataFrame, dict]:
    """Read an exported directory back into the original shape.

    Schema comes from the manifest (schema-on-read, no inference —
    the reference's settings revival, es0settings.go:39-67)."""
    from pyspark.sql import types as T

    with open(os.path.join(in_dir, "setting.json")) as f:
        manifest = json.load(f)
    schema = T.StructType.fromJson(manifest["settings"]["schema"])
    key = manifest["settings"]["key"]
    src_fields = [f for f in schema.fields if f.name != key]
    wire = T.StructType(
        [
            T.StructField("_type", T.StringType()),
            T.StructField("_id", T.StringType()),
            T.StructField("_source", T.StructType(src_fields)),
        ]
    )
    raw = spark.read.schema(wire).json(os.path.join(in_dir, "data"))
    key_type = schema[key].dataType
    df = raw.select(
        F.col("_id").cast(key_type).alias(key),
        *[F.col(f"_source.{f.name}") for f in src_fields],
    )
    return df.select(*[f.name for f in schema.fields]), manifest


def create_table_like(spark: SparkSession, df: DataFrame, path: str) -> None:
    """`create_template`/`copy_index` settings analog: stamp an empty
    parquet dataset with the source schema (reference:
    pkg/es/es5.go:319-351 CreateIndex; template resolution
    service/task/migrator.go:590-635)."""
    spark.createDataFrame([], df.schema).write.mode("overwrite").parquet(path)
