"""Settings/mapping translation (reference parity: D2/D3).

The reference migrates ES5 multi-type mappings to single-type targets
(/root/reference/pkg/es/es5settings.go:72-102): per-type property maps
are collected (skipping types with `_source.enabled=false`), sorted by
property count DESCENDING, and merged sequentially — so on a key
conflict the later (smaller) type's definition wins, exactly as the Go
loop overwrites. Date fields with the exact format
`yyyy-MM-dd HH:mm:ss` are widened to accept epoch millis too
(es5settings.go:123-145).

Spark-first twins:
- dict-level functions mirror the ES-mapping semantics 1:1 (unit-
  tested against the Go behavior);
- `merge_struct_types` applies the same precedence rule to Spark
  StructTypes, with timestamp-vs-string widening (a field exported as
  string by an older engine and timestamp by a newer one imports as
  timestamp);
- `import_index_merged` unions several exported NDJSON dirs with
  divergent manifests under the merged schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ES5_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss"
WIDENED_DATE_FORMAT = "yyyy-MM-dd HH:mm:ss||epoch_millis"


def merge_type_mappings(unwrapped_mappings: dict) -> dict:
    """Multi-type ES5 mapping → one merged `properties` map
    (mergeUnWrappedMapping, es5settings.go:72-102)."""
    prop_maps = []
    for type_props in unwrapped_mappings.values():
        if not isinstance(type_props, dict) or "properties" not in type_props:
            continue
        enabled = (type_props.get("_source") or {}).get("enabled")
        if enabled is not None and not enabled:
            continue
        prop_maps.append(dict(type_props["properties"]))
    prop_maps.sort(key=len, reverse=True)
    merged: dict = {}
    for props in prop_maps:
        merged.update(props)  # later (smaller) type wins on conflict
    return {"properties": merged}


def widen_date_formats(properties: dict) -> dict:
    """DateFieldSupportTimestamp (es5settings.go:123-145): date fields
    whose format is exactly `yyyy-MM-dd HH:mm:ss` also accept
    epoch_millis after migration."""
    fields = dict(properties.get("properties", {}))
    for name, attr in fields.items():
        if not isinstance(attr, dict):
            continue
        if attr.get("type") == "date" and attr.get("format") == ES5_DATE_FORMAT:
            attr = dict(attr)
            attr["format"] = WIDENED_DATE_FORMAT
            fields[name] = attr
    return {"properties": fields}


def _widen_pair(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widening for conflicting field types across exports."""
    if a == b:
        return a
    pair = {a.__class__, b.__class__}
    if pair == {T.TimestampType, T.StringType}:
        return T.TimestampType()
    if pair == {T.LongType, T.IntegerType}:
        return T.LongType()
    if pair == {T.DoubleType, T.FloatType} or pair == {T.DoubleType, T.LongType}:
        return T.DoubleType()
    return T.StringType()  # last resort: both render as strings


def merge_struct_types(schemas: list[T.StructType]) -> T.StructType:
    """Merge Spark schemas with the reference's precedence rule:
    largest-field-set first, later schemas overwrite on name conflicts —
    except that conflicting types are *widened*, not clobbered."""
    ordered = sorted(schemas, key=lambda s: len(s.fields), reverse=True)
    merged: dict[str, T.StructField] = {}
    order: list[str] = []
    for schema in ordered:
        for fld in schema.fields:
            if fld.name not in merged:
                merged[fld.name] = fld
                order.append(fld.name)
            else:
                prev = merged[fld.name]
                merged[fld.name] = T.StructField(
                    fld.name,
                    _widen_pair(prev.dataType, fld.dataType),
                    prev.nullable or fld.nullable,
                )
    return T.StructType([merged[n] for n in order])


def import_index_merged(spark: SparkSession, dirs: list[str]) -> tuple[DataFrame, T.StructType]:
    """Import several exported NDJSON dirs whose manifests disagree on
    schema: merge the schemas (D2) with widening (D3), then union all
    data under the merged shape. Keys must agree across exports."""
    from ela_lib_spark.sources.ndjson import import_index

    frames = []
    schemas = []
    for d in dirs:
        df, manifest = import_index(spark, d)
        frames.append(df)
        schemas.append(T.StructType.fromJson(manifest["settings"]["schema"]))
    target = merge_struct_types(schemas)
    out = None
    for df in frames:
        cols = []
        for fld in target.fields:
            if fld.name in df.columns:
                cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        shaped = df.select(*cols)
        out = shaped if out is None else out.unionByName(shaped)
    return out, target
