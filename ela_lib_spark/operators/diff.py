"""Migration-surface parity: compare / sync / sync_diff (SURVEY.md §2.4).

The reference's flagship relational op is a streaming symmetric hash
full-outer join with diff classification
(/root/reference/service/task/migrator.go:777-910): two sliced scans
drain into two concurrent skipmaps keyed by _id; matched ids compare
content hashes → same/update; residues → create/delete
(migrator.go:854-904). It needs 134 lines + manual eviction because it
streams two remote cursors through bounded memory.

Spark restatement: ONE full-outer join + a `when` classification —
Catalyst picks sort-merge/shuffled-hash with spill safety, and AQE
handles skewed keys. `sync_diff` (migrator.go:673-716: compare then
three selective re-syncs) collapses to a single join-derived MERGE
emulation.

Content hash: the reference uses FNV-1a 64 over canonical
sorted-key JSON (migrator.go:751-756). We keep the role (content
fingerprint over canonicalized row) but use Spark's built-in chained
multi-arg xxhash64 over (isnull(col), col) pairs in sorted column
order — JVM-side, codegen'd, no per-row string serialization (see
content_hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIFF_CLASSES = ("same", "update", "create", "delete")


def content_hash(df: DataFrame, key: str, cols: list[str] | None = None) -> Column:
    """Canonical row fingerprint over all non-key columns (sorted order
    pins the serialization, mirroring Go's sorted-key json.Marshal).

    `cols=None` means "all non-key columns"; an explicit empty list is
    an error — hashing zero columns would silently fall back to each
    side's own full column set, breaking the F5 intersection contract."""
    if cols is not None and not cols:
        from ela_lib_spark.errors import SettingsError

        raise SettingsError(
            "content_hash: empty compare-column list — source and target "
            "schemas share no identically-typed non-key columns"
        )
    if cols is None:
        cols = sorted(c for c in df.columns if c != key)
    # Chained multi-arg xxhash64 instead of xxhash64(to_json(struct)):
    # the JSON path built a string per row (timestamp formatting, field
    # quoting) just to hash it — pure per-task overhead (guide §1.2
    # step 2; measured ~2× of q_diff_classify's CPU at sf1.0, r6).
    # Each column is preceded by its isnull flag so a NULL in column i
    # vs column j can't collide (bare multi-arg xxhash64 skips NULLs,
    # which would make (5, NULL) and (NULL, 5) hash equal; to_json
    # dropped null fields but kept the field names). Each argument is
    # hashed as its own chained block, so there are no value-boundary
    # ambiguities, and the sorted column order pins the serialization
    # exactly as before.
    parts = []
    for c in cols:
        parts.append(F.isnull(F.col(c)))
        parts.append(F.col(c))
    return F.xxhash64(*parts)


def common_compare_cols(src: DataFrame, tgt: DataFrame, key: str) -> list[str]:
    """F5: keyword-field intersection — compare only fields present in
    BOTH schemas with identical types (the reference restricts the
    content hash to the shared keyword fields when source and target
    mappings diverge, pkg/es/es5.go keyword filtering). Sorted for a
    pinned serialization order."""
    t_types = {f.name: f.dataType for f in tgt.schema.fields}
    return sorted(
        f.name
        for f in src.schema.fields
        if f.name != key and t_types.get(f.name) == f.dataType
    )


def classify_diff(
    src: DataFrame, tgt: DataFrame, key: str = "url", cols: list[str] | None = None
) -> DataFrame:
    """→ (key, diff_class) for every key in src ∪ tgt.

    create = src ∖ tgt; delete = tgt ∖ src; update = hash mismatch;
    same = hash match (migrator.go:854-904 semantics).

    With cols=None the hash covers the schema intersection (F5) — on
    identical schemas that is every non-key column.
    """
    if cols is None:
        cols = common_compare_cols(src, tgt, key)
    s = src.select(F.col(key).alias("k"), content_hash(src, key, cols).alias("src_hash"))
    t = tgt.select(F.col(key).alias("k"), content_hash(tgt, key, cols).alias("tgt_hash"))
    j = s.join(t, "k", "full_outer")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("tgt_hash").isNull(), F.lit("create"))
        .when(F.col("src_hash").isNull(), F.lit("delete"))
        .when(F.col("src_hash") != F.col("tgt_hash"), F.lit("update"))
        .otherwise(F.lit("same"))
        .alias("diff_class"),
    )


def diff_result(classified: DataFrame) -> dict:
    """DiffResult counters + percent (migrator.go:912-958)."""
    counts = {r.diff_class: r.cnt for r in
              classified.groupBy("diff_class").agg(F.count("*").alias("cnt")).collect()}
    out = {c: int(counts.get(c, 0)) for c in DIFF_CLASSES}
    total = sum(out.values())
    out["total"] = total
    out["percent_same"] = (100.0 * out["same"] / total) if total else 100.0
    return out


def sync_diff_apply(
    src: DataFrame, tgt: DataFrame, key: str = "url", cols: list[str] | None = None
) -> DataFrame:
    """Emulated `MERGE INTO tgt USING src ON key WHEN MATCHED AND hash≠
    THEN UPDATE WHEN NOT MATCHED THEN INSERT WHEN NOT MATCHED BY SOURCE
    THEN DELETE` → the new target contents.

    Minimal-write form: unchanged target rows are kept from tgt
    (left_semi on same keys), changed/new rows come from src. On an
    Iceberg/Delta catalog this becomes a real MERGE; on parquet we
    rewrite. Result ≡ src by construction — the value is the action
    plan (classify_diff) driving selective IO, mirroring the
    reference's three selective re-syncs (migrator.go:673-716).
    """
    cls = classify_diff(src, tgt, key, cols)
    keep = tgt.join(cls.filter(F.col("diff_class") == "same").select(key), key, "left_semi")
    take = src.join(
        cls.filter(F.col("diff_class").isin("create", "update")).select(key),
        key,
        "left_semi",
    )
    return keep.unionByName(take)


def sync_append(src: DataFrame, tgt_path: str, mode: str = "append") -> None:
    """`sync`/`copy_index` write path (migrator.go:1252-1276): bulk copy.
    Write batching (action_size MB) ↔ parquet target file size."""
    src.write.mode(mode).parquet(tgt_path)
