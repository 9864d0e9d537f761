"""FixDoc registry + datetime zero-pad — mirrors the Go semantics of
fixDatetimeFormatDate (/root/reference/pkg/es/doc_fix.go:86-108) and
the registry dispatch (doc_fix.go:16-84)."""

import pytest

from ela_lib_spark.functions.fixdoc import FIX_UNITS, VersionRange, fix_docs


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "2020-01-02 03:04:05"),        # 3 sections → append :0…0
        (2, "2020-01-02 03:04:05:7"),      # 4 sections → re-pad
        (3, "2020-01-02 03:04:05:0123"),   # leading zeros stripped → int
        (4, "2020-01-02 03:04:05:000"),    # all zeros → 0
        (5, None),                          # null-safe
    ]
    return rows


def _run(spark, rows, fmt, source="5.6.1", target="7.10.0", action="sync"):
    df = spark.createDataFrame(rows, "id long, created string")
    out = fix_docs(
        df, source_version=source, target_version=target, action=action,
        ctx={"datetime_fields": {"created": fmt}},
    )
    return {r.id: r.created for r in out.collect()}


def test_zero_pad_width_1(spark, events):
    got = _run(spark, events, "yyyy-MM-dd HH:mm:ss:S")
    assert got[1] == "2020-01-02 03:04:05:0"
    assert got[2] == "2020-01-02 03:04:05:7"
    assert got[3] == "2020-01-02 03:04:05:123"
    assert got[4] == "2020-01-02 03:04:05:0"
    assert got[5] is None


def test_zero_pad_width_3(spark, events):
    got = _run(spark, events, "yyyy-MM-dd HH:mm:ss:SSS")
    assert got[1] == "2020-01-02 03:04:05:000"
    assert got[2] == "2020-01-02 03:04:05:007"
    assert got[3] == "2020-01-02 03:04:05:123"
    assert got[4] == "2020-01-02 03:04:05:000"


def test_registry_gating(spark, events):
    # same version → no-op (doc_fix.go:61-63)
    got = _run(spark, events, "yyyy-MM-dd HH:mm:ss:S",
               source="5.6.1", target="5.6.1")
    assert got[1] == "2020-01-02 03:04:05"
    # non-5.x source → unit doesn't match
    got = _run(spark, events, "yyyy-MM-dd HH:mm:ss:S",
               source="6.8.0", target="7.10.0")
    assert got[1] == "2020-01-02 03:04:05"
    # action outside the unit's list → no-op
    got = _run(spark, events, "yyyy-MM-dd HH:mm:ss:S", action="export")
    assert got[1] == "2020-01-02 03:04:05"


def test_version_range():
    r = VersionRange(">= 5.0, < 6.0")
    assert r.check("5.0") and r.check("5.6.16") and not r.check("6.0")
    assert not r.check("4.9") and not r.check(None)
    assert VersionRange(">= 6.0").check("7.10.2")
    assert len(FIX_UNITS) == 1 and FIX_UNITS[0].name == "fix_datetime_format_date"


def test_fraction_less_format_is_noop(spark):
    """Review r2: a format without a fractional section (plain
    'yyyy-MM-dd HH:mm:ss') must no-op instead of raising at plan time."""
    from pyspark.sql import functions as F

    from ela_lib_spark.functions.fixdoc import fix_datetime_format_col

    df = spark.createDataFrame([("2024-01-02 03:04:05",)], "ts string")
    out = df.select(
        fix_datetime_format_col(F.col("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts")
    ).first()
    assert out.ts == "2024-01-02 03:04:05"
