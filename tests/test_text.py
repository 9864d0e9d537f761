"""Byte-identity of extract_text (BASELINE.json per-row invariant) and
tokenizer parity between the JVM path and the Python/oracle path."""

from pyspark.sql import functions as F

from ela_lib_spark.functions.text import (
    extract_text,
    extract_text_series,
    tokenize_col,
    tokenize_list,
)
from ela_lib_spark.sources.synth import gen_batch


def test_extract_text_byte_identical_local():
    pdf = gen_batch(0, 512, 0)
    got = extract_text_series(pdf["html"])
    for g, want in zip(got, pdf["text"]):
        assert g == want  # str equality == byte equality for utf-8 source


def test_extract_text_byte_identical_spark(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    n_bad = (
        pages.withColumn("ext", extract_text(F.col("html")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert n_bad == 0


def test_tokenizer_jvm_matches_python(spark):
    samples = [
        "Hello, World! 42",
        "r&d don't x<y a>b",
        "  leading trailing  ",
        "",
        "ALL CAPS and 123numbers456",
        "unicode café straße",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    jvm = [r.toks for r in df.select(tokenize_col(F.col("text")).alias("toks")).collect()]
    for s, j in zip(samples, jvm):
        assert list(j) == tokenize_list(s), s


def test_tokenizer_jvm_matches_python_on_corpus(spark, pages_path):
    pages = spark.read.parquet(pages_path).limit(300)
    rows = pages.select("text", tokenize_col(F.col("text")).alias("toks")).collect()
    for r in rows:
        assert list(r.toks) == tokenize_list(r.text)
