"""Composed training-data pipeline: planted junk + duplicates must be
removed end-to-end, survivors must be queryable through the index."""

import os

from pyspark.sql import functions as F

from ela_lib_spark.pipelines import prepare_and_index, prepare_training_corpus


def _corpus_with_plants(spark):
    from ela_lib_spark.sources.synth import synth_pages_df

    base = synth_pages_df(spark, 300).withColumn("_src", F.lit("base"))
    # planted exact duplicates of 10 docs under new urls
    dups = (
        base.limit(10)
        .withColumn("url", F.concat(F.lit("zzz-dup-"), F.col("url")))
        .withColumn("_src", F.lit("dup"))
    )
    # planted junk: too short / non-language
    junk = spark.createDataFrame(
        [
            (f"junk://{i}", None, None, "$$$ !!! ###" * 2, "en")
            for i in range(8)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("_src", F.lit("junk"))
    return base.unionByName(dups).unionByName(junk)


def test_prepare_training_corpus_removes_plants(spark, tmp_root):
    out = os.path.join(tmp_root, "cleaned")
    stats = prepare_training_corpus(
        spark, _corpus_with_plants(spark), out,
        langs=("en", "de", "fr", "und"), min_quality=0.3,
        near_dup_threshold=0.8,
    )
    assert stats["input"] == 318
    # junk dies at the quality gate (all-punctuation, 6 tokens)
    assert stats["after_lang_quality"] <= 310
    # each planted exact-dup pair loses exactly one member
    assert stats["after_exact_dedup"] == stats["after_lang_quality"] - 10
    cleaned = spark.read.parquet(out)
    assert cleaned.filter(F.col("_src") == "junk").count() == 0
    # min-key survivor: "zzz-dup-" urls sort after base urls → base kept
    assert cleaned.filter(F.col("_src") == "dup").count() == 0
    assert stats["removed_total"] >= 18


def test_prepare_and_index_end_to_end(spark, tmp_root):
    from ela_lib_spark.index.build import load_index
    from ela_lib_spark.query.wand import wand_topk

    res = prepare_and_index(
        spark, _corpus_with_plants(spark),
        os.path.join(tmp_root, "pi_corpus"), os.path.join(tmp_root, "pi_idx"),
        n_buckets=4, n_shards=2,
        langs=("en", "de", "fr", "und"),
    )
    assert res["manifest"]["n_docs"] == res["prep"]["after_near_dedup"]
    idx = load_index(spark, os.path.join(tmp_root, "pi_idx"))
    top = wand_topk(idx, ["term0000"], "OR", 5).collect()
    assert len(top) == 5 and top[0].score > 0
