from ela_lib_spark.sources.synth import (  # noqa: F401
    BATCH,
    SEED,
    VOCAB_SIZE,
    gen_batch,
    reference_queries,
    synth_pages_df,
    vocabulary,
    write_web_pages,
)
