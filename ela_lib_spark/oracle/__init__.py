from ela_lib_spark.oracle.brute import brute_topk  # noqa: F401
