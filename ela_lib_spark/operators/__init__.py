from ela_lib_spark.operators.diff import (  # noqa: F401
    classify_diff,
    content_hash,
    diff_result,
    sync_diff_apply,
)
