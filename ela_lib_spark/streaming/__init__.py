from ela_lib_spark.streaming.incremental import (  # noqa: F401
    apply_delta_batch,
    incremental_index_maintenance,
)
