from ela_lib_spark.streaming.incremental import (  # noqa: F401
    apply_delta_batch,
    incremental_index_maintenance,
)
from ela_lib_spark.streaming.stateful import (  # noqa: F401
    streaming_events_hourly,
    streaming_exact_dedup,
)
