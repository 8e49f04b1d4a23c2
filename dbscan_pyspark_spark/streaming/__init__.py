from dbscan_pyspark_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    streaming_exact_dedup,
    streaming_session_agg,
    streaming_throttle,
    streaming_tumbling_agg,
)
