from vector_spark.streaming.stream_ops import (  # noqa: F401
    stream_aggregate,
    stream_dedupe,
    stream_session_reduce,
    stream_throttle_state,
)
