from computer_vision_foundations_spark.streaming.ingest import (
    build_ingest_stream,
    run_ingest,
    run_scoring_stream,
)
from computer_vision_foundations_spark.streaming.stateful import (
    running_totals_stateful,
)
from computer_vision_foundations_spark.streaming.upsert import upsert_stream
from computer_vision_foundations_spark.streaming.joins import stream_interval_join
from computer_vision_foundations_spark.streaming.windows import (
    dedup_stream,
    sessionized,
    streaming_session_counts,
    tumbling_counts,
)

__all__ = [
    "build_ingest_stream",
    "run_ingest",
    "run_scoring_stream",
    "dedup_stream",
    "running_totals_stateful",
    "sessionized",
    "streaming_session_counts",
    "tumbling_counts",
    "upsert_stream",
    "stream_interval_join",
]
