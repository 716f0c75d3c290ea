from computer_vision_foundations_spark.streaming.ingest import (
    build_ingest_stream,
    run_ingest,
    run_scoring_stream,
)
from computer_vision_foundations_spark.streaming.windows import (
    sessionized,
    tumbling_counts,
)

__all__ = [
    "build_ingest_stream",
    "run_ingest",
    "run_scoring_stream",
    "sessionized",
    "tumbling_counts",
]
