from computer_vision_foundations_spark.plans.pipeline import (
    IngestConfig,
    PipelineConfig,
    SinkConfig,
)

__all__ = ["IngestConfig", "PipelineConfig", "SinkConfig"]
