from etl_gov_spark.pipeline.core import (
    Dataset,
    DatasetRegistry,
    Pipeline,
    PipelineContext,
    SensorTimeout,
    TaskSkipped,
)

__all__ = [
    "Dataset",
    "DatasetRegistry",
    "Pipeline",
    "PipelineContext",
    "SensorTimeout",
    "TaskSkipped",
]
