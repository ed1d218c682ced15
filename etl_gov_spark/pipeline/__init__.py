from etl_gov_spark.pipeline.core import (
    Dataset,
    DatasetRegistry,
    Pipeline,
    PipelineContext,
    PipelineListener,
    RunLedger,
    SensorTimeout,
    TaskReschedule,
    TaskSkipped,
)

__all__ = [
    "Dataset",
    "DatasetRegistry",
    "Pipeline",
    "PipelineContext",
    "PipelineListener",
    "RunLedger",
    "SensorTimeout",
    "TaskReschedule",
    "TaskSkipped",
]
