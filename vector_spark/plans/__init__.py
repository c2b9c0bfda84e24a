from vector_spark.plans.transcript_pipeline import (  # noqa: F401
    PipelineOutputs,
    run_pipeline,
    sink_aggregate,
)
