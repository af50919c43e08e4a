from recommendit_tpu.pipelines.run_pipeline import (  # noqa: F401
    STAGES,
    PipelineOrchestrator,
)
