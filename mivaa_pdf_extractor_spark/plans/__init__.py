from .pipeline import PipelineResult, run_pipeline  # noqa: F401
