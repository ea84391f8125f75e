from .artifact import (
    InferenceArtifact,
    export_infer_artifact,
    load_infer_artifact,
    save_infer_artifact,
)

__all__ = [
    "InferenceArtifact",
    "export_infer_artifact",
    "load_infer_artifact",
    "save_infer_artifact",
]
