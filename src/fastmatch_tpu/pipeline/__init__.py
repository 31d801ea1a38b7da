from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import Reconstruction, reconstruct

__all__ = ["PipelineConfig", "Reconstruction", "reconstruct"]
