from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.global_sfm import global_reconstruct
from fastmatch_tpu.pipeline.reconstruct import Reconstruction, reconstruct

__all__ = ["PipelineConfig", "Reconstruction", "reconstruct",
           "global_reconstruct"]
