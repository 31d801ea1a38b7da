from fastmatch_tpu.features.sift import SIFTConfig, detect_and_describe

__all__ = ["SIFTConfig", "detect_and_describe"]
