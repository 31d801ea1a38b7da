from fastmatch_tpu.features.klt import (KLTConfig, build_pyramid, shi_tomasi,
                                        track, track_pair)
from fastmatch_tpu.features.orb import ORBConfig, detect_and_describe_orb
from fastmatch_tpu.features.sift import SIFTConfig, detect_and_describe

__all__ = ["KLTConfig", "ORBConfig", "SIFTConfig", "build_pyramid",
           "detect_and_describe", "detect_and_describe_orb", "shi_tomasi",
           "track", "track_pair"]
