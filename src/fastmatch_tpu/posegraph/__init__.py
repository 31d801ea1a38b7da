from fastmatch_tpu.posegraph.pgo import PoseGraph, pgo_solve

__all__ = ["PoseGraph", "pgo_solve"]
