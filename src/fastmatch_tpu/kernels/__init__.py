from fastmatch_tpu.kernels.distance_topk import (
    distance_topk,
    match_pair_pallas,
)

__all__ = ["distance_topk", "match_pair_pallas"]
