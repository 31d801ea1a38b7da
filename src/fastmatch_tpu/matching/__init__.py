from fastmatch_tpu.matching.matcher import (
    match_batch,
    match_pair,
    match_pair_jnp,
    squared_distance_matrix,
)
from fastmatch_tpu.matching.mirror import match_pair_mirror
from fastmatch_tpu.matching.verify import VerifyResult, verify_matches

__all__ = [
    "match_batch",
    "match_pair",
    "match_pair_jnp",
    "match_pair_mirror",
    "squared_distance_matrix",
    "verify_matches",
    "VerifyResult",
]
