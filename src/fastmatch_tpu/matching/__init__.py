from fastmatch_tpu.matching.hamming import (
    hamming_distance_matrix,
    match_batch_hamming,
    match_pair_hamming,
    match_pair_hamming_jnp,
)
from fastmatch_tpu.matching.matcher import (
    match_batch,
    match_pair,
    match_pair_jnp,
    squared_distance_matrix,
)
from fastmatch_tpu.matching.mirror import match_pair_mirror
from fastmatch_tpu.matching.verify import VerifyResult, verify_matches

__all__ = [
    "hamming_distance_matrix",
    "match_batch",
    "match_batch_hamming",
    "match_pair",
    "match_pair_hamming",
    "match_pair_hamming_jnp",
    "match_pair_jnp",
    "match_pair_mirror",
    "squared_distance_matrix",
    "verify_matches",
    "VerifyResult",
]
