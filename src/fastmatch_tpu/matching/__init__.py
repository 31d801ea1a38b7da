from fastmatch_tpu.matching.matcher import (
    match_batch,
    match_pair,
    match_pair_jnp,
    squared_distance_matrix,
)

__all__ = [
    "match_batch",
    "match_pair",
    "match_pair_jnp",
    "squared_distance_matrix",
]
