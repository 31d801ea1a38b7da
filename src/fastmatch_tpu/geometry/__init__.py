from fastmatch_tpu.geometry.epipolar import (
    decompose_essential,
    eight_point_essential,
    sampson_error,
)
from fastmatch_tpu.geometry.ransac import ransac_essential, RansacResult
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.geometry.pnp import pnp_dlt, ransac_pnp

__all__ = [
    "decompose_essential",
    "eight_point_essential",
    "sampson_error",
    "ransac_essential",
    "RansacResult",
    "triangulate_dlt",
    "pnp_dlt",
    "ransac_pnp",
]
