from fastmatch_tpu.geometry.epipolar import (
    decompose_essential,
    eight_point_essential,
    sampson_error,
)
from fastmatch_tpu.geometry.five_point import five_point_essential
from fastmatch_tpu.geometry.fundamental import (
    FundamentalResult,
    eight_point_fundamental,
    fundamental_from_essential,
    ransac_fundamental,
    seven_point_fundamental,
)
from fastmatch_tpu.geometry.homography import (
    HomographyResult,
    TwoViewModel,
    decompose_homography,
    dlt_homography,
    ransac_homography,
    select_two_view_model,
    symmetric_transfer_error,
)
from fastmatch_tpu.geometry.averaging import (
    ViewGraph,
    filter_edges_by_rotation,
    rotation_averaging,
    spanning_tree_rotations,
    translation_averaging,
)
from fastmatch_tpu.geometry.ransac import ransac_essential, RansacResult
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.geometry.pnp import pnp_dlt, pnp_planar, ransac_pnp

__all__ = [
    "decompose_essential",
    "eight_point_essential",
    "sampson_error",
    "dlt_homography",
    "symmetric_transfer_error",
    "ransac_homography",
    "decompose_homography",
    "select_two_view_model",
    "HomographyResult",
    "TwoViewModel",
    "five_point_essential",
    "eight_point_fundamental",
    "seven_point_fundamental",
    "ransac_fundamental",
    "fundamental_from_essential",
    "FundamentalResult",
    "ransac_essential",
    "RansacResult",
    "ViewGraph",
    "spanning_tree_rotations",
    "rotation_averaging",
    "translation_averaging",
    "filter_edges_by_rotation",
    "triangulate_dlt",
    "pnp_dlt",
    "pnp_planar",
    "ransac_pnp",
]
