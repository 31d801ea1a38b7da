from fastmatch_tpu.posegraph.pgo import (
    PoseGraph,
    pgo_solve,
    with_pose_priors,
    with_position_priors,
)

__all__ = ["PoseGraph", "pgo_solve", "with_pose_priors",
           "with_position_priors"]
