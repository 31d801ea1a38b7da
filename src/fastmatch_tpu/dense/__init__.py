from fastmatch_tpu.dense.stereo import (StereoConfig, depth_from_disparity,
                                        disparity_to_points, rectify_pair,
                                        stereo_disparity)

__all__ = ["StereoConfig", "depth_from_disparity", "disparity_to_points",
           "rectify_pair", "stereo_disparity"]
