from fastmatch_tpu.sensors.imu import (ImuPreintegration,
                                       apply_vi_alignment, preintegrate,
                                       vi_align)

__all__ = ["ImuPreintegration", "apply_vi_alignment", "preintegrate",
           "vi_align"]
