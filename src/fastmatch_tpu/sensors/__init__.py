from fastmatch_tpu.sensors.imu import (ImuPreintegration, preintegrate,
                                       vi_align)

__all__ = ["ImuPreintegration", "preintegrate", "vi_align"]
