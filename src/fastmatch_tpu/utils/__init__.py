from fastmatch_tpu.utils.evaluation import align_umeyama, ate_rmse

__all__ = ["align_umeyama", "ate_rmse"]
