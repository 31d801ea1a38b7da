from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.ba.lm import ba_solve, BAResult

__all__ = ["BAProblem", "Observations", "ba_solve", "BAResult"]
