"""fastmatch-tpu: a TPU-native SLAM/SfM engine.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of the
reference feature-matching engine (arnfred/Fast-Match) extended into a full
SLAM/SfM pipeline, per the project north star (BASELINE.json):

- batched 128-d SIFT descriptor distance + top-2 / Lowe ratio / cross-check
  matching as fused Pallas TPU kernels,
- DoG/SIFT detection and description as vmapped XLA convolutions,
- two-view RANSAC pose, triangulation, PnP,
- incremental bundle adjustment (Levenberg-Marquardt with Schur-complement
  reduction, PCG inner solver),
- pose-graph optimization with loop closure,
- multi-chip/multi-host sharding of descriptor banks and map blocks via
  jax.sharding Mesh + shard_map collectives (ICI/DCN), with matching and BA
  overlapped.

Note on reference citations: /root/reference (arnfred/Fast-Match) was an empty
mount in every session to date (see SURVEY.md §0), so docstrings cite the
in-repo capability spec BASELINE.json instead of reference file:line.

.. warning:: **Import side effect** — importing this package sets the
   process-global ``jax_default_matmul_precision = "highest"`` (rationale
   below). Host programs embedding fastmatch-tpu alongside other JAX code
   that relies on TPU's default-bf16 matmuls will see those matmuls run in
   full f32 (slower, more accurate) after this import. To restore the
   default for your own code, wrap it in
   ``with jax.default_matmul_precision("default"): ...`` or set the config
   back explicitly. Also documented in README "Embedding" section.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bf16, which is wrong for geometry: SE3 chains,
# triangulation, and BA Jacobian products silently lose ~3 decimal digits
# per op and SLAM tracking diverges within a handful of frames (observed on
# v5e; the same run is fine on CPU). This library is an estimation stack —
# full f32 is the correctness default. Hot paths that can afford bf16 opt
# in EXPLICITLY by casting (e.g. the matcher's precision="fast" mode).
_jax.config.update("jax_default_matmul_precision", "highest")

from fastmatch_tpu.core.containers import Descriptors, Keypoints, Matches
from fastmatch_tpu.matching.matcher import match_pair, match_batch

__all__ = [
    "Descriptors",
    "Keypoints",
    "Matches",
    "match_pair",
    "match_batch",
]
