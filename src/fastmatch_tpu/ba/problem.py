"""Bundle-adjustment problem containers (components T12/T13 support).

The observation table is the BA analog of the matching layer's padded
containers: a fixed capacity ``O`` of (camera, point, uv) triples with a
validity mask — static shapes end-to-end, segment-sums keyed by camera or
point index. Dead observations point at segment 0 with zero weight.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3


class Observations(NamedTuple):
    """cam_idx: (O,) int32; pt_idx: (O,) int32; uv: (O, 2) f32 normalized
    image coords; mask: (O,) bool."""

    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.cam_idx.shape[-1]


class BAProblem(NamedTuple):
    """poses: world->camera SE3 with batch shape (C,); points: (P, 3);
    obs: Observations; cam_mask: (C,) live cameras; pt_mask: (P,) live
    points; fixed_cams: (C,) cameras excluded from optimization (gauge)."""

    poses: SE3
    points: jnp.ndarray
    obs: Observations
    cam_mask: jnp.ndarray
    pt_mask: jnp.ndarray
    fixed_cams: jnp.ndarray

    @property
    def n_cams(self) -> int:
        return self.cam_mask.shape[-1]

    @property
    def n_points(self) -> int:
        return self.pt_mask.shape[-1]
