"""Camera models: pinhole projection with optional radial distortion.

Pure functions over batched point arrays; differentiable (used by BA
Jacobians, BASELINE.json configs 3-4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pinhole(NamedTuple):
    """Pinhole intrinsics. fx, fy, cx, cy scalars (or broadcastable arrays);
    k1, k2 polynomial radial distortion (zero by default)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # Defaults are Python floats, NOT jnp scalars: a device array created at
    # import time would initialize the XLA backend and break
    # jax.distributed.initialize()'s must-be-called-first contract (T20).
    k1: jnp.ndarray | float = 0.0
    k2: jnp.ndarray | float = 0.0

    @staticmethod
    def from_K(K) -> "Pinhole":
        K = jnp.asarray(K)
        return Pinhole(fx=K[..., 0, 0], fy=K[..., 1, 1], cx=K[..., 0, 2], cy=K[..., 1, 2])

    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    def project(self, pts_cam: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
        """(..., 3) camera-frame points -> (..., 2) pixels.

        Points behind the camera project through a clamped depth; callers
        gate validity with ``pts_cam[..., 2] > 0`` (cheirality).
        """
        z = jnp.where(jnp.abs(pts_cam[..., 2:3]) < eps, eps, pts_cam[..., 2:3])
        xn = pts_cam[..., 0:1] / z
        yn = pts_cam[..., 1:2] / z
        r2 = xn * xn + yn * yn
        d = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
        u = self.fx * d[..., 0] * xn[..., 0] + self.cx
        v = self.fy * d[..., 0] * yn[..., 0] + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, pix: jnp.ndarray, undistort_iters: int = 10) -> jnp.ndarray:
        """(..., 2) pixels -> (..., 3) unit-depth rays.

        Radial distortion is inverted by fixed-point iteration
        xn <- xd / d(r2(xn)) — ``undistort_iters`` unrolled steps reach
        ~1e-7 normalized units for strong lenses (k1 = -0.25 at r ~ 1;
        measured in test_core). With k1 = k2 = 0 each step is the identity,
        so the default costs nothing under jit (XLA folds it).
        """
        xd = (pix[..., 0] - self.cx) / self.fx
        yd = (pix[..., 1] - self.cy) / self.fy
        xn, yn = xd, yd
        for _ in range(undistort_iters):
            r2 = xn * xn + yn * yn
            d = 1.0 + self.k1 * r2 + self.k2 * r2 * r2
            xn = xd / d
            yn = yd / d
        return jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
