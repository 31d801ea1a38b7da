"""Camera models: pinhole with full Brown-Conrady distortion, and an
equidistant fisheye (component T1; BASELINE.json configs 3-4).

Pure functions over batched point arrays; differentiable (used by BA
Jacobians). Both models expose the same surface — ``project``,
``unproject``, ``K``, ``from_K``, ``intrinsics_vector`` — and the pipeline
consumes them through two shared entry points:

- ``normalize_pixels`` (jnp): the device-side pixels -> normalized-coords
  path used inside the tracker's jitted step. The model is a STATIC string
  (one compile per model, no wasted per-frame branch arithmetic).
- ``normalize_np`` (numpy): the host-side mirror used by the incremental
  reconstruct/slam drivers — bit-compatible iteration structure so the
  engines agree.

Everything downstream of normalization (RANSAC, triangulation, BA,
pose graph) works in normalized camera coordinates and is model-agnostic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# Fixed iteration counts (static shapes; XLA folds the loop when all
# distortion coefficients are zero — each step is then the identity).
_UNDIST_ITERS = 10
_FISHEYE_NEWTON_ITERS = 8


class Pinhole(NamedTuple):
    """Pinhole intrinsics with Brown-Conrady distortion. fx, fy, cx, cy
    scalars (or broadcastable arrays); k1, k2, k3 polynomial radial and
    p1, p2 tangential coefficients (zero by default)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # Defaults are Python floats, NOT jnp scalars: a device array created at
    # import time would initialize the XLA backend and break
    # jax.distributed.initialize()'s must-be-called-first contract (T20).
    k1: jnp.ndarray | float = 0.0
    k2: jnp.ndarray | float = 0.0
    k3: jnp.ndarray | float = 0.0
    p1: jnp.ndarray | float = 0.0
    p2: jnp.ndarray | float = 0.0

    @staticmethod
    def from_K(K, dist=()) -> "Pinhole":
        """``dist``: optional (k1, k2[, k3[, p1, p2]]) coefficients."""
        K = jnp.asarray(K)
        d = tuple(float(x) for x in dist) + (0.0,) * (5 - len(dist))
        return Pinhole(fx=K[..., 0, 0], fy=K[..., 1, 1], cx=K[..., 0, 2],
                       cy=K[..., 1, 2], k1=d[0], k2=d[1], k3=d[2],
                       p1=d[3], p2=d[4])

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

    def intrinsics_vector(self) -> np.ndarray:
        """(9,) f32 [fx fy cx cy k1 k2 k3 p1 p2] for device-resident state
        (pipeline/tracker.TrackState.cam). Array-valued coefficients (per-
        camera batches) are not representable here and collapse to 0."""
        def s(v):
            return float(v) if jnp.ndim(v) == 0 else 0.0

        return np.asarray([s(self.fx), s(self.fy), s(self.cx), s(self.cy),
                           s(self.k1), s(self.k2), s(self.k3), s(self.p1),
                           s(self.p2)], np.float32)

    model = "pinhole"

    def project(self, pts_cam: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
        """(..., 3) camera-frame points -> (..., 2) pixels.

        Points behind the camera project through a clamped depth; callers
        gate validity with ``pts_cam[..., 2] > 0`` (cheirality).
        """
        z = jnp.where(jnp.abs(pts_cam[..., 2:3]) < eps, eps, pts_cam[..., 2:3])
        xn = pts_cam[..., 0] / z[..., 0]
        yn = pts_cam[..., 1] / z[..., 0]
        r2 = xn * xn + yn * yn
        d = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xy2 = 2.0 * xn * yn
        xd = xn * d + self.p1 * xy2 + self.p2 * (r2 + 2.0 * xn * xn)
        yd = yn * d + self.p1 * (r2 + 2.0 * yn * yn) + self.p2 * xy2
        u = self.fx * xd + self.cx
        v = self.fy * yd + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, pix: jnp.ndarray,
                  undistort_iters: int = _UNDIST_ITERS) -> jnp.ndarray:
        """(..., 2) pixels -> (..., 3) unit-depth rays.

        Distortion is inverted by fixed-point iteration
        xn <- (xd - tangential(xn)) / radial(r2(xn)) — ``undistort_iters``
        unrolled steps reach ~1e-7 normalized units for strong lenses
        (k1 = -0.25 at r ~ 1; measured in test_core). With all
        coefficients zero each step is the identity, so the default costs
        nothing under jit (XLA folds it)."""
        xd = (pix[..., 0] - self.cx) / self.fx
        yd = (pix[..., 1] - self.cy) / self.fy
        xn, yn = xd, yd
        for _ in range(undistort_iters):
            r2 = xn * xn + yn * yn
            d = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
            xy2 = 2.0 * xn * yn
            tx = self.p1 * xy2 + self.p2 * (r2 + 2.0 * xn * xn)
            ty = self.p1 * (r2 + 2.0 * yn * yn) + self.p2 * xy2
            xn = (xd - tx) / d
            yn = (yd - ty) / d
        return jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)


class Fisheye(NamedTuple):
    """Equidistant fisheye (theta-polynomial, the cv2.fisheye/Kannala-Brandt
    convention): r_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8),
    pixels = f * (x/|x|_xy) * r_d + c. Valid over the full >180-degree field
    as long as theta stays short of pi/2 per the polynomial's monotone
    range."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray | float = 0.0
    k2: jnp.ndarray | float = 0.0
    k3: jnp.ndarray | float = 0.0
    k4: jnp.ndarray | float = 0.0

    @staticmethod
    def from_K(K, dist=()) -> "Fisheye":
        K = jnp.asarray(K)
        d = tuple(float(x) for x in dist) + (0.0,) * (4 - len(dist))
        return Fisheye(fx=K[..., 0, 0], fy=K[..., 1, 1], cx=K[..., 0, 2],
                       cy=K[..., 1, 2], k1=d[0], k2=d[1], k3=d[2], k4=d[3])

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

    def intrinsics_vector(self) -> np.ndarray:
        """(9,) f32 [fx fy cx cy k1 k2 k3 k4 0]."""
        def s(v):
            return float(v) if jnp.ndim(v) == 0 else 0.0

        return np.asarray([s(self.fx), s(self.fy), s(self.cx), s(self.cy),
                           s(self.k1), s(self.k2), s(self.k3), s(self.k4),
                           0.0], np.float32)

    model = "fisheye"

    def project(self, pts_cam: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
        """(..., 3) camera-frame points -> (..., 2) pixels (equidistant)."""
        z = jnp.where(jnp.abs(pts_cam[..., 2:3]) < eps, eps, pts_cam[..., 2:3])
        a = pts_cam[..., 0] / z[..., 0]
        b = pts_cam[..., 1] / z[..., 0]
        r = jnp.sqrt(a * a + b * b)
        th = jnp.arctan(r)
        t2 = th * th
        thd = th * (1.0 + t2 * (self.k1 + t2 * (self.k2 + t2 * (self.k3 + t2 * self.k4))))
        scale = jnp.where(r > eps, thd / jnp.maximum(r, eps), 1.0)
        u = self.fx * a * scale + self.cx
        v = self.fy * b * scale + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, pix: jnp.ndarray,
                  newton_iters: int = _FISHEYE_NEWTON_ITERS) -> jnp.ndarray:
        """(..., 2) pixels -> (..., 3) unit-depth rays. Inverts the theta
        polynomial with ``newton_iters`` fixed Newton steps from
        theta0 = theta_d (static count — extra steps are numeric no-ops at
        the root; with all k zero the polynomial is the identity and every
        step is a no-op XLA folds away)."""
        xd = (pix[..., 0] - self.cx) / self.fx
        yd = (pix[..., 1] - self.cy) / self.fy
        thd = jnp.sqrt(xd * xd + yd * yd)
        th = thd
        for _ in range(newton_iters):
            t2 = th * th
            g = th * (1.0 + t2 * (self.k1 + t2 * (self.k2 + t2 * (self.k3 + t2 * self.k4)))) - thd
            dg = 1.0 + t2 * (3.0 * self.k1 + t2 * (5.0 * self.k2 + t2 * (7.0 * self.k3 + t2 * 9.0 * self.k4)))
            th = th - g / jnp.where(jnp.abs(dg) < 1e-9, 1e-9, dg)
        scale = jnp.where(thd > 1e-9, jnp.tan(th) / jnp.maximum(thd, 1e-9), 1.0)
        return jnp.stack([xd * scale, yd * scale, jnp.ones_like(xd)], axis=-1)


@partial(jax.jit, static_argnames=("model",))
def normalize_pixels(xy: jnp.ndarray, vec: jnp.ndarray,
                     model: str = "pinhole") -> jnp.ndarray:
    """Device-side pixels -> normalized coords over a packed (9,) intrinsics
    vector (``intrinsics_vector``). ``model`` is static — the tracker's
    compiled step bakes one model in. The pinhole path matches the
    pre-round-3 tracker bit-for-bit when k3 = p1 = p2 = 0 (adding exact
    zeros and subtracting exact zeros changes no finite f32 bits).

    Module-level jit: called EAGERLY (bootstrap state init, calibration)
    the inner ``fori_loop`` closure would otherwise re-trace on every call
    — measured 0.56 s per call through the relay vs 0.5 ms jit-cached.
    Inside other jitted programs it simply inlines as before."""
    f = vec[:2]
    c = vec[2:4]
    xd = (xy - c) / f
    if model == "pinhole":
        k1, k2, k3, p1, p2 = vec[4], vec[5], vec[6], vec[7], vec[8]

        def body(_, xn):
            r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
            d = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            x, y = xn[..., 0:1], xn[..., 1:2]
            xy2 = 2.0 * x * y
            tx = p1 * xy2 + p2 * (r2 + 2.0 * x * x)
            ty = p1 * (r2 + 2.0 * y * y) + p2 * xy2
            return (xd - jnp.concatenate([tx, ty], axis=-1)) / d

        return jax.lax.fori_loop(0, _UNDIST_ITERS, body, xd)
    if model == "fisheye":
        k1, k2, k3, k4 = vec[4], vec[5], vec[6], vec[7]
        thd = jnp.linalg.norm(xd, axis=-1, keepdims=True)

        def body(_, th):
            t2 = th * th
            g = th * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - thd
            dg = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + t2 * 9.0 * k4)))
            return th - g / jnp.where(jnp.abs(dg) < 1e-9, 1e-9, dg)

        th = jax.lax.fori_loop(0, _FISHEYE_NEWTON_ITERS, body, thd)
        scale = jnp.where(thd > 1e-9, jnp.tan(th) / jnp.maximum(thd, 1e-9), 1.0)
        return xd * scale
    raise ValueError(f"unknown camera model {model!r}")


def project_pixels(xn: jnp.ndarray, vec: jnp.ndarray,
                   model: str = "pinhole") -> jnp.ndarray:
    """Normalized coords -> pixels over a packed (9,) intrinsics vector:
    the exact forward inverse of ``normalize_pixels`` (distort, then apply
    focal/center). Differentiable in ``vec`` — this is the projection the
    self-calibration refinement (ba/calibrate.py) linearizes.

    ``xn``: (..., 2) undistorted normalized image coordinates (x/z, y/z).
    """
    f = vec[:2]
    c = vec[2:4]
    if model == "pinhole":
        k1, k2, k3, p1, p2 = vec[4], vec[5], vec[6], vec[7], vec[8]
        x, y = xn[..., 0:1], xn[..., 1:2]
        r2 = x * x + y * y
        d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xy2 = 2.0 * x * y
        xd = x * d + p1 * xy2 + p2 * (r2 + 2.0 * x * x)
        yd = y * d + p1 * (r2 + 2.0 * y * y) + p2 * xy2
        return jnp.concatenate([xd, yd], axis=-1) * f + c
    if model == "fisheye":
        k1, k2, k3, k4 = vec[4], vec[5], vec[6], vec[7]
        r = jnp.linalg.norm(xn, axis=-1, keepdims=True)
        th = jnp.arctan(r)
        t2 = th * th
        thd = th * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        scale = jnp.where(r > 1e-9, thd / jnp.maximum(r, 1e-9), 1.0)
        return xn * scale * f + c
    raise ValueError(f"unknown camera model {model!r}")


def normalize_np(uv_px: np.ndarray, cam) -> np.ndarray:
    """Host-side (numpy) pixels -> normalized coords for any camera model —
    the mirror of ``normalize_pixels`` used by the host-driven pipeline
    (pipeline/reconstruct._normalize delegates here). Identical iteration
    structure so host- and device-driven engines agree."""
    model = getattr(cam, "model", "pinhole")
    f = np.array([float(cam.fx), float(cam.fy)])
    c = np.array([float(cam.cx), float(cam.cy)])
    xd = (uv_px - c) / f

    def s(name):
        v = getattr(cam, name, 0.0)
        return float(v) if np.ndim(v) == 0 else 0.0

    if model == "pinhole":
        k1, k2, k3 = s("k1"), s("k2"), s("k3")
        p1, p2 = s("p1"), s("p2")
        if not (k1 or k2 or k3 or p1 or p2):
            return xd
        xn = xd.copy()
        for _ in range(_UNDIST_ITERS):
            r2 = np.sum(xn * xn, axis=-1, keepdims=True)
            d = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            x, y = xn[..., 0:1], xn[..., 1:2]
            xy2 = 2.0 * x * y
            tx = p1 * xy2 + p2 * (r2 + 2.0 * x * x)
            ty = p1 * (r2 + 2.0 * y * y) + p2 * xy2
            xn = (xd - np.concatenate([tx, ty], axis=-1)) / d
        return xn
    if model == "fisheye":
        k1, k2, k3, k4 = s("k1"), s("k2"), s("k3"), s("k4")
        thd = np.linalg.norm(xd, axis=-1, keepdims=True)
        th = thd.copy()
        for _ in range(_FISHEYE_NEWTON_ITERS):
            t2 = th * th
            g = th * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - thd
            dg = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + t2 * 9.0 * k4)))
            th = th - g / np.where(np.abs(dg) < 1e-9, 1e-9, dg)
        scale = np.where(thd > 1e-9, np.tan(th) / np.maximum(thd, 1e-9), 1.0)
        return xd * scale
    raise ValueError(f"unknown camera model {model!r}")
