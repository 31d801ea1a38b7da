"""DLT triangulation (component T11), batched over points and views.

Works on normalized coordinates with world-from-point projections
``x_cam = R x_w + t`` per view.
"""

from __future__ import annotations

import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import smallest_eigvecs


def triangulate_dlt(R, t, x, mask=None, eps: float = 1e-12):
    """Multi-view DLT: triangulate one 3D point per correspondence track.

    R: (V, 3, 3), t: (V, 3) — per-view world->camera transforms.
    x: (V, P, 2) normalized observations; mask: (V, P) visibility.

    Returns (points (P, 3), ok (P,)): the homogeneous DLT solution via the
    smallest eigenvector of the stacked 4x4 normal matrix (all views fused —
    no per-point SVD loops).
    """
    V = R.shape[0]
    P34 = jnp.concatenate([R, t[..., None]], axis=-1)  # (V, 3, 4)
    # Rows per view v, point p: x*P3 - P1, y*P3 - P2  (2 rows each).
    p1 = P34[:, 0, :][:, None, :]  # (V, 1, 4)
    p2 = P34[:, 1, :][:, None, :]
    p3 = P34[:, 2, :][:, None, :]
    r1 = x[..., 0:1] * p3 - p1  # (V, P, 4)
    r2 = x[..., 1:2] * p3 - p2
    if mask is not None:
        w = mask.astype(jnp.float32)[..., None]
        r1 = r1 * w
        r2 = r2 * w
    A = jnp.concatenate([r1, r2], axis=0)  # (2V, P, 4)
    ATA = jnp.einsum("vpi,vpj->pij", A, A)  # (P, 4, 4)
    # Fixed-iteration null vector (batched_linalg.py): P here is the full
    # landmark capacity (16k+ in BA-scale maps) and XLA's eigh cost is
    # data-dependent on exactly these spectra.
    h = smallest_eigvecs(ATA)[..., :, 0]  # (P, 4)
    wcomp = h[..., 3]
    ok = jnp.abs(wcomp) > eps
    pts = h[..., :3] / jnp.where(ok, wcomp, 1.0)[..., None]
    if mask is not None:
        ok = ok & (jnp.sum(mask, axis=0) >= 2)
    return pts, ok
