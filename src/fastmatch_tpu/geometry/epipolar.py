"""Two-view epipolar geometry: 8-point essential, Sampson error, decomposition.

All functions are batched over a leading hypothesis axis where noted and free
of data-dependent control flow (RANSAC scores fixed-K hypothesis banks,
SURVEY.md §8.2). Inputs are *normalized* image coordinates (K^-1 pixels).
Component T10 support (BASELINE.json config 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import smallest_eigvecs, svd3
from fastmatch_tpu.core.lie import hat


def _homog(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def eight_point_essential(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None):
    """Essential matrix from >=8 normalized correspondences (least squares).

    x1, x2: (..., P, 2) normalized coords (P >= 8); w: optional (..., P)
    weights (e.g. inlier mask) — zero rows drop out of the fit.
    Returns (..., 3, 3) E with singular values projected to (1, 1, 0).
    """
    h1 = _homog(x1)  # (..., P, 3)
    h2 = _homog(x2)
    # Constraint rows: vec(h2 h1^T) . vec(E) = 0
    A = (h2[..., :, None] * h1[..., None, :]).reshape(*x1.shape[:-1], 9)
    if w is not None:
        A = A * w[..., None]
    # Null vector of A^T A (9x9). Fixed-iteration inverse iteration, NOT
    # jnp.linalg.eigh: XLA's eigh converges data-dependently and costs
    # ~1000x more on these ill-conditioned DLT spectra (batched_linalg.py).
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    e = smallest_eigvecs(ATA)[..., :, 0]
    E = e.reshape(*e.shape[:-1], 3, 3)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, S, Vt = svd3(E)
    S_proj = jnp.stack(
        [jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]), jnp.zeros_like(S[..., 0])],
        axis=-1,
    )
    return U @ (S_proj[..., :, None] * Vt)


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error, (..., P) given (..., 3, 3) E."""
    h1 = _homog(x1)
    h2 = _homog(x2)
    Ex1 = jnp.einsum("...ij,...pj->...pi", E, h1)
    Etx2 = jnp.einsum("...ji,...pj->...pi", E, h2)
    num = jnp.einsum("...pi,...pi->...p", h2, Ex1) ** 2
    den = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def decompose_essential(E: jnp.ndarray):
    """E -> four (R, t) candidates; R maps cam1 coords to cam2 (x2 = R x1 + t).

    Returns (Rs (..., 4, 3, 3), ts (..., 4, 3)); |t| = 1.
    """
    U, _, Vt = svd3(E)
    # Enforce proper rotations.
    detU = jnp.linalg.det(U)[..., None, None]
    detV = jnp.linalg.det(Vt)[..., None, None]
    U = U * jnp.concatenate(
        [jnp.ones_like(U[..., :2]), jnp.sign(detU) * jnp.ones_like(U[..., 2:])], axis=-1
    )
    Vt = Vt * jnp.concatenate(
        [jnp.ones_like(Vt[..., :2, :]), jnp.sign(detV) * jnp.ones_like(Vt[..., 2:, :])],
        axis=-2,
    )
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def triangulate_midpoint(R, t, x1, x2):
    """Fast midpoint-style depth solve for cheirality checks.

    Rays r1 = h(x1) in cam1, r2 = h(x2) in cam2 with cam2 = (R, t):
    solve depths [d1, d2] minimizing |d1 R r1 + t - d2 r2| via 2x2 normal
    equations. Returns (d1, d2), each (..., P).
    """
    r1 = _homog(x1)
    r2 = _homog(x2)
    Rr1 = jnp.einsum("...ij,...pj->...pi", R, r1)
    a = jnp.sum(Rr1 * Rr1, -1)
    b = -jnp.sum(Rr1 * r2, -1)
    c = jnp.sum(r2 * r2, -1)
    tb = jnp.broadcast_to(t[..., None, :], Rr1.shape)
    e1 = -jnp.sum(Rr1 * tb, -1)
    e2 = jnp.sum(r2 * tb, -1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    d1 = (e1 * c - b * e2) / det
    d2 = (a * e2 - b * e1) / det
    return d1, d2


def essential_from_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x R for relative pose x2 = R x1 + t."""
    return hat(t) @ R
