"""Uncalibrated two-view geometry: fundamental matrix estimation.

Extends the calibrated essential path (epipolar.py) to pairs with unknown
intrinsics — SURVEY.md §2.2 L4's minimal-solver coverage. The reference has
no geometric estimation (SURVEY.md §3.1); this belongs to the SfM extension
of BASELINE.json:5, and it is what the evaluation harness needs to score
matches on image pairs where only F (not K) is known.

TPU-first choices:
- The 7-point minimal solver needs the roots of det(l*F1 + (1-l)*F2) = 0, a
  real cubic. Nonsymmetric eigendecomposition (jnp.roots) does not lower to
  TPU, so the cubic is solved in closed form (Cardano / trigonometric),
  fully batched over hypotheses — K minimal samples become 3K candidate
  matrices scored in one fused pass, no per-hypothesis control flow.
- Cubic coefficients come from 4-point Lagrange interpolation of the 3x3
  determinant (evaluate at l = 0, 1, 2, -1) instead of symbolic cofactor
  expansion: four batched det3 calls, numerically tidy, and trivially
  correct.
- Nullspaces via eigh of the 9x9 normal matrix, as everywhere else in this
  package (batched, MXU-friendly; no tall SVDs).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import smallest_eigvecs, svd3
from fastmatch_tpu.geometry.epipolar import _homog, sampson_error
from fastmatch_tpu.geometry.homography import _normalize_points


def _constraint_rows(x1, x2, w=None):
    """(..., P, 9) epipolar constraint rows vec(h2 h1^T) . vec(F) = 0."""
    h1 = _homog(x1)
    h2 = _homog(x2)
    A = (h2[..., :, None] * h1[..., None, :]).reshape(*x1.shape[:-1], 9)
    if w is not None:
        A = A * w[..., None]
    return A


def eight_point_fundamental(x1: jnp.ndarray, x2: jnp.ndarray,
                            w: jnp.ndarray | None = None):
    """Fundamental matrix from >=8 correspondences (normalized 8-point).

    x1, x2: (..., P, 2) in pixels (or any affine frame — Hartley
    normalization is applied internally); w: optional (..., P) weights.
    Returns (..., 3, 3) F with rank-2 projection, unit Frobenius norm.
    """
    x1n, T1 = _normalize_points(x1, w)
    x2n, T2 = _normalize_points(x2, w)
    A = _constraint_rows(x1n, x2n, w)
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    f = smallest_eigvecs(ATA)[..., :, 0]
    Fn = f.reshape(*f.shape[:-1], 3, 3)
    # Rank-2 projection in the normalized frame (where it is least-squares
    # optimal), then denormalize: F = T2^T Fn T1.
    U, S, Vt = svd3(Fn)
    S2 = S * jnp.asarray([1.0, 1.0, 0.0])
    Fn = U @ (S2[..., :, None] * Vt)
    F = jnp.swapaxes(T2, -2, -1) @ Fn @ T1
    nrm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return F / jnp.maximum(nrm, 1e-12)


def _det3(M):
    return (
        M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
        - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
        + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0])
    )


def _cubic_roots(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d, batched.

    Returns (roots (..., 3), valid (..., 3)). Near-degenerate leading
    coefficients fall back to the quadratic/linear roots with the remaining
    slots masked out. All branches are jnp.where — no control flow.
    """
    eps = 1e-12
    a_deg = jnp.abs(a) < eps

    # --- cubic branch (depressed form t^3 + p t + q, x = t - b/3a) ---
    a_s = jnp.where(a_deg, 1.0, a)
    p = (3.0 * a_s * c - b * b) / (3.0 * a_s * a_s)
    q = (2.0 * b**3 - 9.0 * a_s * b * c + 27.0 * a_s * a_s * d) / (27.0 * a_s**3)
    shift = -b / (3.0 * a_s)
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    three_real = disc <= 0

    # Trigonometric method (three real roots; requires p < 0).
    p_neg = jnp.minimum(p, -eps)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    k = jnp.arange(3.0)
    tri = m[..., None] * jnp.cos(theta[..., None] - 2.0 * jnp.pi * k / 3.0)

    # Cardano (one real root).
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    single = (u + v)[..., None] * jnp.ones_like(k)

    cub_roots = jnp.where(three_real[..., None], tri, single) + shift[..., None]
    cub_valid = jnp.concatenate(
        [jnp.ones_like(three_real[..., None]),
         jnp.broadcast_to(three_real[..., None], three_real.shape + (2,))],
        axis=-1,
    )

    # --- quadratic fallback b x^2 + c x + d ---
    b_deg = jnp.abs(b) < eps
    b_s = jnp.where(b_deg, 1.0, b)
    qd = c * c - 4.0 * b_s * d
    sqd = jnp.sqrt(jnp.maximum(qd, 0.0))
    quad = jnp.stack(
        [(-c + sqd) / (2.0 * b_s), (-c - sqd) / (2.0 * b_s),
         jnp.zeros_like(c)], axis=-1)
    quad_valid = jnp.stack(
        [qd >= 0, qd >= 0, jnp.zeros_like(b_deg)], axis=-1)

    # --- linear fallback c x + d ---
    c_deg = jnp.abs(c) < eps
    c_s = jnp.where(c_deg, 1.0, c)
    lin = jnp.stack([-d / c_s, jnp.zeros_like(c), jnp.zeros_like(c)], axis=-1)
    lin_valid = jnp.stack(
        [~c_deg, jnp.zeros_like(c_deg), jnp.zeros_like(c_deg)], axis=-1)

    roots = jnp.where(a_deg[..., None],
                      jnp.where(b_deg[..., None], lin, quad), cub_roots)
    valid = jnp.where(a_deg[..., None],
                      jnp.where(b_deg[..., None], lin_valid, quad_valid),
                      cub_valid)
    return roots, valid


def seven_point_fundamental(x1: jnp.ndarray, x2: jnp.ndarray):
    """7-point minimal solver: up to 3 fundamental matrices per sample.

    x1, x2: (..., 7, 2). Returns (Fs (..., 3, 3, 3), valid (..., 3)) — the
    candidate axis comes from the real roots of the rank-2 cubic; invalid
    slots hold garbage and must be masked by the caller (RANSAC scores them
    with an infinite-error mask).
    """
    x1n, T1 = _normalize_points(x1)
    x2n, T2 = _normalize_points(x2)
    A = _constraint_rows(x1n, x2n)
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    vecs = smallest_eigvecs(ATA, k=2)  # orthonormal null-space basis
    F1 = vecs[..., :, 0].reshape(*x1.shape[:-2], 3, 3)
    F2 = vecs[..., :, 1].reshape(*x1.shape[:-2], 3, 3)

    # det(l F1 + (1 - l) F2) is cubic in l; interpolate its coefficients
    # from values at l = 0, 1, 2, -1.
    d0 = _det3(F2)
    d1 = _det3(F1)
    d2 = _det3(2.0 * F1 - F2)
    dm1 = _det3(2.0 * F2 - F1)
    # p(l) = a l^3 + b l^2 + c l + d with p(0)=d0, p(1)=d1, p(2)=d2, p(-1)=dm1:
    #   d = d0;  b = (p(1) + p(-1))/2 - d0;  then a, c from p(1), p(2).
    s = d1 - d0
    b = (s + (dm1 - d0)) / 2.0
    a = (d2 - d0 - 4.0 * b - 2.0 * (s - b)) / 6.0
    c = s - a - b
    d = d0

    lam, valid = _cubic_roots(a, b, c, d)  # (..., 3)
    Fn = (lam[..., None, None] * F1[..., None, :, :]
          + (1.0 - lam[..., None, None]) * F2[..., None, :, :])
    # Denormalize each candidate: F = T2^T Fn T1.
    F = (jnp.swapaxes(T2, -2, -1)[..., None, :, :] @ Fn @ T1[..., None, :, :])
    nrm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    F = F / jnp.maximum(nrm, 1e-12)
    return F, valid


class FundamentalResult(NamedTuple):
    F: jnp.ndarray          # (3, 3) refined fundamental (h2^T F h1 = 0)
    inliers: jnp.ndarray    # (P,) bool
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray         # scalar bool


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_fundamental(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    thr: float = 2.0,
    n_hyp: int = 512,
    min_inliers: int = 15,
) -> FundamentalResult:
    """Robust F from pixel correspondences via the 7-point minimal solver.

    x1, x2: (P, 2) pixels; ``thr`` is the squared Sampson threshold in
    pixels^2 (sampson_error is dimensionally identical for F in pixel
    coordinates). K samples x 3 cubic roots are scored as 3K hypotheses in
    one batch; final weighted normalized-8-point refit on the winning
    inlier set.
    """
    from fastmatch_tpu.geometry.ransac import _sample_minimal_sets

    p_count = mask.shape[0]
    if p_count < 7:
        return FundamentalResult(
            F=jnp.zeros((3, 3)), inliers=jnp.zeros(p_count, bool),
            n_inliers=jnp.int32(0), ok=jnp.bool_(False),
        )
    idx = _sample_minimal_sets(key, mask, n_hyp, 7)  # (K, 7)
    Fs, valid = seven_point_fundamental(x1[idx], x2[idx])  # (K, 3, 3, 3)
    Fs = Fs.reshape(-1, 3, 3)            # (3K, 3, 3)
    valid = valid.reshape(-1)            # (3K,)
    errs = sampson_error(Fs, x1[None], x2[None])  # (3K, P)
    inl = (errs < thr) & mask[None, :] & valid[:, None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    F0 = Fs[best]
    inl0 = inl[best]

    # Iterated refit (see ransac.py): converge to the inlier LSQ fit
    # instead of inheriting minimal-sample luck.
    F, inliers = F0, inl0
    for _ in range(3):
        F1r = eight_point_fundamental(x1, x2, w=inliers.astype(jnp.float32))
        err1 = sampson_error(F1r, x1, x2)
        inl1 = (err1 < thr) & mask
        better = jnp.sum(inl1) >= jnp.sum(inliers)
        F = jnp.where(better, F1r, F)
        inliers = jnp.where(better, inl1, inliers)
    n_in = jnp.sum(inliers)
    return FundamentalResult(
        F=F, inliers=inliers, n_inliers=n_in, ok=n_in >= min_inliers,
    )


def fundamental_from_essential(E: jnp.ndarray, K1: jnp.ndarray,
                               K2: jnp.ndarray) -> jnp.ndarray:
    """F = K2^-T E K1^-1 (test oracle / interop)."""
    return (jnp.linalg.inv(K2).swapaxes(-2, -1) @ E @ jnp.linalg.inv(K1))
