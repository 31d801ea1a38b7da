"""PnP: camera pose from 3D-2D correspondences (component T11).

DLT initialization (12-parameter projective fit, orthogonalized onto SE3)
followed by fixed-iteration Gauss-Newton on the SE3 manifold — no
data-dependent loops (``fori_loop`` with a static count). RANSAC wrapper
mirrors geometry/ransac.py: K minimal sets scored in parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import polar3, smallest_eigvecs
from fastmatch_tpu.core.lie import SE3, hat


def _project(p):
    z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-9, 1e-9, p[..., 2:3])
    return p[..., :2] / z


def pnp_dlt(X: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray | None = None):
    """DLT pose fit: X (..., P, 3) world points, x (..., P, 2) normalized
    observations, w optional (..., P) weights. Returns SE3 (R, t) with
    x ~ project(R X + t). Requires P >= 6 effective points.
    """
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (..., P, 4)
    zeros = jnp.zeros_like(Xh)
    u = x[..., 0:1]
    v = x[..., 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (..., P, 12)
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    if w is not None:
        r1 = r1 * w[..., None]
        r2 = r2 * w[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2P, 12)
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    p = smallest_eigvecs(ATA)[..., :, 0]
    P34 = p.reshape(*p.shape[:-1], 3, 4)
    M = P34[..., :, :3]
    # Fix scale and sign: depths of the (weighted) centroid should be +.
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)))
    scale = jnp.where(scale < 1e-12, 1.0, scale)
    P34 = P34 / scale[..., None, None]
    if w is None:
        centroid = jnp.mean(X, axis=-2)
    else:
        # Weighted: zero-weight rows (padding/outliers) must not drag the
        # sign-disambiguation point — an unweighted centroid can sit at
        # negative depth and flip t for a correct pose.
        wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        centroid = jnp.sum(X * w[..., None], axis=-2) / wsum
    ch = jnp.concatenate([centroid, jnp.ones_like(centroid[..., :1])], axis=-1)
    z_c = jnp.einsum("...ij,...j->...i", P34, ch)[..., 2]
    P34 = P34 * jnp.where(z_c < 0, -1.0, 1.0)[..., None, None]
    M = P34[..., :, :3]
    # Orthogonalize onto SO(3).
    R = polar3(M)
    t = P34[..., :, 3]
    return SE3(R, t)


def pnp_planar(X: jnp.ndarray, x: jnp.ndarray):
    """Pose from (near-)coplanar 2D-3D correspondences via a plane-to-image
    homography (IPPE-style). X: (..., P, 3), x: (..., P, 2) normalized.

    The 3x4 DLT is rank-deficient when the points are coplanar (the
    projective matrix has a one-parameter null family on a plane), so
    every minimal 6-point sample of a planar scene yields garbage;
    ransac_pnp races this solver's hypotheses alongside the DLT's.

    Construction: build an orthonormal in-plane frame (c; u, v) from the
    sample, fit H mapping plane coordinates to image, and read the pose
    off H = [R u | R v | R c + t] up to scale; orthonormalize with polar3.
    """
    from fastmatch_tpu.core.batched_linalg import (
        _orth_complement, polar3, smallest_eigvecs)
    from fastmatch_tpu.geometry.homography import dlt_homography

    c = jnp.mean(X, axis=-2)
    Xc = X - c[..., None, :]
    cov = jnp.einsum("...pi,...pj->...ij", Xc, Xc)
    w = smallest_eigvecs(cov)[..., :, 0]  # plane normal (unit)
    u = _orth_complement(w)
    v = jnp.cross(w, u)
    p2 = jnp.stack(
        [jnp.einsum("...pi,...i->...p", Xc, u),
         jnp.einsum("...pi,...i->...p", Xc, v)], axis=-1)  # (..., P, 2)
    H = dlt_homography(p2, x)  # x ~ H [p2; 1]
    # Sign: the plane origin c must project to positive depth (H[:, 2] is
    # the image of [0, 0, 1] = R c + t, whose z is the origin's depth).
    H = H * jnp.where(H[..., 2, 2] < 0, -1.0, 1.0)[..., None, None]
    h1 = H[..., :, 0]
    h2 = H[..., :, 1]
    s = 2.0 / jnp.maximum(
        jnp.linalg.norm(h1, axis=-1) + jnp.linalg.norm(h2, axis=-1), 1e-12)
    r1 = h1 * s[..., None]
    r2 = h2 * s[..., None]
    Rp = polar3(jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=-1))
    B = jnp.stack([u, v, w], axis=-1)  # world->plane-frame basis (columns)
    R = Rp @ jnp.swapaxes(B, -2, -1)
    t = H[..., :, 2] * s[..., None] - jnp.einsum("...ij,...j->...i", R, c)
    return SE3(R, t)


def refine_pose_gn(
    pose: SE3, X: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray, iters: int = 5,
    damping: float = 1e-6,
) -> SE3:
    """Fixed-iteration Gauss-Newton on SE3 minimizing weighted reprojection."""

    def body(_, pose):
        R, t = pose
        p = jnp.einsum("ij,pj->pi", R, X) + t
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        res = _project(p) - x  # (P, 2)
        iz = 1.0 / z
        Jp = jnp.stack(
            [
                jnp.stack([iz, jnp.zeros_like(iz), -p[:, 0] * iz * iz], -1),
                jnp.stack([jnp.zeros_like(iz), iz, -p[:, 1] * iz * iz], -1),
            ],
            -2,
        )  # (P, 2, 3)
        Jtw = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), (X.shape[0], 3, 3)), -hat(p)], axis=-1
        )  # (P, 3, 6)
        J = Jp @ Jtw  # (P, 2, 6)
        wv = w[:, None, None]
        H = jnp.einsum("pki,pkj->ij", J * wv, J) + damping * jnp.eye(6)
        g = jnp.einsum("pki,pk->i", J * wv, res)
        delta = -jnp.linalg.solve(H, g)
        return SE3.exp(delta).compose(SE3(R, t))

    return jax.lax.fori_loop(0, iters, body, pose)


class PnPResult(NamedTuple):
    pose: SE3
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(
    key: jax.Array,
    X: jnp.ndarray,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    thr: float = 1e-4,
    n_hyp: int = 256,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC PnP on (P, 3)/(P, 2) correspondences with validity mask.

    thr: squared reprojection threshold in normalized coords. Fewer
    candidates than the 6-point minimal sample returns ok=False instead of
    crashing.
    """
    p_count = mask.shape[0]
    if p_count < 6:
        return PnPResult(
            pose=SE3(jnp.eye(3), jnp.zeros(3)),
            inliers=jnp.zeros(p_count, bool),
            n_inliers=jnp.int32(0),
            ok=jnp.bool_(False),
        )
    from fastmatch_tpu.geometry.ransac import _sample_minimal_sets

    k6, k4 = jax.random.split(key)
    # Two hypothesis families scored together: 6-point DLT (general scenes)
    # and plane-homography pose (the DLT is rank-deficient on coplanar
    # points — every sample of a planar scene yields garbage without this).
    idx = _sample_minimal_sets(k6, mask, n_hyp // 2, 6)
    poses6 = pnp_dlt(X[idx], x[idx])
    idx4 = _sample_minimal_sets(k4, mask, n_hyp - n_hyp // 2, 4)
    poses4 = pnp_planar(X[idx4], x[idx4])
    poses = SE3(
        jnp.concatenate([poses6.R, poses4.R], axis=0),
        jnp.concatenate([poses6.t, poses4.t], axis=0),
    )

    def score(R, t):
        p = jnp.einsum("ij,pj->pi", R, X) + t
        err = jnp.sum((_project(p) - x) ** 2, -1)
        return (err < thr) & (p[:, 2] > 0) & mask

    inl = jax.vmap(score)(poses.R, poses.t)  # (K, P)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    pose = SE3(poses.R[best], poses.t[best])
    inliers = inl[best]
    # Iterated refine/rescore (see ransac.py): each GN round runs on the
    # current inlier set and is kept only if support doesn't drop, so the
    # result converges to the inlier LSQ pose instead of inheriting the
    # winning minimal sample's luck.
    for _ in range(2):
        cand = refine_pose_gn(pose, X, x, inliers.astype(jnp.float32), iters=8)
        cand_inl = score(cand.R, cand.t)
        better = jnp.sum(cand_inl) >= jnp.sum(inliers)
        pose = SE3(
            jnp.where(better, cand.R, pose.R),
            jnp.where(better, cand.t, pose.t),
        )
        inliers = jnp.where(better, cand_inl, inliers)
    n = jnp.sum(inliers)
    return PnPResult(pose=pose, inliers=inliers, n_inliers=n, ok=n >= min_inliers)
