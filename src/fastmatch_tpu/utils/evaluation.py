"""Trajectory evaluation: Umeyama similarity alignment and ATE (metric per
BASELINE.json:2 "ATE on benchmark sequences").

Monocular reconstructions are defined up to a similarity transform; ATE is
therefore computed after sim(3) alignment of estimated camera centers to
ground truth (the standard TUM-RGBD/KITTI evaluation protocol).
"""

from __future__ import annotations

import jax.numpy as jnp


def align_umeyama(X: jnp.ndarray, Y: jnp.ndarray, mask=None, with_scale: bool = True):
    """Least-squares similarity transform s, R, t minimizing |s R X + t - Y|.

    X, Y: (N, 3) point sets (estimated, ground truth). Returns (s, R, t).
    """
    if mask is None:
        w = jnp.ones(X.shape[0])
    else:
        w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mx = jnp.sum(X * w[:, None], 0) / wsum
    my = jnp.sum(Y * w[:, None], 0) / wsum
    Xc = (X - mx) * w[:, None]
    Yc = (Y - my) * w[:, None]
    C = Yc.T @ (X - mx) / wsum  # (3, 3) covariance
    U, D, Vt = jnp.linalg.svd(C)
    S = jnp.eye(3)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_x = jnp.sum(jnp.sum((X - mx) ** 2, -1) * w) / wsum
    s = jnp.where(
        with_scale, jnp.sum(D * jnp.diag(S)) / jnp.maximum(var_x, 1e-12), 1.0
    )
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(est_centers: jnp.ndarray, gt_centers: jnp.ndarray, mask=None):
    """RMSE of camera centers after sim(3) alignment. (N, 3) each."""
    s, R, t = align_umeyama(est_centers, gt_centers, mask)
    aligned = s * est_centers @ R.T + t
    err2 = jnp.sum((aligned - gt_centers) ** 2, -1)
    if mask is None:
        return jnp.sqrt(jnp.mean(err2))
    w = mask.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1e-9))
