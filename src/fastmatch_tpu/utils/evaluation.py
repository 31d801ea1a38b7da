"""Evaluation harness: match precision/recall vs ground-truth homographies,
plus trajectory ATE (Umeyama sim(3) alignment).

Two graded capabilities live here:

- **Match evaluation** — the reference's top layer (SURVEY.md §2.1/§3.1
  "Evaluation harness: precision/recall of matches vs ground truth over
  image-pair datasets"): a predicted match (a_i -> b_j) is correct when the
  ground-truth homography carries a_i to within ``tol`` pixels of b_j; recall
  is measured against the A-keypoints that *have* a ground-truth counterpart
  among the detected B-keypoints. All jnp + mask-aware, so it jits and vmaps
  over pair batches.
- **Trajectory ATE** (metric per BASELINE.json:2 "ATE on benchmark
  sequences"): monocular reconstructions are defined up to a similarity
  transform; ATE is computed after sim(3) alignment of estimated camera
  centers to ground truth (the standard TUM-RGBD/KITTI protocol).
"""

from __future__ import annotations

from typing import NamedTuple

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


def rpe_trans(est_centers: jnp.ndarray, gt_centers: jnp.ndarray,
              delta: int = 1):
    """Translational relative-pose error at frame distance ``delta``.

    Trajectories are sim(3)-aligned first (monocular gauge), then the
    per-step displacement vectors are compared:
    e_i = ||(c[i+d] - c[i]) - (g[i+d] - g[i])||. Returns (rmse, median) —
    the drift-rate metric complementing ate_rmse's absolute error.

    Raises ValueError unless 0 < delta < len(est_centers): outside that
    range the [delta:] slices are empty and the statistics would be NaN
    (which the CLI would then print as non-standard JSON).
    """
    n = int(est_centers.shape[0])
    if not 0 < delta < n:
        raise ValueError(
            f"rpe delta must be in [1, {n - 1}] for a {n}-frame "
            f"trajectory; got {delta}")
    s, R, t = align_umeyama(est_centers, gt_centers)
    a = s * est_centers @ R.T + t
    da = a[delta:] - a[:-delta]
    dg = gt_centers[delta:] - gt_centers[:-delta]
    err = jnp.linalg.norm(da - dg, axis=-1)
    return (jnp.sqrt(jnp.mean(err ** 2)), jnp.median(err))


def ate_rmse(est_centers: jnp.ndarray, gt_centers: jnp.ndarray, mask=None):
    """RMSE of camera centers after sim(3) alignment. (N, 3) each."""
    s, R, t = align_umeyama(est_centers, gt_centers, mask)
    aligned = s * est_centers @ R.T + t
    err2 = jnp.sum((aligned - gt_centers) ** 2, -1)
    if mask is None:
        return jnp.sqrt(jnp.mean(err2))
    w = mask.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1e-9))


# --------------------------------------------------------------------------
# Match evaluation vs ground-truth homography
# --------------------------------------------------------------------------


class MatchEval(NamedTuple):
    """Per-pair match quality vs a ground-truth homography.

    precision: correct / predicted matches (1.0 when nothing predicted).
    recall:    correct / A-keypoints that have a GT counterpart in B.
    n_correct, n_predicted, n_gt: the underlying counts (int32 scalars).
    """

    precision: jnp.ndarray
    recall: jnp.ndarray
    n_correct: jnp.ndarray
    n_predicted: jnp.ndarray
    n_gt: jnp.ndarray


def project_homography(H: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 homography to (N, 2) pixel coordinates."""
    ones = jnp.ones_like(xy[..., :1])
    p = jnp.concatenate([xy, ones], axis=-1) @ H.T
    w = jnp.where(jnp.abs(p[..., 2:3]) < 1e-12, 1e-12, p[..., 2:3])
    return p[..., :2] / w


def match_precision_recall(
    xy_a: jnp.ndarray,
    mask_a: jnp.ndarray,
    xy_b: jnp.ndarray,
    mask_b: jnp.ndarray,
    match_idx: jnp.ndarray,
    match_valid: jnp.ndarray,
    H_ab: jnp.ndarray,
    tol: float = 3.0,
) -> MatchEval:
    """Score predicted matches against a ground-truth homography A->B.

    xy_a (Ca, 2) / xy_b (Cb, 2) with masks; match_idx/match_valid are the
    ``Matches`` fields for A-against-B. A match is *correct* iff
    ``|H_ab . xy_a[i] - xy_b[match_idx[i]]| <= tol`` px. An A-keypoint *has
    ground truth* iff some live B-keypoint lies within tol of its projection
    (the standard repeatability denominator, computed over detected points so
    detector misses don't count against the matcher).
    """
    proj = project_homography(H_ab, xy_a)  # (Ca, 2)
    tgt = xy_b[match_idx]
    err = jnp.linalg.norm(proj - tgt, axis=-1)
    correct = match_valid & mask_a & (err <= tol)

    # GT existence: min distance from each projected A-keypoint to any live B.
    d2 = jnp.sum((proj[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(mask_b[None, :], d2, jnp.inf)
    has_gt = mask_a & (jnp.min(d2, axis=1) <= tol * tol)

    n_correct = jnp.sum(correct).astype(jnp.int32)
    n_pred = jnp.sum(match_valid & mask_a).astype(jnp.int32)
    n_gt = jnp.sum(has_gt).astype(jnp.int32)
    # Zero-denominator cases are NaN, not 1.0: a pair where nothing was
    # predicted (or nothing has ground truth) carries no evidence and must
    # not inflate aggregate means (evaluate_pairs excludes NaNs and counts
    # the degenerate pairs separately).
    nan = jnp.float32(jnp.nan)
    precision = jnp.where(n_pred > 0, n_correct / jnp.maximum(n_pred, 1), nan)
    recall = jnp.where(n_gt > 0, n_correct / jnp.maximum(n_gt, 1), nan)
    return MatchEval(precision, recall, n_correct, n_pred, n_gt)


def match_agreement(
    idx_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    idx_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of query slots where two matchers made the same decision —
    the >=99% agreement gate (BASELINE.json:5) between backends/shardings:
    both invalid counts as agreement; both valid requires equal indices.

    Pass the query container's ``mask`` on padded inputs: dead slots are
    invalid in BOTH matchers and would otherwise count as agreement,
    inflating the gate (e.g. 300 live keypoints in a 2048-capacity
    container contribute only 15% of the unmasked average)."""
    both_valid = valid_a & valid_b
    agree = jnp.where(
        both_valid, idx_a == idx_b, jnp.logical_not(valid_a ^ valid_b)
    ).astype(jnp.float32)
    if mask is None:
        return jnp.mean(agree)
    w = mask.astype(jnp.float32)
    return jnp.sum(agree * w) / jnp.maximum(jnp.sum(w), 1.0)
