"""Dense mapping over a sparse reconstruction: rectify + stereo-sweep
every selected frame pair, fuse depth maps into one world-frame cloud.

The product tie-in for dense/stereo.py: any engine output (reconstruct /
vo / slam — they all share the Reconstruction container's (R, t) and
sparse points) plus the original images yields a dense colored point
cloud. Pair selection, consistency gating, and voxel fusion live here;
the per-pair compute is the shift-sweep cost volume (dense/stereo.py).

Design notes:
- **Pair selection by baseline-to-depth ratio**: stereo needs enough
  parallax to resolve depth but small enough appearance change for ZNCC
  to correlate; pairs outside [min_ratio, max_ratio] of the sparse
  map's median depth are skipped (the sparse points are the scale
  oracle — no magic constants in world units).
- **Per-pair world fusion is closed-form**: rectified-frame points go
  through R_rect^T then the inverse pose of the left camera; fusion
  voxel-downsamples (round-to-grid + unique) to bound the cloud.
- The whole pass is embarrassingly parallel over pairs (one jit per
  image shape, reused across pairs).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fastmatch_tpu.dense.stereo import (StereoConfig, disparity_to_points,
                                        rectify_pair, stereo_disparity)


def select_pairs(R: np.ndarray, t: np.ndarray, median_depth: float,
                 max_step: int = 4, min_ratio: float = 0.02,
                 max_ratio: float = 0.35):
    """Frame pairs (i, j) whose baseline/median-depth ratio suits stereo.

    Greedy: for each i, the smallest step j = i+1..i+max_step whose ratio
    clears min_ratio (and stays under max_ratio) wins; frames with no
    usable partner contribute nothing (rotation-only spans).
    """
    F = R.shape[0]
    C = -np.einsum("fji,fj->fi", R, t)
    pairs = []
    for i in range(F - 1):
        for j in range(i + 1, min(i + 1 + max_step, F)):
            ratio = np.linalg.norm(C[j] - C[i]) / max(median_depth, 1e-9)
            if ratio >= min_ratio:
                if ratio <= max_ratio:
                    pairs.append((i, j))
                break
    return pairs


def densify(images, R: np.ndarray, t: np.ndarray, K: np.ndarray,
            sparse_points: np.ndarray | None = None,
            pairs: list | None = None,
            cfg: StereoConfig = StereoConfig(),
            stride: int = 2, voxel: float | None = None,
            max_depth_factor: float = 4.0):
    """images: (F, H, W) [0,1] grayscale (indexable); R/t: (F, 3, 3)/(F, 3)
    world->camera; K: (3, 3). Returns (points (N, 3) world, intensity
    (N,), report dict).

    ``voxel``: fusion grid size in world units (default: median scene
    depth / 200). ``max_depth_factor``: drop stereo depths beyond this
    multiple of the median sparse depth (distant low-parallax noise).
    """
    R = np.asarray(R)
    t = np.asarray(t)
    F = R.shape[0]
    if sparse_points is not None and len(sparse_points):
        # median depth of the sparse map over all cameras that see it
        z = []
        for f in range(F):
            zf = (np.asarray(sparse_points) @ R[f].T + t[f])[:, 2]
            z.append(zf[zf > 0])
        med_depth = float(np.median(np.concatenate(z))) if z else 1.0
    else:
        med_depth = 1.0
    if pairs is None:
        pairs = select_pairs(R, t, med_depth)
    if voxel is None:
        voxel = med_depth / 200.0

    all_pts, all_int = [], []
    used = 0
    for i, j in pairs:
        R_ab = R[j] @ R[i].T
        t_ab = t[j] - R_ab @ t[i]
        try:
            ra, rb, info = rectify_pair(jnp.asarray(images[i]),
                                        jnp.asarray(images[j]), K, R_ab, t_ab)
        except ValueError:
            continue
        disp, valid = stereo_disparity(ra, rb, cfg)
        pts_r, inten = disparity_to_points(
            disp, valid, K, info["baseline"], image=np.asarray(ra),
            stride=stride, max_depth=max_depth_factor * med_depth)
        if len(pts_r) == 0:
            continue
        # rectified-a frame -> camera-a frame -> world
        Rr = info["R_rect_a"]
        pts_a = pts_r @ Rr          # (Rr^T @ pts^T)^T
        pts_w = (pts_a - t[i]) @ R[i]
        all_pts.append(pts_w)
        all_int.append(inten)
        used += 1
    if not all_pts:
        return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                dict(pairs_used=0, pairs_considered=len(pairs)))
    pts = np.concatenate(all_pts).astype(np.float32)
    inten = np.concatenate(all_int).astype(np.float32)
    # voxel fusion: one representative point per occupied cell
    if voxel > 0:
        cells = np.round(pts / voxel).astype(np.int64)
        _, keep = np.unique(cells, axis=0, return_index=True)
        pts, inten = pts[keep], inten[keep]
    return pts, inten, dict(pairs_used=used, pairs_considered=len(pairs),
                            n_points=int(len(pts)), voxel=voxel,
                            median_depth=med_depth)
