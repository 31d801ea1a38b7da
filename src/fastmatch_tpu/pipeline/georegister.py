"""Georegistration: pin a monocular map to GPS (or any absolute-position
measurements).

Monocular SLAM output lives in an arbitrary sim(3) gauge (the bootstrap
fixes |t_01| = 1, orientation and origin follow frame 0). GPS supplies
camera-center measurements in a metric world frame. The product post-pass
here has three stages:

1. **sim(3) alignment** (Umeyama over the measured frames): resolves the
   7 gauge freedoms — the one thing the pose-graph CANNOT do, because its
   SE(3) state has no scale variable. Applied to the whole map (poses,
   points) with the camera-frame metric rescaled consistently
   (x_cam' = s * x_cam).
2. **GPS-anchored pose-graph refinement**: odometry edges from the
   aligned trajectory + position priors at the measured frames
   (posegraph/pgo.py prior factors), robust ``prior_delta`` kernel as the
   GPS-outlier defense, no fixed poses (>= 3 non-collinear priors anchor
   the gauge). This bends the trajectory between GPS fixes where step 1's
   rigid transform cannot.
3. **Anchored global BA**: re-polish structure against the corrected
   poses, holding the GPS-measured frames fixed so the bundle cannot
   drift the absolute frame away (BA has no position priors; its gauge
   is held by the anchors chosen here).

CLI: ``slam/reconstruct ... --gps gps.npz [--gps-weight W --gps-delta D]``
where the npz holds ``frames`` (sequence indices, int) and ``xyz``
((K, 3) world camera centers).

No reference counterpart (2D matching research repo) — north-star
city-scale completeness (BASELINE.json:12's mapping product consumes
GPS-tagged capture in any production deployment).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.utils.evaluation import align_umeyama


def apply_sim3(rec, s: float, R: np.ndarray, t: np.ndarray) -> None:
    """In-place similarity transform of a Reconstruction: world points
    X' = s R X + t; poses R_i' = R_i R^T, t_i' = s t_i - R_i R^T t (so
    camera coordinates rescale by s — the consistent monocular metric
    change, x_cam' = s x_cam)."""
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    live = rec.pose_mask
    RiRT = np.einsum("fij,kj->fik", rec.R[live].astype(np.float64), R)
    rec.t[live] = (s * rec.t[live].astype(np.float64)
                   - np.einsum("fij,j->fi", RiRT, t)).astype(np.float32)
    rec.R[live] = RiRT.astype(np.float32)
    pm = rec.pt_mask
    rec.points[pm] = (s * rec.points[pm].astype(np.float64) @ R.T
                      + t).astype(np.float32)


def georegister(rec, gps_frames, gps_xyz, cfg,
                weight: float = 10.0, prior_delta: float | None = None,
                pgo_iters: int = 40, frame_seq=None, metrics=None):
    """Pin ``rec`` (modified in place) to GPS camera-center measurements.

    ``gps_frames``: sequence indices the measurements belong to;
    ``frame_seq``: rec's frame-id <- sequence-index mapping (SlamResult
    .frame_seq; identity when None, e.g. reconstruct() output where every
    frame is kept). Measurements for untracked frames are dropped.
    Returns a summary dict (rmse before/after, n_used).
    """
    from fastmatch_tpu.ba.lm import ba_solve
    from fastmatch_tpu.posegraph.pgo import (PoseGraph, pgo_solve,
                                             with_position_priors)

    gps_frames = np.asarray(gps_frames, np.int64)
    gps_xyz = np.asarray(gps_xyz, np.float32)
    # Empty/None frame_seq = identity mapping (the host engine keeps
    # every frame and leaves SlamResult.frame_seq unpopulated).
    if frame_seq:
        fid_of = {fi: fid for fid, fi in enumerate(frame_seq)}
        keep = np.array([fi in fid_of for fi in gps_frames], bool)
        fids = np.array([fid_of[fi] for fi in gps_frames[keep]], np.int64)
        gps_xyz = gps_xyz[keep]
    else:
        keep = gps_frames < rec.n_frames
        fids = gps_frames[keep]
        gps_xyz = gps_xyz[keep]
    if fids.size < 3:
        raise ValueError(
            f"georegister needs >= 3 GPS fixes on tracked frames, got "
            f"{fids.size}")

    def centers():
        live = rec.R[fids]
        return -np.einsum("fji,fj->fi", live, rec.t[fids])

    # 1. sim(3) alignment (rigid + scale; resolves what PGO cannot).
    # Trimmed re-alignment: Umeyama is L2 — one gross GPS outlier bends
    # the whole transform, after which EVERY prior residual is large and
    # a redescending prior kernel would (correctly, and uselessly)
    # downweight all of them. Two trim rounds at 3x the median residual
    # restore the inlier alignment; the PGO's robust kernel then has only
    # the true outlier left to reject.
    C0 = centers()
    mask = np.ones(fids.shape[0], bool)
    for _ in range(3):
        s, Ra, ta = align_umeyama(jnp.asarray(C0), jnp.asarray(gps_xyz),
                                  mask=jnp.asarray(mask))
        aligned = float(s) * C0 @ np.asarray(Ra).T + np.asarray(ta)
        res = np.linalg.norm(aligned - gps_xyz, axis=-1)
        med = np.median(res[mask])
        new_mask = res <= max(3.0 * med, 1e-9)
        if new_mask.sum() < 3 or new_mask.all() or (new_mask == mask).all():
            break
        mask = new_mask
    apply_sim3(rec, float(s), np.asarray(Ra), np.asarray(ta))
    rmse_aligned = float(np.sqrt(np.mean(
        np.sum((centers() - gps_xyz) ** 2, -1))))

    # 2. GPS-anchored pose-graph refinement over the aligned trajectory.
    n = rec.R.shape[0]
    live_ids = np.nonzero(rec.pose_mask)[0]
    ei = live_ids[1:]
    ej = live_ids[:-1]
    Ti = SE3(jnp.asarray(rec.R[ei]), jnp.asarray(rec.t[ei]))
    Tj = SE3(jnp.asarray(rec.R[ej]), jnp.asarray(rec.t[ej]))
    Z = Ti.compose(Tj.inverse())
    g = PoseGraph(
        poses=SE3(jnp.asarray(rec.R), jnp.asarray(rec.t)),
        edge_i=jnp.asarray(ei.astype(np.int32)),
        edge_j=jnp.asarray(ej.astype(np.int32)),
        Z=Z,
        edge_weight=jnp.ones(ei.shape[0], jnp.float32),
        pose_mask=jnp.asarray(rec.pose_mask),
        fixed=jnp.zeros(n, bool),
    )
    g = with_position_priors(g, fids, gps_xyz,
                             weight * np.ones(fids.shape[0], np.float32))
    res = pgo_solve(g, max_iters=pgo_iters, prior_delta=prior_delta,
                    kernel="geman" if prior_delta else "huber")
    rec.R = np.array(res.poses.R)
    rec.t = np.array(res.poses.t)

    # 3. Anchored global BA (GPS frames fixed hold the absolute frame).
    fixed = np.zeros(n, bool)
    fixed[fids] = True
    prob = rec.ba_problem()._replace(
        fixed_cams=jnp.asarray(fixed & rec.pose_mask))
    from fastmatch_tpu.pipeline.tracker import compact_obs, obs_bucket

    prob = compact_obs(prob, obs_bucket(rec.n_obs, prob.obs.mask.shape[0]))
    ba = ba_solve(prob, max_iters=cfg.ba.max_iters,
                  pcg_iters=cfg.ba.pcg_iters,
                  huber_delta_static=cfg.ba.huber_px / float(rec.camera.fx))
    rec.R = np.array(ba.poses.R)
    rec.t = np.array(ba.poses.t)
    rec.points = np.array(ba.points)

    rmse_final = float(np.sqrt(np.mean(
        np.sum((centers() - gps_xyz) ** 2, -1))))
    summary = {
        "n_gps": int(fids.size),
        "scale": float(s),
        "rmse_aligned": round(rmse_aligned, 6),
        "rmse_final": round(rmse_final, 6),
        "pgo_iters": int(res.iters),
    }
    if metrics:
        metrics.log("georegister", **summary)
    return summary
