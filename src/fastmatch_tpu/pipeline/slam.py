"""SLAM: local-window tracking + loop closure + pose-graph correction
(component T21's ``slam`` entry; BASELINE.json config 4).

Differences from pipeline/reconstruct.py (offline SfM):

- **Local mapping**: PnP tracks against only the landmarks seen within the
  last ``window`` frames, and periodic BA freezes everything outside the
  window — odometry drifts like a real front-end.
- **Loop-closure detection** reuses the matcher as a retrieval engine: the
  current frame's descriptors query the stacked descriptor bank of all
  older frames (the big-bank query the ring-sharded matcher exists for;
  chunked kernel path beyond the VMEM-resident limit), match votes are
  segment-counted per frame, and a candidate above threshold and outside a
  recency gap is geometrically verified by PnP against the candidate's own
  landmarks.
- **Correction**: verified closures become pose-graph edges (odometry edges
  recorded at tracking time) solved with the redescending Geman-McClure
  kernel (posegraph/pgo.py), after which the map is re-refined by global BA.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.geometry.pnp import ransac_pnp
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import (
    Reconstruction,
    _known_in_map,
    _match,
    _normalize,
    _pad_for_ransac,
    _triangulate_two_view,
)
from fastmatch_tpu.posegraph.pgo import PoseGraph, pgo_solve


@dataclass(frozen=True)
class SlamConfig:
    window: int = 8               # local-map frame window for tracking/BA
    loop_gap: int = 12            # min frame separation for a loop candidate
    loop_min_votes: int = 25      # descriptor-match votes to consider a loop
    loop_kernel_delta: float = 0.1  # geman kernel width for PGO
    pgo_iters: int = 40
    # Keyframe selection (T21): a frame becomes a keyframe (contributes
    # observations + new landmarks) when tracking weakens below
    # ``kf_tracked_thresh`` PnP inliers or ``kf_max_gap`` frames passed
    # since the last keyframe. 0 = every frame is a keyframe (default,
    # the dense-mapping behavior).
    kf_tracked_thresh: int = 0
    kf_max_gap: int = 5
    # Covisibility-gated local BA (device engine only): frames sharing >=
    # this many PnP-inlier landmarks with the current frame stay free in
    # interval BA regardless of age; 0 = time-window selection.
    ba_covis_thresh: int = 0


@dataclass
class SlamResult:
    rec: Reconstruction
    loop_edges: list = field(default_factory=list)   # (frame, candidate)
    pgo_runs: int = 0
    odo_edges: list = field(default_factory=list)    # (i, j, Z R, Z t)
    # Map from state frame id -> input sequence index. The host path
    # accepts every frame (or raises), so it is the identity; the
    # device path (slam_device) skips frames that fail relocalization,
    # and evaluation must align trajectories through this.
    frame_seq: list = field(default_factory=list)


def _np(x):
    return np.array(x)


def slam(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig = PipelineConfig(),
    scfg: SlamConfig = SlamConfig(),
    seed: int = 0,
    metrics=None,
) -> SlamResult:
    """Run online SLAM over a feature sequence (same feature format as
    reconstruct). Returns the corrected map and loop/odometry bookkeeping.
    ``metrics``: optional utils.metrics.MetricsLogger (per-frame tracking
    counters, loop-closure and PGO events)."""
    rec = Reconstruction(cfg=cfg, camera=camera)
    out = SlamResult(rec=rec)
    key = jax.random.PRNGKey(seed)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2
    kp_landmark = [np.full(f[0].shape[0], -1, np.int64) for f in features]
    pt_last_seen = np.full(rec.pt_mask.shape[0], -(10**9), np.int64)

    def local_pt_mask(f):
        return rec.pt_mask & (pt_last_seen >= f - scfg.window)

    def run_local_ba(f):
        # Freeze cameras outside the window and the first two (gauge).
        prob = rec.ba_problem()
        fixed = _np(prob.fixed_cams)
        idx = np.arange(rec.pose_mask.shape[0])
        fixed |= rec.pose_mask & (idx < f - scfg.window)
        prob = prob._replace(
            fixed_cams=jnp.asarray(fixed),
            pt_mask=jnp.asarray(local_pt_mask(f)),
        )
        from fastmatch_tpu.ba.lm import ba_solve

        res = ba_solve(
            prob,
            max_iters=cfg.ba.max_iters,
            pcg_iters=cfg.ba.pcg_iters,
            huber_delta_static=cfg.ba.huber_px / float(camera.fx),
        )
        rec.R = _np(res.poses.R)
        rec.t = _np(res.poses.t)
        rec.points = _np(res.points)

    # ---- bootstrap (frames 0, 1): same as reconstruct ----
    xy0, d0, m0 = features[0]
    xy1, d1, m1 = features[1]
    rec.pose_mask[0] = True
    valid, idx = _match(d1, m1, d0, m0, cfg)
    q = np.where(valid)[0]
    tr = idx[q]
    x1n = _normalize(xy1[q], camera)
    x0n = _normalize(xy0[tr], camera)
    key, k1 = jax.random.split(key)
    x0p, x1p, bmask = _pad_for_ransac(
        [x0n.astype(np.float32), x1n.astype(np.float32)], len(q))
    res = ransac_essential(
        k1, jnp.asarray(x0p), jnp.asarray(x1p), jnp.asarray(bmask),
        thr=thr_n, n_hyp=cfg.ransac.n_hyp,
        min_inliers=cfg.ransac.min_inliers,
    )
    if not bool(res.ok):
        raise RuntimeError("SLAM bootstrap failed")
    rec.R[1] = _np(res.R)
    rec.t[1] = _np(res.t)
    rec.pose_mask[1] = True
    rec.n_frames = 2
    inl = np.asarray(res.inliers)[: len(q)]
    pts, keep = _triangulate_two_view(rec, 0, 1, x0n[inl], x1n[inl],
                                      cfg.map.min_parallax_deg)
    qi, ti = q[inl][keep], tr[inl][keep]
    ids = rec.add_points(pts[keep], d1[qi])
    rec.add_observations(0, ids, x0n[inl][keep])
    rec.add_observations(1, ids, x1n[inl][keep])
    kp_landmark[1][qi] = ids
    kp_landmark[0][ti] = ids
    pt_last_seen[ids] = 1
    # Refine the two-view seed immediately (reconstruct.py does the same):
    # the RANSAC pose carries sampler-draw luck — measured up to ~3x spread
    # in translation direction on identical inputs — and every later PnP
    # localizes against this map, so un-refined seed error compounds into
    # tracking loss within a few frames.
    if cfg.ba.interval:
        rec.run_ba(free_second_cam=True)
    Z = SE3(jnp.asarray(rec.R[1]), jnp.asarray(rec.t[1]))  # T_1 T_0^-1 (T_0 = I)
    out.odo_edges.append((1, 0, _np(Z.R), _np(Z.t)))

    # ---- main loop ----
    last_kf = 1
    for f in range(2, len(features)):
        xyf, df, mf = features[f]
        # Track against the LOCAL map only.
        lmask = local_pt_mask(f)
        valid, idx = _match(df, mf, rec.pt_desc, lmask, cfg)
        q = np.where(valid)[0]
        lm = idx[q]
        xfn = _normalize(xyf[q], camera)
        key, k2 = jax.random.split(key)
        Xp, xp, pmask = _pad_for_ransac(
            [rec.points[lm].astype(np.float32), xfn.astype(np.float32)],
            len(q))
        pn = ransac_pnp(
            k2, jnp.asarray(Xp), jnp.asarray(xp), jnp.asarray(pmask),
            thr=thr_n,
            n_hyp=max(cfg.ransac.n_hyp // 2, 64),
            min_inliers=max(cfg.ransac.min_inliers // 2, 6),
        )
        if not bool(pn.ok):
            raise RuntimeError(
                f"SLAM tracking lost at frame {f} "
                f"({int(pn.n_inliers)} inliers of {len(q)} matches, "
                f"need {max(cfg.ransac.min_inliers // 2, 6)})"
            )
        prevR, prevt = rec.R[f - 1].copy(), rec.t[f - 1].copy()
        rec.R[f] = _np(pn.pose.R)
        rec.t[f] = _np(pn.pose.t)
        rec.pose_mask[f] = True
        rec.n_frames = f + 1
        inl = np.asarray(pn.inliers)[: len(q)]
        is_kf = (
            scfg.kf_tracked_thresh <= 0
            or int(inl.sum()) < scfg.kf_tracked_thresh
            or (f - last_kf) >= scfg.kf_max_gap
        )
        if is_kf:
            last_kf = f
            rec.add_observations(f, lm[inl], xfn[inl])
        # Tracking associations are recorded unconditionally: the next
        # keyframe must not treat this frame's tracked keypoints as "free"
        # and re-triangulate duplicates of mapped landmarks.
        kp_landmark[f][q[inl]] = lm[inl]
        pt_last_seen[lm[inl]] = f
        # Odometry edge recorded at tracking time: Z = T_f T_{f-1}^-1.
        Tf = SE3(jnp.asarray(rec.R[f]), jnp.asarray(rec.t[f]))
        Tp = SE3(jnp.asarray(prevR), jnp.asarray(prevt))
        Z = Tf.compose(Tp.inverse())
        out.odo_edges.append((f, f - 1, _np(Z.R), _np(Z.t)))
        if metrics:
            metrics.log("track", frame=f, n_candidates=len(q),
                        n_inliers=int(inl.sum()), keyframe=bool(is_kf),
                        n_points=int(rec.pt_mask.sum()))

        # New landmarks vs previous frame (keyframes only: non-keyframes
        # track and localize but do not grow the map).
        xyp, dp, mp = features[f - 1]
        free_prev = mp & (kp_landmark[f - 1] < 0)
        free_cur = mf.copy()
        free_cur[q[inl]] = False
        if is_kf:
            # Exclude keypoints near ANY mapped landmark descriptor (not
            # just the local tracking window): window-expired landmarks
            # would otherwise be re-triangulated as duplicates on every
            # revisit. Absolute-distance gate, see MapConfig.dedup_desc_d2.
            free_cur &= ~_known_in_map(df, free_cur, rec, cfg)
            valid2, idx2 = _match(df, free_cur, dp, free_prev, cfg)
            q2 = np.where(valid2 & (kp_landmark[f] < 0))[0]
        else:
            q2 = np.zeros(0, np.int64)
            idx2 = np.zeros(0, np.int64)
        t2 = idx2[q2]
        if len(q2):
            xcn = _normalize(xyf[q2], camera)
            xpn = _normalize(xyp[t2], camera)
            pts, keep = _triangulate_two_view(rec, f - 1, f, xpn, xcn,
                                              cfg.map.min_parallax_deg)
            for (R_, t_), xn in (((rec.R[f - 1], rec.t[f - 1]), xpn),
                                 ((rec.R[f], rec.t[f]), xcn)):
                p = pts @ R_.T + t_
                zp = np.maximum(p[:, 2:3], 1e-9)
                keep &= np.sum((p[:, :2] / zp - xn) ** 2, -1) < thr_n
            if keep.any():
                ids = rec.add_points(pts[keep], df[q2[keep]])
                rec.add_observations(f - 1, ids, xpn[keep])
                rec.add_observations(f, ids, xcn[keep])
                kp_landmark[f][q2[keep]] = ids
                kp_landmark[f - 1][t2[keep]] = ids
                pt_last_seen[ids] = f

        # ---- loop-closure detection ----
        closed = False
        n_old = f - scfg.loop_gap
        if n_old >= 1:
            # Retrieval: query current descriptors against the stacked bank
            # of all old frames; vote per frame.
            bank_desc = np.concatenate([features[k][1] for k in range(n_old)])
            bank_mask = np.concatenate([features[k][2] for k in range(n_old)])
            per = features[0][1].shape[0]
            valid3, idx3 = _match(df, mf, bank_desc, bank_mask, cfg)
            src = idx3[valid3] // per  # frame votes
            if len(src):
                votes = np.bincount(src, minlength=n_old)
                # Keyframe-gated runs: the top-voted frame may carry no
                # observations (non-keyframe); fall back through the vote
                # ranking to the best candidate that has mapped landmarks.
                cand = -1
                for c in np.argsort(-votes)[:4]:
                    if votes[c] < scfg.loop_min_votes:
                        break
                    has_obs = np.any(rec.obs_cam[: rec.n_obs] == c)
                    if has_obs:
                        cand = int(c)
                        break
                if cand >= 0:
                    # Geometric verification: PnP against landmarks observed
                    # by the candidate frame.
                    obs_of_c = (rec.obs_cam[: rec.n_obs] == cand)
                    lm_c = np.unique(rec.obs_pt[: rec.n_obs][obs_of_c])
                    lm_c = lm_c[rec.pt_mask[lm_c]]
                    if len(lm_c) >= 12:
                        v4, i4 = _match(df, mf, rec.pt_desc,
                                        np.isin(np.arange(rec.pt_mask.shape[0]),
                                                lm_c) & rec.pt_mask, cfg)
                        q4 = np.where(v4)[0]
                        if len(q4) >= 12:
                            key, k4 = jax.random.split(key)
                            x4 = _normalize(xyf[q4], camera)
                            X4p, x4p, m4 = _pad_for_ransac(
                                [rec.points[i4[q4]].astype(np.float32),
                                 x4.astype(np.float32)], len(q4))
                            pl = ransac_pnp(
                                k4, jnp.asarray(X4p), jnp.asarray(x4p),
                                jnp.asarray(m4), thr=thr_n,
                                n_hyp=256, min_inliers=10,
                            )
                            if bool(pl.ok):
                                Tf_loop = pl.pose
                                Tc = SE3(jnp.asarray(rec.R[cand]),
                                         jnp.asarray(rec.t[cand]))
                                Zl = Tf_loop.compose(Tc.inverse())
                                out.loop_edges.append(
                                    (f, cand, _np(Zl.R), _np(Zl.t))
                                )
                                if metrics:
                                    metrics.log("loop_closure", frame=f,
                                                candidate=cand,
                                                inliers=int(pl.n_inliers))
                                _run_pgo_and_refine(rec, out, f, scfg, cfg, camera)
                                closed = True
        if cfg.ba.interval and (f % cfg.ba.interval == 0) and not closed:
            run_local_ba(f)

    rec.run_ba()
    return out


def _run_pgo_and_refine(rec, out, f, scfg, cfg, camera):
    """Build the pose graph from recorded odometry + loop edges, solve, write
    poses back, then globally bundle-adjust."""
    n = rec.pose_mask.shape[0]
    ei, ej, ZR, Zt, w = [], [], [], [], []
    for (i, j, R_, t_) in out.odo_edges:
        ei.append(i); ej.append(j); ZR.append(R_); Zt.append(t_); w.append(1.0)
    for (i, j, R_, t_) in out.loop_edges:
        ei.append(i); ej.append(j); ZR.append(R_); Zt.append(t_); w.append(2.0)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    g = PoseGraph(
        poses=SE3(jnp.asarray(rec.R), jnp.asarray(rec.t)),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        Z=SE3(jnp.asarray(np.stack(ZR)), jnp.asarray(np.stack(Zt))),
        edge_weight=jnp.asarray(np.array(w, np.float32)),
        pose_mask=jnp.asarray(rec.pose_mask),
        fixed=jnp.asarray(fixed & rec.pose_mask),
    )
    res = pgo_solve(
        g, max_iters=scfg.pgo_iters,
        huber_delta_static=scfg.loop_kernel_delta, kernel="geman",
    )
    rec.R = _np(res.poses.R)
    rec.t = _np(res.poses.t)
    out.pgo_runs += 1
    rec.run_ba()
