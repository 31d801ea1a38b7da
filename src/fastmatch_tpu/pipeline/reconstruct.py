"""Incremental SfM pipeline (component T21; BASELINE.json config 3).

Architecture: a host-side orchestrator owning a fixed-capacity map (numpy
bookkeeping) that dispatches the heavy stages as jitted device computations —
detection (features/), matching (kernels/), RANSAC pose (geometry/), and
Schur-reduced LM refinement (ba/). Every device computation has static
shapes; the map's dynamic growth lives in host-side masks and counters.

Flow per sequence:
  frame 0      : detect, anchor pose = identity
  frame 1      : match vs frame 0 -> essential RANSAC -> triangulate (scale
                 gauge: |t| = 1)
  frame f >= 2 : match vs landmark descriptor bank -> RANSAC PnP ->
                 new-landmark triangulation vs frame f-1 (parallax-gated)
  every N      : bundle-adjust all live cameras/points (first two fixed)

Every frame is kept as a keyframe in this round; the loop-closure /
keyframe-selection variant lives in the SLAM layer (posegraph/, dist/).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.ba.lm import ba_solve
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.geometry.homography import select_two_view_model
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.geometry.pnp import ransac_pnp
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.matching.matcher import match_pair
from fastmatch_tpu.pipeline.config import PipelineConfig


@dataclass
class Reconstruction:
    """Host-side map state + trajectory output."""

    cfg: PipelineConfig
    camera: Pinhole
    R: np.ndarray = None          # (F_cap, 3, 3) world->cam
    t: np.ndarray = None          # (F_cap, 3)
    pose_mask: np.ndarray = None  # (F_cap,)
    points: np.ndarray = None     # (P_cap, 3)
    pt_mask: np.ndarray = None
    pt_desc: np.ndarray = None    # (P_cap, desc_dim) landmark descriptor bank
    obs_cam: np.ndarray = None
    obs_pt: np.ndarray = None
    obs_uv: np.ndarray = None
    obs_mask: np.ndarray = None
    n_frames: int = 0
    n_points: int = 0
    n_obs: int = 0
    frame_stats: list = field(default_factory=list)

    def __post_init__(self):
        m = self.cfg.map
        self.R = np.tile(np.eye(3, dtype=np.float32), (m.max_frames, 1, 1))
        self.t = np.zeros((m.max_frames, 3), np.float32)
        self.pose_mask = np.zeros(m.max_frames, bool)
        self.points = np.zeros((m.max_points, 3), np.float32)
        self.pt_mask = np.zeros(m.max_points, bool)
        self.pt_desc = np.zeros((m.max_points, m.desc_dim), np.float32)
        self.obs_cam = np.zeros(m.max_obs, np.int32)
        self.obs_pt = np.zeros(m.max_obs, np.int32)
        self.obs_uv = np.zeros((m.max_obs, 2), np.float32)
        self.obs_mask = np.zeros(m.max_obs, bool)

    # -- helpers ----------------------------------------------------------
    def camera_centers(self) -> np.ndarray:
        live = self.pose_mask
        return -np.einsum("fji,fj->fi", self.R[live], self.t[live])

    def add_observations(self, cam: int, pt_ids: np.ndarray, uv: np.ndarray):
        k = len(pt_ids)
        if k == 0:
            return
        s = self.n_obs
        if s + k > self.obs_mask.shape[0]:
            raise RuntimeError("observation capacity exceeded")
        self.obs_cam[s : s + k] = cam
        self.obs_pt[s : s + k] = pt_ids
        self.obs_uv[s : s + k] = uv
        self.obs_mask[s : s + k] = True
        self.n_obs += k

    def add_points(self, xyz: np.ndarray, desc: np.ndarray) -> np.ndarray:
        k = xyz.shape[0]
        s = self.n_points
        if s + k > self.pt_mask.shape[0]:
            raise RuntimeError("point capacity exceeded")
        ids = np.arange(s, s + k, dtype=np.int32)
        self.points[ids] = xyz
        self.pt_desc[ids] = desc
        self.pt_mask[ids] = True
        self.n_points += k
        return ids

    def ba_problem(self) -> BAProblem:
        fixed = np.zeros_like(self.pose_mask)
        fixed[:2] = True
        return BAProblem(
            poses=SE3(jnp.asarray(self.R), jnp.asarray(self.t)),
            points=jnp.asarray(self.points),
            obs=Observations(
                jnp.asarray(self.obs_cam),
                jnp.asarray(self.obs_pt),
                jnp.asarray(self.obs_uv),
                jnp.asarray(self.obs_mask),
            ),
            cam_mask=jnp.asarray(self.pose_mask),
            pt_mask=jnp.asarray(self.pt_mask),
            fixed_cams=jnp.asarray(fixed & self.pose_mask),
        )

    def run_ba(self, free_second_cam: bool = False):
        """Global BA. ``free_second_cam`` is for the two-view SEED refit:
        with both gauge cameras fixed (the default), BA can only move
        points and a bootstrap pose error is frozen in — measured to be
        exactly what starves frame-2 PnP on planar scenes, where the
        homography pose's translation direction carries ~3x the essential
        path's noise. Freeing camera 1 (camera 0 alone fixes the frame;
        LM damping handles the scale gauge) and renormalizing |t1| to 1
        afterwards recovers it."""
        cfg = self.cfg.ba
        thr = self.cfg.ba.huber_px / float(self.camera.fx)
        prob = self.ba_problem()
        if free_second_cam:
            fixed = np.zeros_like(self.pose_mask)
            fixed[:1] = True
            prob = prob._replace(fixed_cams=jnp.asarray(fixed & self.pose_mask))
        # Bucket-compact the observation table to the live count: BA cost
        # scales with the TABLE size, and this host-level solve otherwise
        # pays for max_obs rows of padding (measured 1.15 s -> ~0.3 s for
        # the two-frame bootstrap solve at 131072-row capacity).
        from fastmatch_tpu.pipeline.tracker import compact_obs, obs_bucket

        prob = compact_obs(prob, obs_bucket(self.n_obs,
                                            prob.obs.mask.shape[0]))
        res = ba_solve(
            prob,
            max_iters=cfg.max_iters,
            pcg_iters=cfg.pcg_iters,
            huber_delta_static=thr,
        )
        # np.array (copy): zero-copy views of jax arrays are read-only and
        # the map state must stay host-mutable.
        self.R = np.array(res.poses.R)
        self.t = np.array(res.poses.t)
        self.points = np.array(res.points)
        if free_second_cam:
            # Restore the monocular scale gauge |t1| = 1 (X -> X/s with
            # t -> t/s leaves every projection unchanged).
            s = float(np.linalg.norm(self.t[1]))
            if s > 1e-9:
                self.t[self.pose_mask] /= s
                self.points[self.pt_mask] /= s
        return float(res.cost0), float(res.cost)


def _normalize(uv_px: np.ndarray, cam: Pinhole) -> np.ndarray:
    """Pixels -> normalized coords for any camera model (host path);
    shared implementation in core/camera.normalize_np."""
    from fastmatch_tpu.core.camera import normalize_np

    return normalize_np(uv_px, cam)


def _pad_for_ransac(arrs, n: int, bucket: int | None = None):
    """Host-side shape bucketing for the jitted RANSAC/PnP calls.

    Pads each array (first axis length n) to the next multiple of
    ``bucket`` and returns (*padded, mask). Without this every frame's
    match count is a fresh shape — a fresh XLA compile per frame (minutes
    each through the TPU relay) — while masked semantics are identical
    (samplers and scoring honor the mask).

    Default bucket: 256 on TPU, 1 (no padding) elsewhere. Padding changes
    the Gumbel sampler's draw (the noise tensor is shape-dependent), which
    is statistically neutral but yields a different — occasionally worse —
    RANSAC lottery on marginal scenes; CPU runs keep the historical
    stream, and TPU runs trade it for compile-once behavior (the iterated
    refit in each estimator absorbs most of the draw-to-draw spread).
    """
    if bucket is None:
        bucket = 256 if jax.default_backend() == "tpu" else 1
    m = max(bucket, -(-n // bucket) * bucket)
    out = []
    for a in arrs:
        pad = np.zeros((m - n,) + a.shape[1:], a.dtype)
        out.append(np.concatenate([a, pad], axis=0))
    mask = np.zeros(m, bool)
    mask[:n] = True
    return (*out, mask)


def _to_desc_container(desc: np.ndarray, mask: np.ndarray) -> Descriptors:
    return Descriptors(jnp.asarray(desc), jnp.asarray(mask))


def _known_in_map(desc, mask, rec, cfg) -> np.ndarray:
    """Keypoints whose nearest map descriptor is within dedup_desc_d2 —
    re-observations of existing landmarks (must not be re-triangulated)."""
    if not rec.pt_mask.any():
        return np.zeros_like(mask)
    m = match_pair(
        _to_desc_container(desc, mask),
        _to_desc_container(rec.pt_desc, rec.pt_mask),
        ratio=1.0,
        cross_check=False,
        backend=cfg.matching.backend,
        precision=cfg.matching.precision,
    )
    return np.asarray(m.valid) & (np.asarray(m.dist) < cfg.map.dedup_desc_d2)


def _match(desc_a, mask_a, desc_b, mask_b, cfg) -> tuple[np.ndarray, np.ndarray]:
    m = match_pair(
        _to_desc_container(desc_a, mask_a),
        _to_desc_container(desc_b, mask_b),
        ratio=cfg.matching.ratio,
        cross_check=cfg.matching.cross_check,
        backend=cfg.matching.backend,
        precision=cfg.matching.precision,
    )
    valid = np.asarray(m.valid)
    idx = np.asarray(m.idx)
    return valid, idx


def _disambiguate_planar_bootstrap(res, x0n, x1n, seed_desc, features,
                                   camera, cfg, thr_n, key):
    """Resolve the planar two-fold ambiguity with the third view.

    Two views of a plane admit two fully-consistent (R, t) interpretations
    (geometry/homography.py:TwoViewModel); the image pair cannot separate
    them. Triangulate the seed map under BOTH and keep the pose whose map
    frame 2 localizes against with more PnP inliers — the wrong structure
    reprojects inconsistently from any third viewpoint.

    x0n/x1n: (Q, 2) normalized bootstrap correspondences; seed_desc: (Q, D)
    frame-1 descriptors of those correspondences. Returns (R, t) as numpy.
    """
    xy2, d2, m2 = features[2]
    inl = np.asarray(res.inliers)
    candidates = (
        (np.asarray(res.R), np.asarray(res.t)),
        (np.asarray(res.R_alt), np.asarray(res.t_alt)),
    )
    best, best_count = candidates[0], -1
    for Rc, tc in candidates:
        R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32),
                                  Rc.astype(np.float32)]))
        t = jnp.asarray(np.stack([np.zeros(3, np.float32),
                                  tc.astype(np.float32)]))
        x = jnp.asarray(np.stack([x0n[inl], x1n[inl]]).astype(np.float32))
        pts, ok = triangulate_dlt(R, t, x)
        pts, okn = np.array(pts), np.array(ok)
        valid, idx = _match(d2, m2, seed_desc[inl], okn, cfg)
        q = np.where(valid)[0]
        count = 0
        if len(q) >= 6:
            Xp, xp, pmask = _pad_for_ransac(
                [pts[idx[q]].astype(np.float32),
                 _normalize(xy2[q], camera).astype(np.float32)], len(q))
            pn = ransac_pnp(
                key,
                jnp.asarray(Xp),
                jnp.asarray(xp),
                jnp.asarray(pmask),
                thr=thr_n,
                n_hyp=128,
                min_inliers=6,
            )
            count = int(pn.n_inliers) if bool(pn.ok) else 0
        if count > best_count:
            best, best_count = (Rc, tc), count
    return best


def _triangulate_two_view(rec, f1, f2, uv1, uv2, min_parallax_deg):
    """Triangulate normalized correspondences seen by frames f1, f2; returns
    (points (K, 3), keep (K,) bool) with cheirality + parallax gates."""
    n = uv1.shape[0]
    uv1p, uv2p, tmask = _pad_for_ransac(
        [uv1.astype(np.float32), uv2.astype(np.float32)], n)
    R = jnp.asarray(np.stack([rec.R[f1], rec.R[f2]]))
    t = jnp.asarray(np.stack([rec.t[f1], rec.t[f2]]))
    x = jnp.asarray(np.stack([uv1p, uv2p]))
    mask2 = jnp.asarray(np.stack([tmask, tmask]))
    pts, ok = triangulate_dlt(R, t, x, mask2)
    pts = np.array(pts)[:n]
    ok = np.array(ok)[:n]
    # Cheirality in both views.
    for R_, t_ in ((rec.R[f1], rec.t[f1]), (rec.R[f2], rec.t[f2])):
        z = (pts @ R_.T + t_)[:, 2]
        ok &= z > 1e-3
    # Parallax between viewing rays.
    c1 = -rec.R[f1].T @ rec.t[f1]
    c2 = -rec.R[f2].T @ rec.t[f2]
    r1 = pts - c1
    r2 = pts - c2
    cosang = np.sum(r1 * r2, -1) / np.maximum(
        np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
    )
    ok &= np.degrees(np.arccos(np.clip(cosang, -1, 1))) > min_parallax_deg
    return pts, ok


def reconstruct(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig = PipelineConfig(),
    images=None,
    seed: int = 0,
    metrics=None,
) -> Reconstruction:
    """Run incremental SfM over a sequence.

    features: list of (xy_px (N, 2) f32, desc (N, 128) f32, mask (N,) bool)
    per frame — precomputed (e.g. from features.detect_and_describe, or a
    synthetic source in tests). If ``images`` is given instead, detection
    runs here via detect_and_describe.
    metrics: optional utils.metrics.MetricsLogger — per-frame counters and
    BA costs stream to JSONL/tensorboard (SURVEY.md §6.5).
    """
    if features is None:
        from fastmatch_tpu.features.sift import detect_and_describe

        features = []
        for img in images:
            kps, descs = detect_and_describe(jnp.asarray(img), cfg.sift)
            features.append(
                (np.asarray(kps.xy), np.asarray(descs.data), np.asarray(descs.mask))
            )

    rec = Reconstruction(cfg=cfg, camera=camera)
    key = jax.random.PRNGKey(seed)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2
    # Per-frame: landmark id per keypoint slot (-1 = none).
    kp_landmark = [np.full(f[0].shape[0], -1, np.int64) for f in features]

    # ---- frame 0 ----
    rec.pose_mask[0] = True
    rec.n_frames = 1
    rec.frame_stats.append({"frame": 0, "n_kp": int(features[0][2].sum())})

    # ---- frame 1: two-view bootstrap ----
    xy0, d0, m0 = features[0]
    xy1, d1, m1 = features[1]
    valid, idx = _match(d1, m1, d0, m0, cfg)
    q = np.where(valid)[0]          # keypoints in frame 1
    if len(q) < max(8, cfg.ransac.min_inliers):
        raise RuntimeError(
            f"two-view bootstrap failed: only {len(q)} matches between "
            f"frames 0 and 1 (need >= {max(8, cfg.ransac.min_inliers)})"
        )
    tr = idx[q]                      # matched keypoints in frame 0
    x1n = _normalize(xy1[q], camera)
    x0n = _normalize(xy0[tr], camera)
    key, k1 = jax.random.split(key)
    x0p, x1p, bmask = _pad_for_ransac(
        [x0n.astype(np.float32), x1n.astype(np.float32)], len(q))
    if cfg.ransac.model_select:
        # H-vs-E selection: a planar scene (or near-pure rotation) leaves the
        # essential solve degenerate while its inlier count stays high — the
        # homography decomposition gives the well-posed pose there.
        res = select_two_view_model(
            k1,
            jnp.asarray(x0p),
            jnp.asarray(x1p),
            jnp.asarray(bmask),
            thr=thr_n,
            n_hyp=cfg.ransac.n_hyp,
            min_inliers=cfg.ransac.min_inliers,
        )
        bootstrap_used_h = bool(res.used_homography)
    else:
        res = ransac_essential(
            k1,
            jnp.asarray(x0p),
            jnp.asarray(x1p),
            jnp.asarray(bmask),
            thr=thr_n,
            n_hyp=cfg.ransac.n_hyp,
            min_inliers=cfg.ransac.min_inliers,
        )
        bootstrap_used_h = False
    res = res._replace(inliers=res.inliers[: len(q)])  # drop bucket padding
    if not bool(res.ok):
        raise RuntimeError("two-view bootstrap failed")
    if (bootstrap_used_h and bool(res.ambiguous) and len(features) > 2):
        key, k3 = jax.random.split(key)
        R_pick, t_pick = _disambiguate_planar_bootstrap(
            res, x0n, x1n, d1[q], features, camera, cfg, thr_n, k3)
        res = res._replace(R=jnp.asarray(R_pick), t=jnp.asarray(t_pick))
    rec.R[1] = np.asarray(res.R)
    rec.t[1] = np.asarray(res.t)
    rec.pose_mask[1] = True
    rec.n_frames = 2
    inl = np.asarray(res.inliers)
    pts, keep = _triangulate_two_view(
        rec, 0, 1, x0n[inl], x1n[inl], cfg.map.min_parallax_deg
    )
    qi = q[inl][keep]
    ti = tr[inl][keep]
    ids = rec.add_points(pts[keep], d1[qi])
    rec.add_observations(0, ids, x0n[inl][keep])
    rec.add_observations(1, ids, x1n[inl][keep])
    kp_landmark[1][qi] = ids
    kp_landmark[0][ti] = ids
    rec.frame_stats.append(
        {"frame": 1, "n_kp": int(m1.sum()), "n_new_pts": len(ids),
         "bootstrap_homography": bootstrap_used_h}
    )
    # Refine the two-view seed immediately: every later PnP localizes
    # against this map, and un-refined DLT triangulations carry enough
    # error to starve PnP a few frames out (drift compounds). Camera 1 is
    # FREED here (see run_ba) so the bootstrap pose itself is corrected,
    # not just the points.
    if cfg.ba.interval:
        rec.run_ba(free_second_cam=True)

    # ---- frames >= 2 ----
    for f in range(2, len(features)):
        xyf, df, mf = features[f]
        # 2D-3D: match against the landmark descriptor bank.
        valid, idx = _match(df, mf, rec.pt_desc, rec.pt_mask, cfg)
        q = np.where(valid)[0]
        lm = idx[q]
        xfn = _normalize(xyf[q], camera)
        key, k2 = jax.random.split(key)
        Xp, xp, pmask = _pad_for_ransac(
            [rec.points[lm].astype(np.float32), xfn.astype(np.float32)],
            len(q))
        pn = ransac_pnp(
            k2,
            jnp.asarray(Xp),
            jnp.asarray(xp),
            jnp.asarray(pmask),
            thr=thr_n,
            n_hyp=max(cfg.ransac.n_hyp // 2, 64),
            min_inliers=max(cfg.ransac.min_inliers // 2, 6),
        )
        if not bool(pn.ok):
            raise RuntimeError(f"PnP failed at frame {f} ({len(q)} candidates)")
        rec.R[f] = np.asarray(pn.pose.R)
        rec.t[f] = np.asarray(pn.pose.t)
        rec.pose_mask[f] = True
        rec.n_frames = f + 1
        inl = np.asarray(pn.inliers)[: len(q)]
        rec.add_observations(f, lm[inl], xfn[inl])
        kp_landmark[f][q[inl]] = lm[inl]
        # Refresh the bank: a landmark's descriptor tracks its most recent
        # PnP-inlier observation, so appearance drift over the trajectory
        # doesn't starve future 2D-3D matching (stale first-sight
        # descriptors collapse PnP beyond ~20 deg of viewpoint change).
        rec.pt_desc[lm[inl]] = features[f][1][q[inl]]

        # New landmarks: match vs previous frame's landmark-free keypoints.
        xyp, dp, mp = features[f - 1]
        free_prev = mp & (kp_landmark[f - 1] < 0)
        free_cur = mf.copy()
        free_cur[q[inl]] = False
        # Don't re-triangulate re-observations of existing landmarks (the
        # ratio test can't detect them once the bank holds duplicates).
        free_cur &= ~_known_in_map(df, free_cur, rec, cfg)
        valid2, idx2 = _match(df, free_cur, dp, free_prev, cfg)
        q2 = np.where(valid2 & (kp_landmark[f] < 0))[0]
        t2 = idx2[q2]
        if len(q2):
            xcn = _normalize(xyf[q2], camera)
            xpn = _normalize(xyp[t2], camera)
            pts, keep = _triangulate_two_view(
                rec, f - 1, f, xpn, xcn, cfg.map.min_parallax_deg
            )
            # Reprojection gate on both views.
            for (R_, t_), xn in (
                ((rec.R[f - 1], rec.t[f - 1]), xpn),
                ((rec.R[f], rec.t[f]), xcn),
            ):
                p = pts @ R_.T + t_
                zp = np.maximum(p[:, 2:3], 1e-9)
                keep &= np.sum((p[:, :2] / zp - xn) ** 2, -1) < thr_n
            if keep.any():
                ids = rec.add_points(pts[keep], df[q2[keep]])
                rec.add_observations(f - 1, ids, xpn[keep])
                rec.add_observations(f, ids, xcn[keep])
                kp_landmark[f][q2[keep]] = ids
                kp_landmark[f - 1][t2[keep]] = ids
        stats = {
            "frame": f,
            "n_kp": int(mf.sum()),
            "n_pnp_inliers": int(inl.sum()),
            "n_new_pts": int(keep.sum()) if len(q2) else 0,
        }
        rec.frame_stats.append(stats)
        if metrics:
            metrics.log("frame", **stats, n_points=int(rec.pt_mask.sum()))
        if cfg.ba.interval and (f % cfg.ba.interval == 0):
            c0, c1 = rec.run_ba()
            if metrics:
                metrics.log("ba", frame=f, cost0=c0, cost=c1)

    c0, c1 = rec.run_ba()
    if metrics:
        metrics.log("ba", frame=len(features) - 1, cost0=c0, cost=c1, final=True)
    return rec
