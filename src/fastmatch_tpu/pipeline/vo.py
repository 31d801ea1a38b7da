"""KLT visual odometry: flow-tracked landmarks + PnP, no descriptors.

The small-baseline companion of pipeline/reconstruct.py: video-rate
sequences where consecutive frames are a few pixels apart don't need
detect-describe-match — Shi-Tomasi corners tracked by pyramidal LK
(features/klt.py) ARE the data association. Per frame the device work is
one KLT step + one bucketed RANSAC PnP; map growth (triangulation, track
replenishment, BA) happens only on keyframes, so the hot loop stays
flat-cost. Returns the same ``Reconstruction`` container as the other
engines — export (PLY/COLMAP/KITTI), evaluation, and georegistration
apply unchanged.

No reference counterpart file:line exists (the mount is empty —
SURVEY.md §0); spec axis is BASELINE.json:2's frames/s/chip on
sequences. Design notes:

- Track slots are FIXED capacity (one compiled KLT program); dead slots
  recycle on keyframes only, so slot->landmark bindings are stable
  between keyframes.
- Bootstrap: the first frame pair with median tracked flow over
  ``bootstrap_px`` seeds the map (essential RANSAC + two-view DLT).
  Pre-bootstrap frames keep their tracked positions in a short history
  and get poses RETROACTIVELY by PnP against the seeded map — the
  trajectory has no identity-pose holes.
- Tracking failure tolerance: a frame whose PnP fails keeps the previous
  pose (constant-position fallback) and is flagged in frame_stats; the
  tracker itself keeps running, so a later keyframe can recover.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.features.klt import (KLTConfig, build_pyramid, shi_tomasi,
                                        track_pyramids)
from fastmatch_tpu.geometry.pnp import ransac_pnp
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import (Reconstruction, _normalize,
                                                _pad_for_ransac)


@dataclass(frozen=True)
class VOConfig:
    capacity: int = 512          # track slots (KLT compile shape)
    bootstrap_px: float = 20.0   # median flow to attempt two-view seeding
    min_parallax_px: float = 8.0 # first-obs parallax before triangulating
    kf_px: float = 12.0          # median flow from last keyframe -> new kf
    kf_min_tracked: int = 150    # ... or tracked landmarks drop below this
    pnp_min_inliers: int = 12
    ba_every_kfs: int = 4        # global BA cadence, in keyframes
    replenish_radius: float = 8.0  # keep new corners this far from live ones
    klt: KLTConfig = KLTConfig()


def visual_odometry(images, camera: Pinhole,
                    cfg: PipelineConfig = PipelineConfig(),
                    vo: VOConfig = VOConfig(), metrics=None) -> Reconstruction:
    """Run KLT visual odometry over a grayscale image sequence.

    images: iterable of (H, W) float [0,1] frames (list/array/generator —
    frames are consumed strictly in order). Returns a Reconstruction with
    every frame posed (bootstrap pair gauge: |t| = 1).
    """
    C = vo.capacity
    rec = Reconstruction(cfg=cfg, camera=camera)
    key = jax.random.PRNGKey(0)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2

    pos = np.zeros((C, 2), np.float32)      # current track positions
    alive = np.zeros(C, bool)
    lid = -np.ones(C, np.int64)             # landmark id per slot (-1: none)
    first_frame = np.zeros(C, np.int32)     # frame where this track started
    first_pos = np.zeros((C, 2), np.float32)
    kf_pos = np.zeros((C, 2), np.float32)   # positions at the last keyframe

    booted = False
    history = []                            # pre-bootstrap (pos, alive) per frame
    prev_pyr = None
    last_ba_kf = 0
    n_kfs = 0
    stats = rec.frame_stats

    def detect_into_free_slots(img, f):
        nonlocal pos, alive, first_frame, first_pos
        kps = shi_tomasi(jnp.asarray(img), capacity=C)
        cand = np.array(kps.xy)
        cmask = np.array(kps.mask)  # writable host copies
        if alive.any():
            d2 = ((cand[:, None, :] - pos[None, alive, :]) ** 2).sum(-1)
            cmask &= d2.min(axis=1) > vo.replenish_radius ** 2
        free = np.where(~alive)[0]
        take = np.where(cmask)[0][: len(free)]
        sl = free[: len(take)]
        pos[sl] = cand[take]
        alive[sl] = True
        lid[sl] = -1
        first_frame[sl] = f
        first_pos[sl] = cand[take]

    def pnp_frame(f, p_slots, a_slots):
        """Pose frame f from its tracked landmarks; returns ok."""
        nonlocal key
        sel = np.where(a_slots & (lid >= 0))[0]
        if len(sel) < 6:
            return False, 0
        X = rec.points[lid[sel]]
        x = _normalize(p_slots[sel], camera).astype(np.float32)
        Xp, xp, pm = _pad_for_ransac([X, x], len(sel))
        key, sub = jax.random.split(key)
        res = ransac_pnp(sub, jnp.asarray(Xp), jnp.asarray(xp),
                         jnp.asarray(pm), thr=thr_n,
                         n_hyp=cfg.ransac.n_hyp,
                         min_inliers=vo.pnp_min_inliers)
        if not bool(res.ok):
            return False, int(res.n_inliers)
        rec.R[f] = np.asarray(res.pose.R)
        rec.t[f] = np.asarray(res.pose.t)
        rec.pose_mask[f] = True
        return True, int(res.n_inliers)

    def triangulate_new(f):
        """Two-view DLT for landmark-less tracks with enough parallax."""
        sel = np.where(alive & (lid < 0) & (first_frame < f)
                       & rec.pose_mask[np.clip(first_frame, 0, None)])[0]
        if len(sel) == 0:
            return 0
        par = np.linalg.norm(pos[sel] - first_pos[sel], axis=1)
        sel = sel[par > vo.min_parallax_px]
        if len(sel) == 0:
            return 0
        # group by first_frame: one (2, P, 2) DLT per origin frame. The
        # point count is BUCKET-padded (power-of-two + mask): raw sizes
        # hand XLA a fresh shape per call, and through the TPU relay each
        # fresh shape is a multi-second compile — measured 0.1 frames/s
        # end-to-end on chip before bucketing vs ~ms of actual DLT work.
        added = 0
        for f0 in np.unique(first_frame[sel]):
            s = sel[first_frame[sel] == f0]
            R2 = jnp.asarray(np.stack([rec.R[f0], rec.R[f]]))
            t2 = jnp.asarray(np.stack([rec.t[f0], rec.t[f]]))
            xa, xb, pmask = _pad_for_ransac(
                [_normalize(first_pos[s], camera).astype(np.float32),
                 _normalize(pos[s], camera).astype(np.float32)], len(s))
            x2 = jnp.asarray(np.stack([xa, xb]))
            vis2 = jnp.asarray(np.stack([pmask, pmask]))
            pts, ok = triangulate_dlt(R2, t2, x2, vis2)
            pts = np.array(pts)[: len(s)]
            ok = np.array(ok)[: len(s)]  # writable live-prefix copies
            # cheirality in both views
            for Rf, tf in ((rec.R[f0], rec.t[f0]), (rec.R[f], rec.t[f])):
                ok &= (pts @ Rf.T + tf)[:, 2] > 1e-3
            if rec.n_points + int(ok.sum()) > rec.pt_mask.shape[0]:
                ok &= np.cumsum(ok) <= rec.pt_mask.shape[0] - rec.n_points
            s, pts = s[ok], pts[ok]
            if len(s) == 0:
                continue
            ids = rec.add_points(
                pts, np.zeros((len(s), rec.pt_desc.shape[1]), np.float32))
            lid[s] = ids
            rec.add_observations(
                int(f0), ids, _normalize(first_pos[s], camera))
            added += len(s)
        return added

    def add_kf_observations(f):
        sel = np.where(alive & (lid >= 0))[0]
        if len(sel) and rec.n_obs + len(sel) <= rec.obs_mask.shape[0]:
            rec.add_observations(f, lid[sel].astype(np.int32),
                                 _normalize(pos[sel], camera))

    for f, img in enumerate(images):
        img = np.asarray(img, np.float32)
        pyr = build_pyramid(jnp.asarray(img), vo.klt)
        if f == 0:
            detect_into_free_slots(img, 0)
            rec.pose_mask[0] = True
            rec.n_frames = 1
            kf_pos[:] = pos
            history.append((pos.copy(), alive.copy()))
            prev_pyr = pyr
            stats.append(dict(frame=0, tracked=int(alive.sum()), kf=True))
            continue

        new_pts, status, _ = track_pyramids(
            prev_pyr, pyr, jnp.asarray(pos), jnp.asarray(alive), vo.klt)
        pos = np.asarray(new_pts).copy()
        alive = alive & np.asarray(status)
        prev_pyr = pyr
        rec.n_frames = f + 1
        fstat = dict(frame=f, tracked=int(alive.sum()), kf=False)

        if not booted:
            history.append((pos.copy(), alive.copy()))
            root = alive & (first_frame == 0)
            flow = (np.linalg.norm(pos[root] - first_pos[root], axis=1)
                    if root.any() else np.zeros(1))
            if np.median(flow) > vo.bootstrap_px and root.sum() >= 16:
                sel = np.where(root)[0]
                x1 = _normalize(first_pos[sel], camera).astype(np.float32)
                x2 = _normalize(pos[sel], camera).astype(np.float32)
                x1p, x2p, pm = _pad_for_ransac([x1, x2], len(sel))
                key, sub = jax.random.split(key)
                res = ransac_essential(sub, jnp.asarray(x1p),
                                       jnp.asarray(x2p), jnp.asarray(pm),
                                       thr=thr_n, n_hyp=cfg.ransac.n_hyp,
                                       min_inliers=cfg.ransac.min_inliers)
                if bool(res.ok):
                    rec.R[f] = np.asarray(res.R)
                    rec.t[f] = np.asarray(res.t)
                    rec.pose_mask[f] = True
                    booted = True
                    triangulate_new(f)
                    add_kf_observations(f)
                    # retroactive poses for the skipped frames; a frame
                    # whose retroactive PnP fails gets the same flagged
                    # constant-position fallback as the main loop (the
                    # previous frame is always posed by induction from
                    # frame 0), keeping the no-identity-pose-holes
                    # invariant of the module docstring.
                    for fi in range(1, f):
                        p_h, a_h = history[fi]
                        ok_r, _ = pnp_frame(fi, p_h, a_h)
                        if not ok_r:
                            rec.R[fi] = rec.R[fi - 1]
                            rec.t[fi] = rec.t[fi - 1]
                            rec.pose_mask[fi] = True
                            stats[fi]["pnp_failed"] = True
                    kf_pos[:] = pos
                    n_kfs = 2
                    fstat.update(kf=True, booted=True,
                                 points=int(rec.n_points))
                    cost0, cost = rec.run_ba(free_second_cam=True)
                    fstat.update(ba_cost0=cost0, ba_cost=cost)
            stats.append(fstat)
            continue

        ok, n_in = pnp_frame(f, pos, alive)
        fstat["pnp_inliers"] = n_in
        if not ok:
            # constant-position fallback; flagged, not fatal
            rec.R[f] = rec.R[f - 1]
            rec.t[f] = rec.t[f - 1]
            rec.pose_mask[f] = True
            fstat["pnp_failed"] = True

        kf_flow = np.linalg.norm(pos[alive] - kf_pos[alive], axis=1)
        n_tracked_lms = int((alive & (lid >= 0)).sum())
        if (np.median(kf_flow) > vo.kf_px if kf_flow.size else True) \
                or n_tracked_lms < vo.kf_min_tracked:
            fstat["kf"] = True
            n_kfs += 1
            fstat["new_points"] = triangulate_new(f)
            add_kf_observations(f)
            detect_into_free_slots(img, f)
            kf_pos[:] = pos
            if n_kfs - last_ba_kf >= vo.ba_every_kfs:
                cost0, cost = rec.run_ba()
                fstat.update(ba_cost0=cost0, ba_cost=cost)
                last_ba_kf = n_kfs
        if metrics is not None:
            metrics.log("vo_frame", **{k: v for k, v in fstat.items()
                                       if not isinstance(v, bool)})
        stats.append(fstat)

    if not booted:
        raise RuntimeError(
            "VO never bootstrapped: sequence has too little parallax "
            f"(needs median flow > {vo.bootstrap_px} px from frame 0)")
    return rec
