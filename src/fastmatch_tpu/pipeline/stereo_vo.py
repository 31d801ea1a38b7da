"""Metric stereo visual odometry: KLT tracking + stereo-lifted landmarks.

The stereo sibling of `pipeline/vo.py` for rectified left/right streams
(KITTI-style rigs). Monocular VO needs a two-view bootstrap, carries an
arbitrary |t|=1 gauge, and accumulates scale drift; a calibrated stereo
pair fixes all three at once — every keyframe lifts its corners to
METRIC 3D through the dense correlation matcher (`dense/stereo.py`,
Z = fx * baseline / disparity), so frame 0 is already a full map and
every PnP solve is metric from the first frame:

* frame 0 / keyframes: Shi-Tomasi corners into free slots, one
  `stereo_disparity` sweep of the pair (the lane-roll ZNCC matcher —
  7 ms at VGA/D=64 on chip), disparity sampled at the corner pixels,
  survivors lifted to world via the current pose;
* every frame: pyramidal LK tracks the live slots (features/klt.py),
  RANSAC PnP against their landmarks poses the frame; lost tracks free
  their slots;
* keyframe trigger: live-track count falls below ``kf_tracked_frac`` of
  capacity — replenish + lift;
* observations are recorded at keyframes; an optional final BA
  (``ba_final``) polishes poses+landmarks (the first two poses stay
  frozen, which pins the metric gauge the stereo lift established).

No bootstrap, no retroactive pass, no scale gauge: the host loop is a
strict subset of mono VO's. Outputs the same `Reconstruction` container,
so export (PLY/COLMAP/KITTI), evaluation, and merging all apply.
CLI: `fastmatch-tpu vo left_dir/ --right right_dir/ --baseline B`.

Reference scope: arnfred/Fast-Match has no odometry (SURVEY.md §1.1);
this extends the north-star pipeline family (SURVEY.md §3.2 T21) to
calibrated stereo rigs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.dense.stereo import StereoConfig, stereo_disparity
from fastmatch_tpu.features.klt import KLTConfig, build_pyramid, shi_tomasi, track_pyramids
from fastmatch_tpu.geometry.pnp import ransac_pnp
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import (
    Reconstruction,
    _normalize,
    _pad_for_ransac,
)


@dataclass(frozen=True)
class StereoVOConfig:
    capacity: int = 512          # track slots (KLT compile shape)
    kf_tracked_frac: float = 0.6  # replenish when live < frac * capacity
    pnp_min_inliers: int = 12
    min_disp: float = 1.0        # px; rejects far/invalid lifts
    max_depth: float = 200.0     # metric gate on lifted points
    replenish_radius: float = 8.0
    ba_final: bool = True
    klt: KLTConfig = field(default_factory=KLTConfig)
    stereo: StereoConfig = field(default_factory=StereoConfig)


def stereo_visual_odometry(
    left_images,
    right_images,
    camera: Pinhole,
    baseline: float,
    cfg: PipelineConfig = PipelineConfig(),
    vo: StereoVOConfig = StereoVOConfig(),
    metrics=None,
) -> Reconstruction:
    """Run metric stereo VO over rectified (left, right) grayscale pairs.

    ``left_images`` / ``right_images``: equal-length sequences of (H, W)
    float [0,1] frames. Returns a Reconstruction with every frame posed
    in the METRIC frame of camera 0 (world = first left camera).
    """
    C = vo.capacity
    rec = Reconstruction(cfg=cfg, camera=camera)
    key = jax.random.PRNGKey(0)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2
    fx, cx, cy = float(camera.fx), float(camera.cx), float(camera.cy)
    fy = float(camera.fy)

    pos = np.zeros((C, 2), np.float32)
    alive = np.zeros(C, bool)
    lid = -np.ones(C, np.int64)
    prev_pyr = None
    stats = rec.frame_stats

    def lift_keyframe(f, left, right):
        """Detect into free slots, stereo-lift the landmark-less ones."""
        kps = shi_tomasi(jnp.asarray(left), capacity=C)
        cand = np.array(kps.xy)
        cmask = np.array(kps.mask)
        if alive.any():
            d2 = ((cand[:, None, :] - pos[None, alive, :]) ** 2).sum(-1)
            cmask &= d2.min(axis=1) > vo.replenish_radius ** 2
        free = np.where(~alive)[0]
        take = np.where(cmask)[0][: len(free)]
        sl = free[: len(take)]
        pos[sl] = cand[take]
        alive[sl] = True
        lid[sl] = -1

        disp, dvalid = stereo_disparity(jnp.asarray(left),
                                        jnp.asarray(right), vo.stereo)
        disp = np.asarray(disp)
        dvalid = np.asarray(dvalid)
        h, w = disp.shape
        sel = np.where(alive & (lid < 0))[0]
        if sel.size == 0:
            return 0
        u = np.clip(np.round(pos[sel, 0]).astype(np.int64), 0, w - 1)
        v = np.clip(np.round(pos[sel, 1]).astype(np.int64), 0, h - 1)
        d = disp[v, u]
        ok = dvalid[v, u] & (d > vo.min_disp)
        Z = fx * baseline / np.maximum(d, 1e-6)
        ok &= (Z > 0) & (Z < vo.max_depth)
        sel, Z = sel[ok], Z[ok]
        if sel.size == 0:
            return 0
        xn = (pos[sel, 0] - cx) / fx
        yn = (pos[sel, 1] - cy) / fy
        Xc = np.stack([xn * Z, yn * Z, Z], axis=1).astype(np.float32)
        # world = R^T (x_cam - t)
        Xw = (Xc - rec.t[f]) @ rec.R[f]
        if rec.n_points + sel.size > rec.pt_mask.shape[0]:
            keep = np.arange(sel.size) < rec.pt_mask.shape[0] - rec.n_points
            sel, Xw = sel[keep], Xw[keep]
        if sel.size == 0:
            return 0
        ids = rec.add_points(Xw, np.zeros((sel.size, rec.pt_desc.shape[1]),
                                          np.float32))
        lid[sel] = ids
        return int(sel.size)

    def add_kf_observations(f):
        sel = np.where(alive & (lid >= 0))[0]
        if len(sel) and rec.n_obs + len(sel) <= rec.obs_mask.shape[0]:
            rec.add_observations(f, lid[sel].astype(np.int32),
                                 _normalize(pos[sel], camera))

    n_kfs = 0
    for f, (left, right) in enumerate(zip(left_images, right_images)):
        left = np.asarray(left, np.float32)
        pyr = build_pyramid(jnp.asarray(left), vo.klt)
        if f == 0:
            rec.pose_mask[0] = True
            rec.n_frames = 1
            n_lift = lift_keyframe(0, left, right)
            add_kf_observations(0)
            n_kfs = 1
            prev_pyr = pyr
            stats.append(dict(frame=0, tracked=int(alive.sum()), kf=True,
                              lifted=n_lift))
            if metrics:
                metrics.log("stereo_vo_frame", **stats[-1])
            continue

        new_pts, status, _ = track_pyramids(
            prev_pyr, pyr, jnp.asarray(pos), jnp.asarray(alive), vo.klt)
        pos[:] = np.asarray(new_pts)
        alive &= np.asarray(status)
        prev_pyr = pyr
        rec.n_frames = f + 1
        fstat = dict(frame=f, tracked=int(alive.sum()), kf=False)

        sel = np.where(alive & (lid >= 0))[0]
        ok = False
        if len(sel) >= 6:
            X = rec.points[lid[sel]]
            x = _normalize(pos[sel], camera).astype(np.float32)
            Xp, xp, pm = _pad_for_ransac([X, x], len(sel))
            key, sub = jax.random.split(key)
            res = ransac_pnp(sub, jnp.asarray(Xp), jnp.asarray(xp),
                             jnp.asarray(pm), thr=thr_n,
                             n_hyp=cfg.ransac.n_hyp,
                             min_inliers=vo.pnp_min_inliers)
            ok = bool(res.ok)
            fstat["pnp_inliers"] = int(res.n_inliers)
        if ok:
            rec.R[f] = np.asarray(res.pose.R)
            rec.t[f] = np.asarray(res.pose.t)
            rec.pose_mask[f] = True
        else:
            # Flagged constant-position fallback (vo.py's discipline):
            # the previous frame is always posed by induction.
            rec.R[f] = rec.R[f - 1]
            rec.t[f] = rec.t[f - 1]
            rec.pose_mask[f] = True
            fstat["pnp_failed"] = True
            # Tracks stay live: the keyframe trigger below re-lifts at
            # the fallback pose, so odometry resumes locally consistent
            # (standard reinitialize-after-loss behavior).

        if int(alive.sum()) < vo.kf_tracked_frac * C:
            n_lift = lift_keyframe(f, left, np.asarray(right, np.float32))
            add_kf_observations(f)
            n_kfs += 1
            fstat.update(kf=True, lifted=n_lift)
        stats.append(fstat)
        if metrics:
            metrics.log("stereo_vo_frame", **fstat)

    if vo.ba_final and rec.n_obs > 0 and rec.n_frames >= 3:
        c0, c1 = rec.run_ba()
        stats.append(dict(frame=-1, ba_cost0=c0, ba_cost=c1, n_kfs=n_kfs))
    return rec
