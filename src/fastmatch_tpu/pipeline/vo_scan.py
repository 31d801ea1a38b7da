"""Device-resident KLT visual odometry: the sequence as ONE `lax.scan`.

pipeline/vo.py's host loop makes ~6-10 relay dispatches + readbacks per
frame (KLT, PnP, per-origin-group triangulation, detection, BA) — on this
container that is ~145 ms/frame of pure orchestration against ~3-10 ms of
device work, the same gap slam_scan closed for the descriptor engine
(measured there: 1.7 -> 35.5 frames/s). This module runs the ENTIRE
post-bootstrap VO loop inside one compiled scan over the raw image stack:

- The scan body is the host loop's per-frame policy, traced: pyramid
  build -> pyramidal LK -> RANSAC PnP (constant-position fallback on
  failure, flagged) -> keyframe decision (masked-median flow / tracked-
  landmark floor) -> under `lax.cond` on keyframes only: per-slot
  two-view DLT triangulation, observation appends, Shi-Tomasi
  replenishment into free slots -> interval BA under a second `lax.cond`
  (same every-N-keyframes cadence, compact_obs_local bucketing as
  slam_scan's interval solves).
- Host VO groups triangulation by origin frame so one (2, P, 2) DLT
  serves each group (a HOST-shape concern: raw group sizes were fresh
  relay compiles, docs/PERFORMANCE.md "VO bucketing"). Inside a scan all
  shapes are static, so triangulation is per-SLOT instead: each track
  carries its origin pose index and the 4x4 DLT normal matrix is built
  with per-slot first views (`_triangulate_pairwise`) — same math, no
  grouping pass at all.
- The two-view bootstrap's BOOT FRAME is data-dependent, so the decision
  stays on host — but the work doesn't: pre-boot tracking runs as
  KLT-only chunk scans (`_boot_track_chunk`, one dispatch per 16 frames
  instead of 2-3 per frame), and the retroactive PnP for the skipped
  frames is ONE vmapped RANSAC dispatch over all of them
  (`_retro_pnp`) instead of a dispatch per frame. Measured on the
  40-frame VGA bench: the per-frame host bootstrap was 2.6 s of the
  3.4 s total (the scan itself is 0.17 s for 31 frames).

Per sequence: one image-stack upload, one scan dispatch, one final
global BA (host-level, obs-bucket-compacted), one state readback.
Decision policy matches the host engine; results are not bitwise equal
(different RANSAC key schedule and per-slot vs grouped DLT reduction
order) — tests assert equal-quality ATE on the same oracles plus the
host engine's robustness contract (occlusion recovery, no
identity-pose holes).

No reference counterpart file:line exists (the mount is empty —
SURVEY.md §0); spec axis is BASELINE.json:2 frames/s/chip.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.ba.lm import ba_solve
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.core.batched_linalg import smallest_eigvecs
from fastmatch_tpu.core.camera import Pinhole, normalize_pixels
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.features.klt import (KLTConfig, build_pyramid, shi_tomasi,
                                        track_pyramids)
from fastmatch_tpu.geometry.pnp import ransac_pnp
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import (Reconstruction, _normalize,
                                                _pad_for_ransac)
from fastmatch_tpu.pipeline.tracker import _append_rows, compact_obs_local
from fastmatch_tpu.pipeline.vo import VOConfig


@dataclasses.dataclass(frozen=True)
class VOScanStatic:
    """Trace-time VO-scan configuration (hashable; one compile per value)."""

    cap: int = 512
    max_frames: int = 64
    max_points: int = 8192
    max_obs: int = 65536
    n_hyp: int = 512
    pnp_min_inliers: int = 12
    kf_px: float = 12.0
    kf_min_tracked: int = 150
    min_parallax_px: float = 8.0
    replenish_radius: float = 8.0
    ba_every_kfs: int = 4
    ba_max_iters: int = 6
    ba_pcg_iters: int = 16
    ba_obs_cap: int = 8192       # compact_obs_local bucket; 0 = full table
    huber_delta: float = 0.004   # huber_px / fx, static for the traced solve
    cam_model: str = "pinhole"
    klt: KLTConfig = KLTConfig()


class VOScanState(NamedTuple):
    """Fixed-capacity device carry: track slots + map (donated)."""

    # Track slots (capacity C)
    pos: jnp.ndarray          # (C, 2) current pixel positions
    alive: jnp.ndarray        # (C,) bool
    lid: jnp.ndarray          # (C,) i32 landmark id or -1
    first_frame: jnp.ndarray  # (C,) i32 frame where the track started
    first_pos: jnp.ndarray    # (C, 2) pixel position at first_frame
    kf_pos: jnp.ndarray       # (C, 2) positions at the last keyframe
    # Map (capacities F, P, O — shared schema with pipeline/tracker.py)
    R: jnp.ndarray            # (F, 3, 3) world->cam
    t: jnp.ndarray            # (F, 3)
    pose_mask: jnp.ndarray    # (F,) bool
    points: jnp.ndarray       # (P, 3)
    pt_mask: jnp.ndarray      # (P,) bool
    obs_cam: jnp.ndarray      # (O,) i32
    obs_pt: jnp.ndarray       # (O,) i32
    obs_uv: jnp.ndarray       # (O, 2) normalized coords
    obs_mask: jnp.ndarray     # (O,) bool
    n_points: jnp.ndarray     # i32
    n_obs: jnp.ndarray        # i32
    n_kfs: jnp.ndarray        # i32
    last_ba_kf: jnp.ndarray   # i32
    prev_pyr: tuple           # previous frame's pyramid (levels as tuple)
    cam: jnp.ndarray          # (9,) packed intrinsics


class VOScanInfo(NamedTuple):
    """Per-frame scan output (read back once per sequence)."""

    tracked: jnp.ndarray      # i32 live tracks after KLT
    pnp_ok: jnp.ndarray       # bool
    n_inliers: jnp.ndarray    # i32
    is_kf: jnp.ndarray        # bool
    n_new_points: jnp.ndarray # i32
    n_points: jnp.ndarray     # i32
    n_obs: jnp.ndarray        # i32
    ba_cost: jnp.ndarray      # f32 (interval BA final cost; -1 if no BA)
    overflow: jnp.ndarray     # bool


def _masked_median(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median over the masked subset (even-count average), +inf when
    empty — matching the host loop's `np.median(x) if x.size else True`
    keyframe trigger."""
    s = jnp.sort(jnp.where(mask, vals, jnp.inf))
    n = jnp.sum(mask, dtype=jnp.int32)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    return jnp.where(n > 0, 0.5 * (s[lo] + s[hi]), jnp.inf)


def _triangulate_pairwise(R0, t0, x0, R1, t1, x1):
    """Two-view DLT with a DIFFERENT first view per point.

    R0: (C, 3, 3), t0: (C, 3), x0/x1: (C, 2) normalized; R1/t1: the shared
    second view. Same normal-matrix construction as
    geometry/triangulation.triangulate_dlt (rows x*P3 - P1, y*P3 - P2 per
    view), with the view axis unrolled because view 0 varies per slot.
    Returns (points (C, 3), ok (C,)).
    """
    P0 = jnp.concatenate([R0, t0[..., None]], axis=-1)        # (C, 3, 4)
    P1 = jnp.concatenate([R1, t1[:, None]], axis=-1)          # (3, 4)
    rows = [
        x0[:, 0:1] * P0[:, 2] - P0[:, 0],                     # (C, 4)
        x0[:, 1:2] * P0[:, 2] - P0[:, 1],
        x1[:, 0:1] * P1[2][None] - P1[0][None],
        x1[:, 1:2] * P1[2][None] - P1[1][None],
    ]
    A = jnp.stack(rows, axis=1)                               # (C, 4, 4)
    ATA = jnp.einsum("cri,crj->cij", A, A)
    h = smallest_eigvecs(ATA)[..., :, 0]                      # (C, 4)
    w = h[..., 3]
    ok = jnp.abs(w) > 1e-12
    pts = h[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    return pts, ok


def _run_interval_ba(state: VOScanState, cfg: VOScanStatic):
    """Global-map BA inside the scan (gauge cameras 0/1 fixed, like
    Reconstruction.run_ba), obs table bucket-compacted with the STATIC
    compact_obs_local bucket (newest rows win on overflow)."""
    idx = jnp.arange(state.pose_mask.shape[0], dtype=jnp.int32)
    prob = BAProblem(
        poses=SE3(state.R, state.t),
        points=state.points,
        obs=Observations(state.obs_cam, state.obs_pt, state.obs_uv,
                         state.obs_mask),
        cam_mask=state.pose_mask,
        pt_mask=state.pt_mask,
        fixed_cams=state.pose_mask & (idx < 2),
    )
    if cfg.ba_obs_cap > 0:
        prob = compact_obs_local(prob, cfg.ba_obs_cap)
    res = ba_solve(prob, max_iters=cfg.ba_max_iters,
                   pcg_iters=cfg.ba_pcg_iters,
                   huber_delta_static=cfg.huber_delta)
    return (state._replace(R=res.poses.R, t=res.poses.t, points=res.points),
            res.cost)


def _keyframe_work(state: VOScanState, img, fi, pos, alive, xn, Rf, tf,
                   cfg: VOScanStatic):
    """Triangulate ripened tracks, record observations, replenish corners.
    Runs under `lax.cond` — non-keyframes skip the whole branch (the
    Shi-Tomasi detector alone is ~5.6 ms at VGA)."""
    C, P = cfg.cap, cfg.max_points
    lid = state.lid

    # ---- two-view triangulation of landmark-less ripened tracks ----
    ff = jnp.clip(state.first_frame, 0, cfg.max_frames - 1)
    par = jnp.linalg.norm(pos - state.first_pos, axis=1)
    sel = (alive & (lid < 0) & (state.first_frame < fi)
           & state.pose_mask[ff] & (par > cfg.min_parallax_px))
    x0 = normalize_pixels(state.first_pos, state.cam, cfg.cam_model)
    R0 = state.R[ff]
    t0 = state.t[ff]
    pts, ok3 = _triangulate_pairwise(R0, t0, x0, Rf, tf, xn)
    keep = sel & ok3
    # Cheirality in both views (the host loop's gate).
    z0 = jnp.einsum("cij,cj->ci", R0, pts)[:, 2] + t0[:, 2]
    z1 = (pts @ Rf.T + tf)[:, 2]
    keep &= (z0 > 1e-3) & (z1 > 1e-3)

    slots_p = state.n_points + jnp.cumsum(keep.astype(jnp.int32)) - 1
    slots_ok = keep & (slots_p < P)
    slots = jnp.where(slots_ok, slots_p, P)
    points = state.points.at[slots].set(pts, mode="drop")
    pt_mask = state.pt_mask.at[slots].set(True, mode="drop")
    total_p = state.n_points + jnp.sum(keep, dtype=jnp.int32)
    n_points = jnp.minimum(total_p, P)
    ovf = total_p > P
    lid = jnp.where(slots_ok, slots_p, lid)
    n_new = jnp.sum(slots_ok, dtype=jnp.int32)

    # Origin-frame observations of the new landmarks.
    (obs_cam, obs_pt, obs_uv, obs_mask), n_obs, o1 = _append_rows(
        [state.obs_cam, state.obs_pt, state.obs_uv, state.obs_mask],
        slots_ok,
        [state.first_frame, jnp.where(slots_ok, slots_p, 0), x0,
         jnp.ones(C, bool)],
        state.n_obs)
    # Current-keyframe observations of every tracked landmark (incl. new).
    fvec = jnp.broadcast_to(fi, (C,)).astype(jnp.int32)
    sel_obs = alive & (lid >= 0)
    (obs_cam, obs_pt, obs_uv, obs_mask), n_obs, o2 = _append_rows(
        [obs_cam, obs_pt, obs_uv, obs_mask], sel_obs,
        [fvec, jnp.maximum(lid, 0), xn, jnp.ones(C, bool)], n_obs)

    # ---- Shi-Tomasi replenishment into free slots ----
    kps = shi_tomasi(img, capacity=C)
    cxy = kps.xy
    cmask = kps.mask
    d2 = jnp.sum((cxy[:, None, :] - pos[None, :, :]) ** 2, -1)   # (C, C)
    near = (d2 <= cfg.replenish_radius ** 2) & alive[None, :]
    cmask = cmask & ~jnp.any(near, axis=1)
    free = ~alive
    # Rank-matching scatter: candidate with rank r fills the r-th free slot
    # (candidates arrive score-ordered from shi_tomasi's top_k, same
    # preference order as the host loop's `np.where(cmask)[0][:len(free)]`).
    rank_f = jnp.cumsum(free.astype(jnp.int32)) - 1
    rank_c = jnp.cumsum(cmask.astype(jnp.int32)) - 1
    n_cand = jnp.sum(cmask, dtype=jnp.int32)
    by_rank = jnp.zeros(C, jnp.int32).at[
        jnp.where(cmask, rank_c, C)].set(jnp.arange(C, dtype=jnp.int32),
                                         mode="drop")
    take = free & (rank_f < n_cand)
    j = by_rank[jnp.clip(rank_f, 0, C - 1)]
    pos = jnp.where(take[:, None], cxy[j], pos)
    alive = alive | take
    lid = jnp.where(take, -1, lid)
    first_frame = jnp.where(take, fi, state.first_frame)
    first_pos = jnp.where(take[:, None], cxy[j], state.first_pos)

    state = state._replace(
        pos=pos, alive=alive, lid=lid, first_frame=first_frame,
        first_pos=first_pos, kf_pos=pos,
        points=points, pt_mask=pt_mask, n_points=n_points,
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv, obs_mask=obs_mask,
        n_obs=n_obs, n_kfs=state.n_kfs + 1)
    return state, n_new, ovf | o1 | o2


def _scan_body(state: VOScanState, x, base_key, thr_n, cfg: VOScanStatic):
    fi, img = x
    pyr = build_pyramid(img, cfg.klt)

    # ---- KLT + PnP ----
    new_pts, status, _err = track_pyramids(state.prev_pyr, pyr, state.pos,
                                           state.alive, cfg.klt)
    pos = new_pts
    alive = state.alive & status
    xn = normalize_pixels(pos, state.cam, cfg.cam_model)
    has_lm = alive & (state.lid >= 0)
    X = state.points[jnp.maximum(state.lid, 0)]
    key = jax.random.fold_in(base_key, fi)
    pn = ransac_pnp(key, X, xn, has_lm, thr=thr_n, n_hyp=cfg.n_hyp,
                    min_inliers=cfg.pnp_min_inliers)
    ok = pn.ok
    # Constant-position fallback keeps every frame posed (host policy).
    Rf = jnp.where(ok, pn.pose.R, state.R[fi - 1])
    tf = jnp.where(ok, pn.pose.t, state.t[fi - 1])
    state = state._replace(
        R=state.R.at[fi].set(Rf, mode="drop"),
        t=state.t.at[fi].set(tf, mode="drop"),
        pose_mask=state.pose_mask.at[fi].set(True, mode="drop"))

    # ---- keyframe decision (host policy: median keyframe flow / tracked-
    # landmark floor; made regardless of PnP outcome) ----
    kf_flow = jnp.linalg.norm(pos - state.kf_pos, axis=1)
    med = _masked_median(kf_flow, alive)
    n_tracked = jnp.sum(has_lm, dtype=jnp.int32)
    is_kf = (med > cfg.kf_px) | (n_tracked < cfg.kf_min_tracked)

    state = state._replace(pos=pos, alive=alive)
    state, n_new, ovf = jax.lax.cond(
        is_kf,
        lambda s: _keyframe_work(s, img, fi, pos, alive, xn, Rf, tf, cfg),
        lambda s: (s, jnp.int32(0), jnp.asarray(False)),
        state)

    # ---- interval BA (every ba_every_kfs keyframes) ----
    do_ba = is_kf & (state.n_kfs - state.last_ba_kf >= cfg.ba_every_kfs)
    state, ba_cost = jax.lax.cond(
        do_ba,
        lambda s: _run_interval_ba(s, cfg),
        lambda s: (s, jnp.float32(-1.0)),
        state)
    state = state._replace(
        last_ba_kf=jnp.where(do_ba, state.n_kfs, state.last_ba_kf),
        prev_pyr=tuple(pyr))

    info = VOScanInfo(
        tracked=jnp.sum(alive, dtype=jnp.int32), pnp_ok=ok,
        n_inliers=pn.n_inliers, is_kf=is_kf, n_new_points=n_new,
        n_points=state.n_points, n_obs=state.n_obs, ba_cost=ba_cost,
        overflow=ovf)
    return state, info


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _scan(state: VOScanState, xs, base_key, thr_n, cfg: VOScanStatic):
    return jax.lax.scan(
        lambda s, x: _scan_body(s, x, base_key, thr_n, cfg), state, xs)


def _static_from_cfg(cfg: PipelineConfig, vo: VOConfig,
                     camera: Pinhole) -> VOScanStatic:
    m, ba = cfg.map, cfg.ba
    model = "fisheye" if getattr(camera, "model", "") == "fisheye" \
        else "pinhole"
    return VOScanStatic(
        cap=vo.capacity, max_frames=m.max_frames, max_points=m.max_points,
        max_obs=m.max_obs, n_hyp=cfg.ransac.n_hyp,
        pnp_min_inliers=vo.pnp_min_inliers, kf_px=vo.kf_px,
        kf_min_tracked=vo.kf_min_tracked,
        min_parallax_px=vo.min_parallax_px,
        replenish_radius=vo.replenish_radius,
        ba_every_kfs=vo.ba_every_kfs,
        ba_max_iters=ba.interval_max_iters or ba.max_iters,
        ba_pcg_iters=ba.interval_pcg_iters or ba.pcg_iters,
        ba_obs_cap=ba.local_obs_cap,
        huber_delta=ba.huber_px / float(camera.fx),
        cam_model=model, klt=vo.klt)


# Pre-boot tracking chunk length (one relay dispatch per chunk) and the
# vmapped retroactive-PnP batch width.
_BOOT_CHUNK = 16
_RETRO_CAP = 16


@partial(jax.jit, static_argnames=("klt",), donate_argnums=(2, 3))
def _boot_track_chunk(prev_pyr, imgs, pos, alive, klt: KLTConfig):
    """KLT-only tracking over a chunk of frames: ONE dispatch replaces the
    host bootstrap's 2-3 dispatches per frame. Emits every frame's
    (positions, alive) so the host can pick the boot frame and feed the
    retroactive PnP without re-tracking."""
    def body(carry, img):
        pyr_p, p, a = carry
        pyr = build_pyramid(img, klt)
        new, st, _ = track_pyramids(pyr_p, pyr, p, a, klt)
        a2 = a & st
        return (tuple(pyr), new, a2), (new, a2)

    (pyr, pos, alive), ys = jax.lax.scan(
        body, (tuple(prev_pyr), pos, alive), imgs)
    return pyr, pos, alive, ys


@partial(jax.jit, static_argnames=("n_hyp", "min_inliers"))
def _retro_pnp(keys, X, xs, masks, thr, n_hyp, min_inliers):
    """Retroactive PnP for every pre-bootstrap frame as ONE vmapped
    dispatch (the host loop pays one RANSAC dispatch per frame)."""
    def one(key, x, msk):
        pn = ransac_pnp(key, X, x, msk, thr=thr, n_hyp=n_hyp,
                        min_inliers=min_inliers)
        return pn.ok, pn.pose.R, pn.pose.t

    return jax.vmap(one)(keys, xs, masks)


def _fast_bootstrap(stack, n, camera, cfg, vo: VOConfig, thr_n, base_key):
    """Two-view VO bootstrap with device-batched dispatches.

    Same policy as the host loop in pipeline/vo.py (detect at frame 0,
    KLT until the root tracks' median flow clears ``bootstrap_px`` with
    >= 16 survivors, essential RANSAC, DLT triangulation with cheirality
    gates, retroactive PnP with the flagged constant-position fallback,
    gauge-fixing two-view BA) — but the pre-boot tracking runs as chunk
    scans and the retroactive solves as one vmapped call. Returns
    (rec, boot) with ``boot`` the scan engine's initial track state.
    """
    C = vo.capacity
    rec = Reconstruction(cfg=cfg, camera=camera)
    stats = rec.frame_stats

    kps = shi_tomasi(stack[0], capacity=C)
    pos0 = np.asarray(kps.xy).copy()
    m0 = np.asarray(kps.mask).copy()
    first_pos = pos0.copy()
    rec.pose_mask[0] = True
    rec.n_frames = 1
    stats.append(dict(frame=0, tracked=int(m0.sum()), kf=True))

    pyr_prev = build_pyramid(stack[0], vo.klt)
    pos_d, alive_d = jnp.asarray(pos0), jnp.asarray(m0)
    hist = {}
    key = base_key
    fb = None
    boot_res = None
    for c0 in range(1, n, _BOOT_CHUNK):
        c1 = min(c0 + _BOOT_CHUNK, n)
        pyr_prev, pos_d, alive_d, ys = _boot_track_chunk(
            pyr_prev, stack[c0:c1], pos_d, alive_d, vo.klt)
        ys_pos = np.asarray(ys[0])
        ys_alive = np.asarray(ys[1])
        for k, fi in enumerate(range(c0, c1)):
            p_i, a_i = ys_pos[k], ys_alive[k]
            hist[fi] = (p_i, a_i)
            rec.n_frames = fi + 1
            fstat = dict(frame=fi, tracked=int(a_i.sum()), kf=False)
            stats.append(fstat)
            # Pre-boot every live track is a root (no replenishment yet).
            flow = (np.linalg.norm(p_i[a_i] - first_pos[a_i], axis=1)
                    if a_i.any() else np.zeros(1))
            if np.median(flow) > vo.bootstrap_px and a_i.sum() >= 16:
                # Compact + bucket-pad exactly like the host loop: RANSAC
                # over the full 512-slot mask draws a different (and on
                # marginal scenes worse) Gumbel lottery than over the
                # ~live-count rows.
                sroot = np.where(a_i)[0]
                x1 = _normalize(first_pos[sroot], camera).astype(np.float32)
                x2 = _normalize(p_i[sroot], camera).astype(np.float32)
                x1p, x2p, pm = _pad_for_ransac([x1, x2], len(sroot))
                key, sub = jax.random.split(key)
                res = ransac_essential(
                    sub, jnp.asarray(x1p), jnp.asarray(x2p),
                    jnp.asarray(pm), thr=thr_n, n_hyp=cfg.ransac.n_hyp,
                    min_inliers=cfg.ransac.min_inliers)
                if bool(res.ok):
                    fb = fi
                    boot_res = res
                    boot_stat = fstat
                    break
        if fb is not None:
            break
    if fb is None:
        raise RuntimeError(
            "VO never bootstrapped: sequence has too little parallax "
            f"(needs median flow > {vo.bootstrap_px} px from frame 0)")

    rec.R[fb] = np.asarray(boot_res.R)
    rec.t[fb] = np.asarray(boot_res.t)
    rec.pose_mask[fb] = True

    # ---- triangulate the root tracks (origin frame 0) ----
    pos_fb, alive_fb = hist[fb]
    par = np.linalg.norm(pos_fb - first_pos, axis=1)
    sel = alive_fb & (par > vo.min_parallax_px)
    x1n = _normalize(first_pos, camera).astype(np.float32)
    x2n = _normalize(pos_fb, camera).astype(np.float32)
    pts, ok = triangulate_dlt(
        jnp.asarray(np.stack([rec.R[0], rec.R[fb]])),
        jnp.asarray(np.stack([rec.t[0], rec.t[fb]])),
        jnp.asarray(np.stack([x1n, x2n])),
        jnp.asarray(np.stack([sel, sel])))
    pts = np.asarray(pts)
    ok = np.asarray(ok).copy() & sel
    for Rf_, tf_ in ((rec.R[0], rec.t[0]), (rec.R[fb], rec.t[fb])):
        ok &= (pts @ Rf_.T + tf_)[:, 2] > 1e-3
    cap_p = rec.pt_mask.shape[0]
    if int(ok.sum()) > cap_p:
        ok &= np.cumsum(ok) <= cap_p
    lid = -np.ones(C, np.int64)
    sidx = np.where(ok)[0]
    if len(sidx):
        ids = rec.add_points(
            pts[sidx], np.zeros((len(sidx), rec.pt_desc.shape[1]),
                                np.float32))
        lid[sidx] = ids
        rec.add_observations(0, ids, x1n[sidx])
        sel2 = np.where(alive_fb & (lid >= 0))[0]
        rec.add_observations(fb, lid[sel2].astype(np.int32), x2n[sel2])

    # ---- retroactive PnP for frames 1..fb-1, vmapped ----
    if fb > 1 and len(sidx):
        X = np.zeros((C, 3), np.float32)
        X[lid >= 0] = rec.points[lid[lid >= 0]]
        frames = list(range(1, fb))
        for g0 in range(0, len(frames), _RETRO_CAP):
            grp = frames[g0:g0 + _RETRO_CAP]
            pad = _RETRO_CAP - len(grp)
            xs_n = np.stack(
                [_normalize(hist[f][0], camera).astype(np.float32)
                 for f in grp] + [np.zeros((C, 2), np.float32)] * pad)
            msks = np.stack([hist[f][1] & (lid >= 0) for f in grp]
                            + [np.zeros(C, bool)] * pad)
            keys = jnp.stack([jax.random.fold_in(base_key, 10_000 + f)
                              for f in grp] + [base_key] * pad)
            okv, Rv, tv = _retro_pnp(
                keys, jnp.asarray(X), jnp.asarray(xs_n), jnp.asarray(msks),
                thr_n, cfg.ransac.n_hyp, vo.pnp_min_inliers)
            okv = np.asarray(okv)
            Rv = np.asarray(Rv)
            tv = np.asarray(tv)
            for j, f in enumerate(grp):
                if bool(okv[j]):
                    rec.R[f] = Rv[j]
                    rec.t[f] = tv[j]
                else:
                    # same flagged constant-position fallback as the host
                    # loop (frame f-1 is always posed by induction)
                    rec.R[f] = rec.R[f - 1]
                    rec.t[f] = rec.t[f - 1]
                    stats[f]["pnp_failed"] = True
                rec.pose_mask[f] = True
    elif fb > 1:
        for f in range(1, fb):
            rec.R[f] = rec.R[f - 1]
            rec.t[f] = rec.t[f - 1]
            rec.pose_mask[f] = True
            stats[f]["pnp_failed"] = True

    boot_stat.update(kf=True, booted=True, points=int(rec.n_points))
    cost0, cost = rec.run_ba(free_second_cam=True)
    boot_stat.update(ba_cost0=cost0, ba_cost=cost)
    boot = dict(frame=fb, pos=pos_fb, alive=alive_fb, lid=lid,
                first_frame=np.zeros(C, np.int32), first_pos=first_pos,
                kf_pos=pos_fb.copy(), n_kfs=2)
    return rec, boot


def visual_odometry_scan(images, camera: Pinhole,
                         cfg: PipelineConfig = PipelineConfig(),
                         vo: VOConfig = VOConfig(), seed: int = 0,
                         metrics=None):
    """Scan-mode VO: device-batched bootstrap, then one compiled pass over
    the rest of the sequence.

    ``images``: (F, H, W) [0,1] grayscale stack (list or array; all frames
    must share a shape — one compile per shape). Returns the same
    ``Reconstruction`` as `visual_odometry` (export / evaluation /
    georegistration apply unchanged).
    """
    images = [np.asarray(im, np.float32) for im in images]
    n = len(images)
    if n < 2:
        raise ValueError("VO needs at least 2 frames")
    if n > cfg.map.max_frames:
        # The scan's pose writes are capacity-gated (mode="drop"), so an
        # undersized pose table would silently truncate the trajectory.
        raise ValueError(
            f"sequence has {n} frames but map.max_frames is "
            f"{cfg.map.max_frames}; raise the capacity")
    tcfg = _static_from_cfg(cfg, vo, camera)
    thr_n = jnp.float32((cfg.ransac.thr_px / float(camera.fx)) ** 2)
    base_key = jax.random.PRNGKey(seed)

    stack = jnp.asarray(np.stack(images))
    rec, boot = _fast_bootstrap(stack, n, camera, cfg, vo, thr_n, base_key)
    fb = boot["frame"]
    if fb >= n - 1:
        return rec
    # The main scan's prev-frame pyramid (one dispatch).
    boot["prev_pyr"] = tuple(build_pyramid(stack[fb], vo.klt))

    state = VOScanState(
        pos=jnp.asarray(boot["pos"]), alive=jnp.asarray(boot["alive"]),
        lid=jnp.asarray(boot["lid"].astype(np.int32)),
        first_frame=jnp.asarray(boot["first_frame"]),
        first_pos=jnp.asarray(boot["first_pos"]),
        kf_pos=jnp.asarray(boot["kf_pos"]),
        R=jnp.asarray(rec.R), t=jnp.asarray(rec.t),
        pose_mask=jnp.asarray(rec.pose_mask),
        points=jnp.asarray(rec.points), pt_mask=jnp.asarray(rec.pt_mask),
        obs_cam=jnp.asarray(rec.obs_cam), obs_pt=jnp.asarray(rec.obs_pt),
        obs_uv=jnp.asarray(rec.obs_uv), obs_mask=jnp.asarray(rec.obs_mask),
        n_points=jnp.int32(rec.n_points), n_obs=jnp.int32(rec.n_obs),
        n_kfs=jnp.int32(boot["n_kfs"]), last_ba_kf=jnp.int32(0),
        prev_pyr=tuple(boot["prev_pyr"]),
        cam=jnp.asarray(camera.intrinsics_vector()
                        if hasattr(camera, "intrinsics_vector") else
                        [camera.fx, camera.fy, camera.cx, camera.cy,
                         0, 0, 0, 0, 0], jnp.float32),
    )
    xs = (jnp.arange(fb + 1, n, dtype=jnp.int32), stack[fb + 1:])
    state, infos = _scan(state, xs, base_key, thr_n, tcfg)

    infos = jax.device_get(infos)
    if bool(np.asarray(infos.overflow).any()):
        fi = fb + 1 + int(np.argmax(np.asarray(infos.overflow)))
        raise RuntimeError(f"map capacity exceeded at frame {fi}")
    # Fold the device map back into the host container.
    rec.R = np.array(state.R)
    rec.t = np.array(state.t)
    rec.pose_mask = np.array(state.pose_mask)
    rec.points = np.array(state.points)
    rec.pt_mask = np.array(state.pt_mask)
    rec.obs_cam = np.array(state.obs_cam)
    rec.obs_pt = np.array(state.obs_pt)
    rec.obs_uv = np.array(state.obs_uv)
    rec.obs_mask = np.array(state.obs_mask)
    rec.n_points = int(state.n_points)
    rec.n_obs = int(state.n_obs)
    rec.n_frames = n
    for k, fi in enumerate(range(fb + 1, n)):
        fstat = dict(frame=fi, tracked=int(infos.tracked[k]),
                     kf=bool(infos.is_kf[k]),
                     pnp_inliers=int(infos.n_inliers[k]))
        if not bool(infos.pnp_ok[k]):
            fstat["pnp_failed"] = True
        if infos.n_new_points[k]:
            fstat["new_points"] = int(infos.n_new_points[k])
        if float(infos.ba_cost[k]) >= 0:
            fstat["ba_cost"] = float(infos.ba_cost[k])
        rec.frame_stats.append(fstat)
        if metrics is not None:
            metrics.log("vo_frame", **{k_: v for k_, v in fstat.items()
                                       if not isinstance(v, bool)})
    rec.run_ba()   # final global polish (host-level, obs-bucket-compacted)
    return rec
