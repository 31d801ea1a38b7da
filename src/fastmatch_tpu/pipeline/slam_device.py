"""Device-resident SLAM driver: slam() semantics at track_step speed.

The host loop here is thin by design (VERDICT r1 #1): per frame it issues
ONE jitted `track_step` (pipeline/tracker.py) and reads back one small
`TrackInfo`. Everything episodic — relocalization, loop-closure
verification, pose-graph correction, bundle adjustment — happens only when
the readback says so:

- PnP failure -> the SAME compiled step re-runs with an unbounded window
  (relocalization, VERDICT r1 #5); tracking loss raises only after
  ``reloc_max_failures`` consecutive frames fail even that.
- Loop votes over threshold -> `loop_verify` (one more jit, compiled once)
  geometrically verifies; on success the pose graph is solved host-side
  (posegraph/pgo.py — edge lists are genuinely dynamic) and corrected poses
  are written back into device state.
- Every ``ba.interval`` frames -> BA directly ON the device state
  (ba_problem_from_state) — no host materialization of the map.

The loop is parameterized by `SlamHooks` so the distributed pipeline
(dist/pipeline.py) can swap the retrieval and BA stages for their sharded
counterparts and overlap them, without duplicating the driver. Randomness
is keyed per sequence index (`fold_in(seed_key, fi)`), so a checkpointed
run resumes bit-deterministically.

The map state lives on device for the whole sequence; the single full
readback happens at the end when materializing the `Reconstruction`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.ba.lm import ba_solve
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import Reconstruction
from fastmatch_tpu.pipeline.slam import SlamConfig, SlamResult, _np
from fastmatch_tpu.pipeline.tracker import (
    FULL_WINDOW,
    TrackerStatic,
    TrackState,
    ba_problem_from_state,
    init_state,
    loop_verify,
    normalize_points,
    track_step,
)
from fastmatch_tpu.posegraph.pgo import PoseGraph, pgo_solve


class SlamHooks:
    """Stage-injection points for the driver loop (see dist/pipeline.py for
    the sharded implementation)."""

    def retrieval(self, state: TrackState, desc, mask):
        """Full-bank nearest-landmark match for the NEXT frame, dispatched
        early so it overlaps this frame's BA. None = compute inside
        track_step (single-device fused path)."""
        return None

    def ba(self, state: TrackState, fid, window, cfg, camera,
           covis=None, covis_thresh: int = 0) -> TrackState:
        prob = ba_problem_from_state(state, fid, window, covis=covis,
                                     covis_thresh=covis_thresh)
        # BA cost scales with the obs TABLE size, not the live count: the
        # exact LOCAL selection compacts to the same static bucket as scan
        # mode's run_ba. The compaction here must mirror scan's EXACTLY —
        # an extra count-driven power-of-two bucket (tracker.compact_obs,
        # as the final global BA uses) changes the segment-sum reduction
        # shapes, and with the capped interval budgets (BAConfig
        # interval_pcg_iters) PCG stops mid-convergence where those
        # reassociation differences are still live — breaking the engines'
        # bitwise parity contract (test_slam_scan
        # test_matches_slam_device_bitwise; at full budgets the stagnation
        # guard converges both to identical bits, which is how the bucket
        # slipped in unnoticed).
        from fastmatch_tpu.pipeline.tracker import compact_obs_local

        if cfg.ba.local_obs_cap > 0:
            prob = compact_obs_local(prob, cfg.ba.local_obs_cap)
        res = ba_solve(prob,
                       max_iters=cfg.ba.interval_max_iters or cfg.ba.max_iters,
                       pcg_iters=cfg.ba.interval_pcg_iters or cfg.ba.pcg_iters,
                       huber_delta_static=cfg.ba.huber_px / float(camera.fx))
        return state._replace(R=res.poses.R, t=res.poses.t, points=res.points)

    def after_frame(self, state: TrackState, fid: int, fi: int, out, book):
        """Called after each accepted frame with the driver bookkeeping
        dict (checkpoint hook: save_track_state(state, book, out, path))."""


def _static_from_cfg(cfg: PipelineConfig, scfg: SlamConfig,
                     cap: int, camera=None) -> TrackerStatic:
    return TrackerStatic(
        cam_model=getattr(camera, "model", "pinhole"),
        cap=cap,
        max_frames=cfg.map.max_frames,
        max_points=cfg.map.max_points,
        max_obs=cfg.map.max_obs,
        ratio=cfg.matching.ratio,
        cross_check=cfg.matching.cross_check,
        backend=cfg.matching.backend,
        precision=cfg.matching.precision,
        n_hyp=max(cfg.ransac.n_hyp // 2, 64),
        min_inliers=max(cfg.ransac.min_inliers // 2, 6),
        min_parallax_deg=cfg.map.min_parallax_deg,
        dedup_desc_d2=cfg.map.dedup_desc_d2,
        loop_gap=scfg.loop_gap,
        kf_tracked_thresh=scfg.kf_tracked_thresh,
        kf_max_gap=scfg.kf_max_gap,
    )


def _pad_frame(xy, desc, mask, cap):
    n = xy.shape[0]
    if n == cap:
        return (np.asarray(xy, np.float32), np.asarray(desc, np.float32),
                np.asarray(mask, bool))
    if n > cap:
        raise ValueError(f"frame has {n} keypoint slots > tracker cap {cap}")
    pxy = np.zeros((cap, 2), np.float32)
    pxy[:n] = xy
    pd = np.zeros((cap, 128), np.float32)
    pd[:n] = desc
    pm = np.zeros(cap, bool)
    pm[:n] = mask
    return pxy, pd, pm


def _bootstrap_host(features, camera, cfg, scfg, key):
    """Two-view bootstrap on the host (runs once; reuses slam()'s exact
    logic by driving the first two frames through the host pipeline)."""
    from fastmatch_tpu.geometry.ransac import ransac_essential
    from fastmatch_tpu.pipeline.reconstruct import (
        _match, _normalize, _pad_for_ransac, _triangulate_two_view)

    rec = Reconstruction(cfg=cfg, camera=camera)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2
    xy0, d0, m0 = features[0]
    xy1, d1, m1 = features[1]
    rec.pose_mask[0] = True
    valid, idx = _match(d1, m1, d0, m0, cfg)
    q = np.where(valid)[0]
    tr = idx[q]
    x1n = _normalize(xy1[q], camera)
    x0n = _normalize(xy0[tr], camera)
    x0p, x1p, bmask = _pad_for_ransac(
        [x0n.astype(np.float32), x1n.astype(np.float32)], len(q))
    res = ransac_essential(
        key, jnp.asarray(x0p), jnp.asarray(x1p), jnp.asarray(bmask),
        thr=thr_n, n_hyp=cfg.ransac.n_hyp,
        min_inliers=cfg.ransac.min_inliers)
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
    if cfg.ba.interval:
        rec.run_ba(free_second_cam=True)
    kp_lm1 = np.full(features[1][0].shape[0], -1, np.int64)
    kp_lm1[qi] = ids
    return rec, kp_lm1


def _prefix_upload(dst, src, n, fill=0):
    """Write ``src[:n]`` into ``dst[:B]`` (B = power-of-two bucket >= n),
    padding the bucket's tail with ``fill`` (the empty-state value).

    Why not ``jnp.asarray(src)`` at full capacity: the bootstrap map is
    ~2% live (e.g. 300 of 16384 descriptor rows), and the capacity-sized
    transfer ships megabytes of zeros through the ~17 MB/s relay every
    run. ``dst`` already holds the empty-state values on device (from
    init_state), so only a bucketed live prefix needs to move. Bucketing
    keeps the eager ``.at[:B].set`` to one compile per power of two.
    """
    cap = dst.shape[0]
    B = 512
    while B < n:
        B *= 2
    B = min(B, cap)
    if B >= cap:
        return dst.at[:cap].set(jnp.asarray(src[:cap]))
    buf = np.full((B,) + src.shape[1:], fill, src.dtype)
    buf[:n] = src[:n]
    return dst.at[:B].set(jnp.asarray(buf))


def _state_from_bootstrap(rec, features, kp_lm1, camera,
                          tcfg: TrackerStatic) -> TrackState:
    st = init_state(tcfg, camera)
    xy1, d1, m1 = _pad_frame(*features[1], tcfg.cap)
    lm1 = np.full(tcfg.cap, -1, np.int32)
    lm1[: kp_lm1.shape[0]] = kp_lm1
    xn1 = normalize_points(jnp.asarray(xy1), st.cam, tcfg.cam_model)
    nP, nO = rec.n_points, rec.n_obs
    pt_last = np.ones(nP, np.int32)  # pad/beyond stays -(1 << 30)
    return st._replace(
        R=jnp.asarray(rec.R), t=jnp.asarray(rec.t),
        pose_mask=jnp.asarray(rec.pose_mask),
        points=_prefix_upload(st.points, rec.points, nP),
        pt_mask=_prefix_upload(st.pt_mask, rec.pt_mask, nP),
        pt_desc=_prefix_upload(st.pt_desc, rec.pt_desc, nP),
        pt_last_seen=_prefix_upload(st.pt_last_seen, pt_last, nP,
                                    fill=-(1 << 30)),
        obs_cam=_prefix_upload(st.obs_cam, rec.obs_cam, nO),
        obs_pt=_prefix_upload(st.obs_pt, rec.obs_pt, nO),
        obs_uv=_prefix_upload(st.obs_uv, rec.obs_uv, nO),
        obs_mask=_prefix_upload(st.obs_mask, rec.obs_mask, nO),
        n_frames=jnp.int32(2), n_points=jnp.int32(nP),
        n_obs=jnp.int32(nO), last_kf=jnp.int32(1),
        prev_f=jnp.int32(1), prev_xn=xn1, prev_desc=jnp.asarray(d1),
        prev_mask=jnp.asarray(m1), prev_lm=jnp.asarray(lm1),
    )


def _rec_from_state(state: TrackState, cfg, camera) -> Reconstruction:
    """Materialize the device map as a host Reconstruction (one readback)."""
    rec = Reconstruction(cfg=cfg, camera=camera)
    rec.R = _np(state.R)
    rec.t = _np(state.t)
    rec.pose_mask = _np(state.pose_mask)
    rec.points = _np(state.points)
    rec.pt_mask = _np(state.pt_mask)
    rec.pt_desc = _np(state.pt_desc)
    rec.obs_cam = _np(state.obs_cam)
    rec.obs_pt = _np(state.obs_pt)
    rec.obs_uv = _np(state.obs_uv)
    rec.obs_mask = _np(state.obs_mask)
    rec.n_frames = int(state.n_frames)
    rec.n_points = int(state.n_points)
    rec.n_obs = int(state.n_obs)
    return rec


def _run_pgo(state: TrackState, odo_edges, loop_edges, scfg) -> TrackState:
    """Pose-graph correction from recorded odometry + loop edges; returns
    state with corrected poses."""
    n = state.pose_mask.shape[0]
    ei, ej, ZR, Zt, w = [], [], [], [], []
    for (i, j, R_, t_) in odo_edges:
        ei.append(i); ej.append(j); ZR.append(R_); Zt.append(t_); w.append(1.0)
    for (i, j, R_, t_) in loop_edges:
        ei.append(i); ej.append(j); ZR.append(R_); Zt.append(t_); w.append(2.0)
    pose_mask = _np(state.pose_mask)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    g = PoseGraph(
        poses=SE3(state.R, state.t),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        Z=SE3(jnp.asarray(np.stack(ZR)), jnp.asarray(np.stack(Zt))),
        edge_weight=jnp.asarray(np.array(w, np.float32)),
        pose_mask=jnp.asarray(pose_mask),
        fixed=jnp.asarray(fixed & pose_mask),
    )
    res = pgo_solve(g, max_iters=scfg.pgo_iters,
                    huber_delta_static=scfg.loop_kernel_delta,
                    kernel="geman")
    return state._replace(R=res.poses.R, t=res.poses.t)


def drive_slam(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig = PipelineConfig(),
    scfg: SlamConfig = SlamConfig(),
    seed: int = 0,
    metrics=None,
    reloc_max_failures: int = 3,
    hooks: SlamHooks | None = None,
    resume=None,
) -> SlamResult:
    """The shared driver loop (see module docstring). ``resume``: an
    optional (state, book, out) triple from checkpoint.restore_track_state
    — the loop continues from the recorded sequence position, and because
    per-frame keys are fold_in(seed, fi), the continuation is
    bit-deterministic with the uninterrupted run."""
    hooks = hooks or SlamHooks()
    cap = max(int(f[0].shape[0]) for f in features)
    cap = 1 << (cap - 1).bit_length()  # next power of two
    tcfg = _static_from_cfg(cfg, scfg, cap, camera)
    thr_n = jnp.float32((cfg.ransac.thr_px / float(camera.fx)) ** 2)
    base_key = jax.random.PRNGKey(seed)

    if resume is None:
        boot_key = jax.random.fold_in(base_key, 1)
        rec0, kp_lm1 = _bootstrap_host(features, camera, cfg, scfg, boot_key)
        state = _state_from_bootstrap(rec0, features, kp_lm1, camera, tcfg)
        out = SlamResult(rec=rec0)
        Z0 = SE3(jnp.asarray(rec0.R[1]), jnp.asarray(rec0.t[1]))
        out.odo_edges.append((1, 0, _np(Z0.R), _np(Z0.t)))
        out.frame_seq = [0, 1]
        book = {
            "prev_pose_R": rec0.R[1].copy(), "prev_pose_t": rec0.t[1].copy(),
            "prev_fid": 1, "next_fid": 2, "next_fi": 2,
            "last_closure": -(1 << 30),
        }
    else:
        state, book, out = resume

    window = jnp.int32(scfg.window)
    prev_pose = (book["prev_pose_R"], book["prev_pose_t"])
    prev_fid = int(book["prev_fid"])
    next_fid = int(book["next_fid"])
    start_fi = int(book["next_fi"])
    last_closure = int(book["last_closure"])
    consec_fail = 0

    frames = {}

    def frame_at(fi):
        if fi not in frames:
            frames.clear()  # keep at most one frame resident
            xy, d, m = _pad_frame(*features[fi], cap)
            frames[fi] = (jnp.asarray(xy), jnp.asarray(d), jnp.asarray(m))
        return frames[fi]

    # Retrieval prefetch: mf for frame fi is dispatched during frame fi-1's
    # BA/PGO work (overlap; see SlamHooks.retrieval). Correctness: mf
    # depends only on pt_desc/pt_mask, which change only inside track_step
    # — never in BA (points/poses) or PGO (poses) — so the prefetched match
    # is EXACTLY what the fused path would compute.
    mf_next = None
    if start_fi < len(features):
        _, dj0, mj0 = frame_at(start_fi)
        mf_next = hooks.retrieval(state, dj0, mj0)

    for fi in range(start_fi, len(features)):
        xyj, dj, mj = frame_at(fi)
        mf = mf_next
        fkey = jax.random.fold_in(base_key, fi)
        state, info = track_step(state, xyj, dj, mj,
                                 jax.random.fold_in(fkey, 0),
                                 thr_n, window, tcfg, mf=mf)
        # ONE host<->device transfer for the whole readback: per-field
        # access would pay the ~450 us relay latency ~10x per frame.
        info = jax.device_get(info)
        ok = bool(info.ok)
        if not ok:
            # Relocalize: same compiled step, unbounded window.
            state, info = track_step(state, xyj, dj, mj,
                                     jax.random.fold_in(fkey, 1),
                                     thr_n, jnp.int32(FULL_WINDOW), tcfg,
                                     mf=mf)
            info = jax.device_get(info)
            ok = bool(info.ok)
            if metrics:
                metrics.log("relocalize", frame=fi, success=ok,
                            n_inliers=int(info.n_inliers))
        # Prefetch next frame's retrieval against the post-step bank,
        # BEFORE any BA/PGO below is dispatched or read back.
        if fi + 1 < len(features):
            _, nd, nm = frame_at(fi + 1)
            mf_next = hooks.retrieval(state, nd, nm)
        if not ok:
            consec_fail += 1
            if consec_fail > reloc_max_failures:
                raise RuntimeError(
                    f"SLAM tracking lost at frame {fi} "
                    f"(relocalization failed {consec_fail} consecutive "
                    f"frames; {int(info.n_inliers)} inliers last attempt)")
            continue
        consec_fail = 0
        if bool(info.overflow):
            raise RuntimeError(
                f"map capacity exceeded at frame {fi} (points "
                f"{int(info.n_points)}/{tcfg.max_points}, obs "
                f"{int(info.n_obs)}/{tcfg.max_obs})")

        fid = next_fid
        next_fid += 1
        out.frame_seq.append(fi)
        # Odometry edge Z = T_f T_prev^-1, composed in host numpy (info is
        # already host-side; no device round-trip per frame).
        Rf, tf = np.asarray(info.R), np.asarray(info.t)
        Rp_, tp_ = prev_pose
        ZR = Rf @ Rp_.T
        Zt = tf - ZR @ tp_
        out.odo_edges.append((fid, prev_fid, ZR, Zt))
        prev_pose = (Rf, tf)
        prev_fid = fid
        if metrics:
            metrics.log("track", frame=fi, frame_id=fid,
                        n_candidates=int(info.n_candidates),
                        n_inliers=int(info.n_inliers),
                        keyframe=bool(info.is_kf),
                        n_points=int(info.n_points))

        # ---- loop closure ----
        closed = False
        votes = np.asarray(info.votes)
        cands = np.asarray(info.cands)
        # Cooldown: once a closure is corrected, the map near the loop
        # point keeps matching for many frames — re-running PGO + global BA
        # per frame is pure waste (observed 16 closures on a 26-frame
        # circle without this gate).
        if (votes[0] >= scfg.loop_min_votes
                and fid - last_closure >= scfg.loop_gap):
            cand = int(cands[0])
            pl, _ncand = loop_verify(state, xyj, dj, mj, jnp.int32(cand),
                                     jax.random.fold_in(fkey, 2),
                                     thr_n, tcfg)
            if bool(pl.ok):
                Tc = SE3(state.R[cand], state.t[cand])
                Zl = pl.pose.compose(Tc.inverse())
                out.loop_edges.append((fid, cand, _np(Zl.R), _np(Zl.t)))
                if metrics:
                    metrics.log("loop_closure", frame=fi, candidate=cand,
                                inliers=int(pl.n_inliers))
                state = _run_pgo(state, out.odo_edges, out.loop_edges, scfg)
                out.pgo_runs += 1
                state = hooks.ba(state, jnp.int32(fid),
                                 jnp.int32(FULL_WINDOW), cfg, camera)
                pr = _np(state.R[fid]); pt = _np(state.t[fid])
                prev_pose = (pr, pt)
                closed = True
                last_closure = fid
        if cfg.ba.interval and fid % cfg.ba.interval == 0 and not closed:
            state = hooks.ba(state, jnp.int32(fid), window, cfg, camera,
                             covis=info.covis,
                             covis_thresh=scfg.ba_covis_thresh)
            pr = _np(state.R[fid]); pt = _np(state.t[fid])
            prev_pose = (pr, pt)

        book.update(prev_pose_R=prev_pose[0], prev_pose_t=prev_pose[1],
                    prev_fid=prev_fid, next_fid=next_fid, next_fi=fi + 1,
                    last_closure=last_closure)
        hooks.after_frame(state, fid, fi, out, book)

    state = hooks.ba(state, state.n_frames, jnp.int32(FULL_WINDOW),
                     cfg, camera)
    out.rec = _rec_from_state(state, cfg, camera)
    return out


def slam_device(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig = PipelineConfig(),
    scfg: SlamConfig = SlamConfig(),
    seed: int = 0,
    metrics=None,
    reloc_max_failures: int = 3,
) -> SlamResult:
    """Device-resident SLAM over a feature sequence (same API/result as
    pipeline/slam.slam). One jitted step + one small readback per frame."""
    return drive_slam(features, camera, cfg, scfg, seed=seed,
                      metrics=metrics, reloc_max_failures=reloc_max_failures)
