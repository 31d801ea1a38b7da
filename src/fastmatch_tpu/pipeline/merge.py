"""Multi-session map merging: align two maps into one reconstruction.

A user with two overlapping mapping sessions (two runs of `slam` /
`reconstruct` / `vo` over the same area) gets one joint map:

1. **Cross-localization.** Each of map B's keyframes is localized
   against map A through the hierarchical retrieval stack
   (pipeline/retrieval.py): VLAD retrieve -> match the retrieved
   keyframes' landmark union -> RANSAC PnP. Observation tables store
   normalized coords, so this drives the `_normalized` entry directly.
2. **Gauge alignment.** The localized frames give B-trajectory camera
   centers in A's world; a trimmed Umeyama fit (same robustification as
   pipeline/georegister.py) recovers the Sim(3) B->A — monocular maps
   differ by scale, not just pose — and `apply_sim3` moves all of B
   (poses + landmarks) into A's gauge.
3. **Landmark dedup.** B's landmark descriptors are matched against A's
   bank (ratio + mutual cross-check, the strict two-sided test) and
   pairs within a 3D gate merge: B's observations re-point at A's
   landmark id. Everything else appends as new landmarks.
4. **Optional joint BA** (`refine=True`) over the merged map welds the
   seam (B's duplicated-structure observations now constrain A's
   landmarks directly).

The merged map lives in A's coordinate frame and uses A's camera model;
both sessions must share intrinsics (the usual multi-session case: one
rig, many runs). CLI: `fastmatch-tpu merge <ckpt_a> <ckpt_b> --out dir`.

Reference scope: arnfred/Fast-Match is single-pair matching research
(SURVEY.md §1.1) — multi-session mapping is a north-star product
extension composed entirely from the engine's own layers.
"""

from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.matching.matcher import match_pair
from fastmatch_tpu.pipeline.retrieval import (
    KeyframeDB,
    _bucket,
    build_keyframe_db,
    localize_hierarchical_normalized,
)
from fastmatch_tpu.utils.evaluation import align_umeyama


def _frame_obs(rec, f: int):
    """Frame f's observations: (normalized uv, landmark descriptors)."""
    sel = np.asarray(rec.obs_mask, bool) & (np.asarray(rec.obs_cam) == f)
    pts = np.asarray(rec.obs_pt, np.int64)[sel]
    return np.asarray(rec.obs_uv, np.float32)[sel], \
        np.asarray(rec.pt_desc, np.float32)[pts]


def localize_frames(rec_a, db: KeyframeDB, rec_b, frames, thr_n: float,
                    topk: int = 4, min_inliers: int = 12, seed: int = 0):
    """Localize map B's ``frames`` against map A. Returns
    (ok (F,), R (F, 3, 3), t (F, 3), n_inliers (F,)) in A's world."""
    ok = np.zeros(len(frames), bool)
    Rs = np.zeros((len(frames), 3, 3), np.float32)
    ts = np.zeros((len(frames), 3), np.float32)
    ninl = np.zeros(len(frames), np.int32)
    for k, f in enumerate(frames):
        uv, desc = _frame_obs(rec_b, f)
        if uv.shape[0] < min_inliers:
            continue
        cap = _bucket(uv.shape[0], floor=256)
        xn = np.zeros((cap, 2), np.float32)
        dq = np.zeros((cap, desc.shape[1]), np.float32)
        mq = np.zeros(cap, bool)
        xn[: uv.shape[0]] = uv
        dq[: desc.shape[0]] = desc
        mq[: uv.shape[0]] = True
        r = localize_hierarchical_normalized(
            rec_a, db, xn, dq, mq, thr_n, topk=topk,
            min_inliers=min_inliers, seed=seed + k)
        ok[k] = bool(r.ok)
        if ok[k]:
            Rs[k] = np.asarray(r.R)
            ts[k] = np.asarray(r.t)
            ninl[k] = int(r.n_inliers)
    return ok, Rs, ts, ninl


def merge_maps(
    rec_a,
    rec_b,
    thr_px: float = 2.0,
    topk: int = 4,
    stride: int = 1,
    min_localized: int = 3,
    min_inliers: int = 12,
    n_words: int = 64,
    dedup_ratio: float = 0.8,
    dedup_thr: float | None = None,
    refine: bool = True,
    seed: int = 0,
):
    """Merge map B into map A's frame. Returns (merged, summary dict).

    ``dedup_thr``: max 3D distance (A's units) for two mutually-matched
    landmarks to be merged; default 2% of A's landmark-cloud diameter.
    Raises ValueError when fewer than ``min_localized`` of B's sampled
    frames localize in A (maps don't overlap enough to align).
    """
    import dataclasses

    from fastmatch_tpu.pipeline.georegister import apply_sim3
    from fastmatch_tpu.pipeline.reconstruct import Reconstruction

    thr_n = (thr_px / float(rec_a.camera.fx)) ** 2
    db = build_keyframe_db(rec_a, n_words=n_words, seed=seed)

    frames = [f for f in range(0, rec_b.n_frames, stride)
              if rec_b.pose_mask[f]]
    ok, Rw, tw, ninl = localize_frames(
        rec_a, db, rec_b, frames, thr_n, topk=topk,
        min_inliers=min_inliers, seed=seed)
    n_loc = int(ok.sum())
    if n_loc < min_localized:
        raise ValueError(
            f"maps do not overlap: only {n_loc}/{len(frames)} of B's "
            f"frames localized in A (need {min_localized})")

    # Trimmed Umeyama Sim(3) from B-gauge centers to their localized
    # A-gauge centers (georegister's robustification: L2 Umeyama + trim
    # at 3x median residual — one bad PnP must not bend the gauge).
    fb = np.asarray(frames)[ok]
    Cb = -np.einsum("fji,fj->fi", rec_b.R[fb], rec_b.t[fb])
    Ca = -np.einsum("fji,fj->fi", Rw[ok], tw[ok])
    mask = np.ones(fb.shape[0], bool)
    for _ in range(3):
        s, Rs3, ts3 = align_umeyama(jnp.asarray(Cb), jnp.asarray(Ca),
                                    mask=jnp.asarray(mask))
        aligned = float(s) * Cb @ np.asarray(Rs3).T + np.asarray(ts3)
        res = np.linalg.norm(aligned - Ca, axis=-1)
        med = np.median(res[mask])
        new_mask = res <= max(3.0 * med, 1e-9)
        if new_mask.sum() < 3 or new_mask.all() or (new_mask == mask).all():
            break
        mask = new_mask
    align_rmse = float(np.sqrt(np.mean(
        np.sum((aligned[mask] - Ca[mask]) ** 2, -1))))

    b = copy.deepcopy(rec_b)
    apply_sim3(b, float(s), np.asarray(Rs3), np.asarray(ts3))

    # Landmark dedup: mutual descriptor match + 3D gate.
    if dedup_thr is None:
        pa = rec_a.points[rec_a.pt_mask]
        dedup_thr = 0.02 * float(np.linalg.norm(pa.max(0) - pa.min(0))) \
            if pa.shape[0] else 0.0
    capq = _bucket(b.pt_desc.shape[0], floor=256)
    capb = _bucket(rec_a.pt_desc.shape[0], floor=256)

    def padded(desc, mask_, cap):
        d = np.zeros((cap, desc.shape[1]), np.float32)
        m = np.zeros(cap, bool)
        d[: desc.shape[0]] = desc
        m[: mask_.shape[0]] = mask_
        return Descriptors(jnp.asarray(d), jnp.asarray(m))

    mm = match_pair(padded(b.pt_desc, b.pt_mask, capq),
                    padded(rec_a.pt_desc, rec_a.pt_mask, capb),
                    ratio=dedup_ratio, cross_check=True)
    mvalid = np.asarray(mm.valid)[: b.pt_desc.shape[0]]
    midx = np.asarray(mm.idx)[: b.pt_desc.shape[0]]
    pmap = np.full(b.pt_desc.shape[0], -1, np.int64)  # B id -> A id
    cand = np.flatnonzero(mvalid & b.pt_mask)
    if cand.size:
        d3 = np.linalg.norm(b.points[cand] - rec_a.points[midx[cand]],
                            axis=-1)
        hit = cand[d3 <= dedup_thr]
        pmap[hit] = midx[hit]
    n_dedup = int((pmap >= 0).sum())

    # Assemble the merged reconstruction (A's config family, summed
    # capacities; A's camera).
    nA_f, nB_f = rec_a.n_frames, b.n_frames
    nA_p = rec_a.n_points
    new_b = np.flatnonzero((pmap < 0) & b.pt_mask[: b.pt_desc.shape[0]])
    n_obs_b = int(b.obs_mask.sum())
    mcfg = dataclasses.replace(
        rec_a.cfg.map,
        max_frames=nA_f + nB_f,
        max_points=nA_p + int(new_b.size),
        max_obs=int(rec_a.n_obs + n_obs_b),
    )
    cfg = dataclasses.replace(rec_a.cfg, map=mcfg)
    merged = Reconstruction(cfg=cfg, camera=rec_a.camera)

    # A verbatim.
    merged.R[:nA_f] = rec_a.R[:nA_f]
    merged.t[:nA_f] = rec_a.t[:nA_f]
    merged.pose_mask[:nA_f] = rec_a.pose_mask[:nA_f]
    merged.n_frames = nA_f
    merged.points[:nA_p] = rec_a.points[:nA_p]
    merged.pt_mask[:nA_p] = rec_a.pt_mask[:nA_p]
    merged.pt_desc[:nA_p] = rec_a.pt_desc[:nA_p]
    merged.n_points = nA_p
    a_obs = np.flatnonzero(rec_a.obs_mask)
    merged.obs_cam[: a_obs.size] = rec_a.obs_cam[a_obs]
    merged.obs_pt[: a_obs.size] = rec_a.obs_pt[a_obs]
    merged.obs_uv[: a_obs.size] = rec_a.obs_uv[a_obs]
    merged.obs_mask[: a_obs.size] = True
    merged.n_obs = a_obs.size

    # B's frames, offset.
    merged.R[nA_f : nA_f + nB_f] = b.R[:nB_f]
    merged.t[nA_f : nA_f + nB_f] = b.t[:nB_f]
    merged.pose_mask[nA_f : nA_f + nB_f] = b.pose_mask[:nB_f]
    merged.n_frames = nA_f + nB_f

    # B's surviving landmarks; pmap gains the appended ids.
    ids = merged.add_points(b.points[new_b], b.pt_desc[new_b])
    pmap[new_b] = ids

    # B's observations, remapped (frames offset, landmarks via pmap).
    b_obs = np.flatnonzero(b.obs_mask)
    keep = pmap[b.obs_pt[b_obs]] >= 0
    b_obs = b_obs[keep]
    for f in range(nB_f):
        sel = b_obs[b.obs_cam[b_obs] == f]
        if sel.size:
            merged.add_observations(nA_f + f, pmap[b.obs_pt[sel]],
                                    b.obs_uv[sel])

    summary = {
        "n_localized": n_loc, "of": len(frames),
        "scale": float(s), "align_rmse": align_rmse,
        "n_dedup": n_dedup, "n_new_points": int(new_b.size),
        "dedup_thr": float(dedup_thr),
    }
    if refine:
        c0, c1 = merged.run_ba()
        summary["ba_cost"] = [c0, c1]
    return merged, summary


def rec_from_checkpoint(path: str, camera):
    """Load a `checkpoint.save_map` directory into a full Reconstruction
    (capacities sized from the saved arrays; config hash not enforced —
    a merge legitimately crosses sessions/configs)."""
    import os

    import dataclasses

    import orbax.checkpoint as ocp

    from fastmatch_tpu.pipeline.checkpoint import restore_map
    from fastmatch_tpu.pipeline.config import PipelineConfig
    from fastmatch_tpu.pipeline.reconstruct import Reconstruction

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    cfg = PipelineConfig()
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map,
        max_frames=int(np.asarray(tree["pose_mask"]).shape[0]),
        max_points=int(np.asarray(tree["pt_mask"]).shape[0]),
        max_obs=int(np.asarray(tree["obs_mask"]).shape[0]),
        desc_dim=int(np.asarray(tree["pt_desc"]).shape[1]),
    ))
    rec = Reconstruction(cfg=cfg, camera=camera)
    return restore_map(rec, path, strict_config=False)
