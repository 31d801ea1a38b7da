"""Global SfM pipeline: averaging instead of incremental chaining.

The second reconstruction family next to pipeline/reconstruct.py
(BASELINE.json config 3): estimate ALL rotations at once from pairwise
relative rotations, then all camera centers from pairwise translation
directions, then triangulate full tracks in one multiview DLT batch and
run ONE global bundle adjustment. Compared to the incremental engine:

- no drift accumulation (loop edges constrain the solution from the
  start, no pose-graph repair pass needed),
- the device work is a handful of LARGE batches (E-edge matching /
  RANSAC, one rotation-averaging solve, one translation-averaging
  solve, one (F, T)-grid triangulation, one BA) instead of per-frame
  dispatch — the shape a TPU wants,
- but it needs the whole sequence up front (offline, like
  slam_scan.py's scan mode).

Stages:
  1. detect (optional) + pairwise matching over a window of frame pairs
     (the existing fused matcher kernel, one compile for all pairs),
  2. per-pair essential RANSAC -> ViewGraph edges (R_ij, t_ij, inliers),
  3. track building by union-find over the pairwise matches (host —
     pure graph bookkeeping, no FLOPs),
  4. rotation averaging -> edge filter -> translation averaging
     (geometry/averaging.py),
  5. multiview DLT triangulation of all tracks at once + reprojection
     gating,
  6. global BA (ba/lm.py) on the averaged init.

Returns the same ``Reconstruction`` container as the incremental
pipeline, so export (PLY/COLMAP/KITTI), self-calibration, and
evaluation all apply unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.geometry.averaging import (
    ViewGraph,
    filter_edges_by_rotation,
    rotation_averaging,
    spanning_tree_rotations,
    translation_averaging,
)
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.pipeline.config import PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import (
    Reconstruction,
    _match,
    _normalize,
    _pad_for_ransac,
)


class _UnionFind:
    """Plain array union-find for track building."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, a: int) -> int:
        p = self.parent
        root = a
        while p[root] != root:
            root = p[root]
        while p[a] != root:          # path compression
            p[a], a = root, p[a]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_view_graph(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig,
    key: jax.Array,
    window: int = 8,
    min_inliers: int = 24,
):
    """Match + RANSAC every frame pair within ``window``; returns
    (ViewGraph, pair_matches) where pair_matches[(i, j)] is the (K, 2)
    int array of inlier keypoint index pairs used for track building.

    The RANSAC input is bucket-padded (reconstruct._pad_for_ransac) so
    every pair reuses one compiled program regardless of match count.
    """
    F = len(features)
    thr_n = (cfg.ransac.thr_px / float(camera.fx)) ** 2
    ei, ej, R_ij, t_ij, weight = [], [], [], [], []
    pair_matches = {}
    for i in range(F):
        xy_i, d_i, m_i = features[i]
        for j in range(i + 1, min(i + 1 + window, F)):
            xy_j, d_j, m_j = features[j]
            valid, idx = _match(d_i, m_i, d_j, m_j, cfg)
            q = np.where(valid)[0]
            if len(q) < 8:
                continue
            x1 = _normalize(xy_i[q], camera).astype(np.float32)
            x2 = _normalize(xy_j[idx[q]], camera).astype(np.float32)
            x1p, x2p, pmask = _pad_for_ransac([x1, x2], len(q))
            key, sub = jax.random.split(key)
            res = ransac_essential(
                sub, jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(pmask),
                thr=thr_n, n_hyp=cfg.ransac.n_hyp,
                min_inliers=max(min_inliers, cfg.ransac.min_inliers),
            )
            if not bool(res.ok) or int(res.n_inliers) < min_inliers:
                continue
            inl = np.asarray(res.inliers)[: len(q)]
            ei.append(i)
            ej.append(j)
            R_ij.append(np.asarray(res.R))
            t_ij.append(np.asarray(res.t))
            weight.append(float(res.n_inliers))
            pair_matches[(i, j)] = np.stack(
                [q[inl], idx[q][inl]], axis=1).astype(np.int64)
    E = len(ei)
    if E == 0:
        raise RuntimeError("view graph is empty: no pair had enough inliers")
    g = ViewGraph(
        edge_i=jnp.asarray(np.asarray(ei, np.int32)),
        edge_j=jnp.asarray(np.asarray(ej, np.int32)),
        R_ij=jnp.asarray(np.stack(R_ij).astype(np.float32)),
        t_ij=jnp.asarray(np.stack(t_ij).astype(np.float32)),
        weight=jnp.asarray(np.asarray(weight, np.float32)),
        mask=jnp.ones(E, bool),
    )
    return g, pair_matches


def build_tracks(pair_matches: dict, n_kps: list, min_len: int = 2,
                 max_tracks: int | None = None):
    """Union-find over pairwise inlier matches -> tracks.

    n_kps[f] = keypoint capacity of frame f. Returns (track_frame,
    track_kp, track_id): parallel int arrays, one row per observation,
    tracks sorted by length (longest first). A track contributes at most
    one observation per frame (the first seen wins — a same-frame
    collision means one of the merges was wrong; COLMAP drops these too).
    """
    offs = np.cumsum([0] + list(n_kps))
    uf = _UnionFind(int(offs[-1]))
    for (i, j), m in pair_matches.items():
        a = offs[i] + m[:, 0]
        b = offs[j] + m[:, 1]
        for x, y in zip(a, b):
            uf.union(int(x), int(y))
    obs_f, obs_k, obs_t = [], [], []
    members: dict[int, dict] = {}
    for (i, j), m in pair_matches.items():
        for row in m:
            for f, k in ((i, int(row[0])), (j, int(row[1]))):
                gid = int(offs[f] + k)
                members.setdefault(uf.find(gid), {})[gid] = (f, k)
    tracks = [list(mem.values()) for mem in members.values()
              if len(mem) >= min_len]
    tracks.sort(key=len, reverse=True)
    if max_tracks is not None:
        tracks = tracks[:max_tracks]
    for tid, tr in enumerate(tracks):
        seen_frames = set()
        for f, k in tr:
            if f in seen_frames:
                continue
            seen_frames.add(f)
            obs_f.append(f)
            obs_k.append(k)
            obs_t.append(tid)
    return (np.asarray(obs_f, np.int32), np.asarray(obs_k, np.int32),
            np.asarray(obs_t, np.int32), len(tracks))


def global_reconstruct(
    features: list,
    camera: Pinhole,
    cfg: PipelineConfig = PipelineConfig(),
    images=None,
    window: int = 8,
    min_inliers: int = 24,
    seed: int = 0,
    rot_iters: int = 15,
    trans_irls_iters: int = 5,
    metrics=None,
) -> Reconstruction:
    """Run global SfM over a sequence; returns a Reconstruction.

    features: list of (xy_px (N, 2), desc (N, D), mask (N,)) per frame
    (same contract as pipeline.reconstruct). ``window``: match each
    frame against the next ``window`` frames — the view graph must stay
    parallel-rigid (see geometry/averaging.py), so keep it >= 4.
    """
    if features is None:
        from fastmatch_tpu.features.sift import detect_and_describe

        features = []
        for img in images:
            kps, descs = detect_and_describe(jnp.asarray(img), cfg.sift)
            features.append(
                (np.asarray(kps.xy), np.asarray(descs.data),
                 np.asarray(descs.mask))
            )
    F = len(features)
    key = jax.random.PRNGKey(seed)

    # 1-2. view graph
    g, pair_matches = build_view_graph(
        features, camera, cfg, key, window=window, min_inliers=min_inliers)
    n_edges = int(np.sum(np.asarray(g.mask)))

    # 3. tracks
    cap_pts = cfg.map.max_points
    obs_f, obs_k, obs_t, n_tracks = build_tracks(
        pair_matches, [f[0].shape[0] for f in features],
        max_tracks=cap_pts)
    if metrics is not None:
        metrics.log("view_graph", edges=n_edges,
                    tracks=n_tracks, obs=len(obs_f))

    # 4. averaging
    R0 = spanning_tree_rotations(
        g.edge_i, g.edge_j, g.R_ij, g.weight, g.mask, F)
    R = rotation_averaging(g, F, jnp.asarray(R0), iters=rot_iters)
    gf = filter_edges_by_rotation(g, R)
    # Never filter below a spanning tree: if the filter ate too much
    # (wrong-but-consistent subgraphs), fall back to the unfiltered graph.
    if int(np.sum(np.asarray(gf.mask))) < F - 1:
        gf = g
    C = translation_averaging(gf, R, F, irls_iters=trans_irls_iters)
    R_np = np.asarray(R)
    t_np = -np.einsum("fab,fb->fa", R_np, np.asarray(C))

    # 5. triangulate all tracks in one (F, T) DLT batch
    uv_grid = np.zeros((F, n_tracks, 2), np.float32)
    vis = np.zeros((F, n_tracks), bool)
    for f, k, t in zip(obs_f, obs_k, obs_t):
        uv_grid[f, t] = _normalize(features[f][0][k][None], camera)[0]
        vis[f, t] = True
    pts, ok = triangulate_dlt(
        jnp.asarray(R_np), jnp.asarray(t_np),
        jnp.asarray(uv_grid), jnp.asarray(vis))
    pts, ok = np.asarray(pts), np.asarray(ok)
    # Reprojection + cheirality gate per observation; drop tracks whose
    # surviving support falls under two views.
    cam_pts = np.einsum("fab,tb->fta", R_np, pts) + t_np[:, None, :]
    z = cam_pts[..., 2]
    proj = cam_pts[..., :2] / np.clip(z[..., None], 1e-9, None)
    err2 = np.sum((proj - uv_grid) ** 2, -1)
    thr_n2 = (2.0 * cfg.ransac.thr_px / float(camera.fx)) ** 2
    good_obs = vis & ok[None, :] & (z > 1e-3) & (err2 < thr_n2)
    good_track = good_obs.sum(0) >= 2

    # 6. pack into a Reconstruction and run one global BA
    rec = Reconstruction(cfg=cfg, camera=camera)
    if F > rec.pose_mask.shape[0]:
        raise RuntimeError("sequence longer than map.max_frames")
    rec.R[:F] = R_np
    rec.t[:F] = t_np
    rec.pose_mask[:F] = True
    rec.n_frames = F
    tids = np.where(good_track)[0]
    desc_dim = features[0][1].shape[1]
    track_desc = np.zeros((len(tids), desc_dim), np.float32)
    remap = -np.ones(n_tracks, np.int64)
    remap[tids] = np.arange(len(tids))
    # A track's descriptor: its first surviving observation's descriptor.
    pt_ids = rec.add_points(pts[tids], track_desc)
    for f, k, t in zip(obs_f, obs_k, obs_t):
        if remap[t] < 0 or not good_obs[f, t]:
            continue
        pid = pt_ids[remap[t]]
        if not rec.pt_desc[pid].any():
            rec.pt_desc[pid] = features[f][1][k]
        rec.add_observations(
            f, np.asarray([pid]),
            _normalize(features[f][0][k][None], camera).astype(np.float32))
    # Gauge: fix camera 0 only (free_second_cam) — freezing camera 1 too
    # would permanently bake in its averaging error; the |t1|=1 rescale
    # restores the monocular scale gauge afterwards.
    cost0, cost = rec.run_ba(free_second_cam=True)
    rec.frame_stats.append(dict(
        stage="global", edges=n_edges, tracks=int(good_track.sum()),
        obs=rec.n_obs, ba_cost0=cost0, ba_cost=cost))
    if metrics is not None:
        metrics.log("global_ba", cost0=cost0, cost=cost,
                    points=int(rec.n_points), obs=int(rec.n_obs))
    return rec
