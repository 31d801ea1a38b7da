"""Global SfM family: rotation/translation averaging + the pipeline.

Solver tiers use synthetic view graphs with known gauge; the e2e tier
runs the full global_reconstruct on a SyntheticScene and asserts ATE
(the same oracle discipline as test_pipeline for the incremental
engine)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.lie import SO3
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.geometry.averaging import (
    ViewGraph,
    filter_edges_by_rotation,
    rotation_averaging,
    spanning_tree_rotations,
    translation_averaging,
)
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.global_sfm import (
    build_tracks,
    global_reconstruct,
)
from fastmatch_tpu.utils.evaluation import ate_rmse
from synth import SyntheticScene
from test_pipeline import synthetic_features


def _make_graph(rng, F=24, rot_noise=0.0, dir_noise=0.0, out_frac=0.0,
                window=5, n_loops=15):
    """Synthetic rigid view graph (window edges + random loop edges)."""
    R_gt = np.array(SO3.exp(jnp.asarray(
        rng.normal(0, 0.5, (F, 3)).astype(np.float32))))
    C_gt = rng.normal(0, 3.0, (F, 3)).astype(np.float32)
    edges = sorted(set(
        [(i, j) for i in range(F) for j in range(i + 1, min(i + 1 + window, F))]
        + [(int(a), int(b)) for a, b in rng.integers(0, F, (n_loops, 2))
           if a < b]))
    E = len(edges)
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    Rij = np.einsum("eab,ecb->eac", R_gt[ej], R_gt[ei])
    if rot_noise:
        n = np.array(SO3.exp(jnp.asarray(
            rng.normal(0, rot_noise, (E, 3)).astype(np.float32))))
        Rij = np.einsum("eab,ebc->eac", n, Rij)
    tij = np.einsum("eab,eb->ea", R_gt[ej], C_gt[ei] - C_gt[ej])
    tij /= np.linalg.norm(tij, axis=-1, keepdims=True)
    if dir_noise:
        tij = tij + dir_noise * rng.standard_normal(tij.shape)
        tij /= np.linalg.norm(tij, axis=-1, keepdims=True)
    w = np.full(E, 100.0, np.float32)
    if out_frac:
        k = int(E * out_frac)
        idx = rng.choice(E, k, replace=False)
        Rij[idx] = np.array(SO3.exp(jnp.asarray(
            rng.normal(0, 2.0, (k, 3)).astype(np.float32))))
        td = rng.standard_normal((k, 3))
        tij[idx] = td / np.linalg.norm(td, axis=-1, keepdims=True)
        w[idx] = 30.0
    g = ViewGraph(jnp.asarray(ei), jnp.asarray(ej),
                  jnp.asarray(Rij.astype(np.float32)),
                  jnp.asarray(tij.astype(np.float32)),
                  jnp.asarray(w), jnp.ones(E, bool))
    return g, R_gt, C_gt


def _rot_err_deg(R_est, R_gt):
    """Max angular error after removing the global right-gauge."""
    errs = []
    for i in range(R_gt.shape[0]):
        D = (R_est[i] @ R_est[0].T) @ (R_gt[i] @ R_gt[0].T).T
        errs.append(np.degrees(np.arccos(
            np.clip((np.trace(D) - 1) / 2, -1, 1))))
    return np.asarray(errs)


class TestRotationAveraging:
    def test_exact_recovery(self, rng):
        g, R_gt, _ = _make_graph(rng)
        R0 = spanning_tree_rotations(g.edge_i, g.edge_j, g.R_ij,
                                     g.weight, g.mask, R_gt.shape[0])
        R = np.array(rotation_averaging(g, R_gt.shape[0], jnp.asarray(R0)))
        assert _rot_err_deg(R, R_gt).max() < 0.1

    def test_noise_and_outliers(self, rng):
        g, R_gt, _ = _make_graph(rng, rot_noise=0.01, out_frac=0.1)
        F = R_gt.shape[0]
        R0 = spanning_tree_rotations(g.edge_i, g.edge_j, g.R_ij,
                                     g.weight, g.mask, F)
        R = np.array(rotation_averaging(g, F, jnp.asarray(R0)))
        # 0.57 deg/edge noise + 10% outliers: errors stay degree-scale
        # (tree init alone can be arbitrarily wrong through an outlier).
        assert _rot_err_deg(R, R_gt).max() < 3.0

    def test_beats_spanning_tree_under_noise(self, rng):
        g, R_gt, _ = _make_graph(rng, rot_noise=0.05)
        F = R_gt.shape[0]
        R0 = spanning_tree_rotations(g.edge_i, g.edge_j, g.R_ij,
                                     g.weight, g.mask, F)
        R = np.array(rotation_averaging(g, F, jnp.asarray(R0)))
        assert _rot_err_deg(R, R_gt).mean() < 0.7 * _rot_err_deg(
            np.asarray(R0), R_gt).mean()

    def test_edge_filter_flags_outliers(self, rng):
        g, R_gt, _ = _make_graph(rng, rot_noise=0.005, out_frac=0.15)
        F = R_gt.shape[0]
        R0 = spanning_tree_rotations(g.edge_i, g.edge_j, g.R_ij,
                                     g.weight, g.mask, F)
        R = rotation_averaging(g, F, jnp.asarray(R0))
        gf = filter_edges_by_rotation(g, R)
        # Recompute true outlier set: edges whose measured relative
        # rotation is far from the ground-truth one.
        Rij_gt = np.einsum("eab,ecb->eac", R_gt[np.asarray(g.edge_j)],
                           R_gt[np.asarray(g.edge_i)])
        err = np.array([np.degrees(np.arccos(np.clip(
            (np.trace(a @ b.T) - 1) / 2, -1, 1)))
            for a, b in zip(np.asarray(g.R_ij), Rij_gt)])
        is_out = err > 10.0
        kept = np.asarray(gf.mask)
        assert not kept[is_out].any()          # every outlier dropped
        assert kept[~is_out].mean() > 0.9      # nearly all inliers kept


class TestTranslationAveraging:
    def test_exact_recovery(self, rng):
        g, R_gt, C_gt = _make_graph(rng)
        C = np.array(translation_averaging(
            g, jnp.asarray(R_gt), C_gt.shape[0]))
        ate = float(ate_rmse(jnp.asarray(C), jnp.asarray(C_gt)))
        assert ate < 1e-3  # scene scale ~3

    def test_noise_outliers_with_filter(self, rng):
        g, R_gt, C_gt = _make_graph(rng, rot_noise=0.01, dir_noise=0.01,
                                    out_frac=0.1)
        F = C_gt.shape[0]
        R0 = spanning_tree_rotations(g.edge_i, g.edge_j, g.R_ij,
                                     g.weight, g.mask, F)
        R = rotation_averaging(g, F, jnp.asarray(R0))
        gf = filter_edges_by_rotation(g, R)
        C = np.array(translation_averaging(gf, R, F))
        ate = float(ate_rmse(jnp.asarray(C), jnp.asarray(C_gt)))
        assert ate < 0.3

    def test_collapse_guard(self, rng):
        """The known LUD failure mode: edge lengths vary 5x across the
        graph; the solution must NOT sit in the all-lengths-equal valley."""
        g, R_gt, C_gt = _make_graph(rng)
        C = np.array(translation_averaging(
            g, jnp.asarray(R_gt), C_gt.shape[0]))
        ei, ej = np.asarray(g.edge_i), np.asarray(g.edge_j)
        est_len = np.linalg.norm(C[ei] - C[ej], axis=-1)
        gt_len = np.linalg.norm(C_gt[ei] - C_gt[ej], axis=-1)
        ratio = est_len / est_len.mean()
        gt_ratio = gt_len / gt_len.mean()
        assert np.corrcoef(ratio, gt_ratio)[0, 1] > 0.99


class TestTracks:
    def test_union_find_tracks(self):
        # frames of 4 kps; matches chain (0,k0)-(1,k1)-(2,k2).
        pm = {(0, 1): np.array([[0, 1], [2, 3]]),
              (1, 2): np.array([[1, 2]])}
        f, k, t, n = build_tracks(pm, [4, 4, 4])
        assert n == 2
        # longest track first: frames {0,1,2}
        tr0 = {(ff, kk) for ff, kk, tt in zip(f, k, t) if tt == 0}
        assert tr0 == {(0, 0), (1, 1), (2, 2)}
        tr1 = {(ff, kk) for ff, kk, tt in zip(f, k, t) if tt == 1}
        assert tr1 == {(0, 2), (1, 3)}

    def test_one_obs_per_frame(self):
        # conflicting merge: two kps of frame 1 in one track.
        pm = {(0, 1): np.array([[0, 1], [0, 2]])}
        f, k, t, n = build_tracks(pm, [4, 4])
        per = {}
        for ff, tt in zip(f, t):
            per.setdefault(tt, []).append(ff)
        for frames in per.values():
            assert len(frames) == len(set(frames))


class TestGlobalReconstruct:
    def test_sequence_ate(self, rng):
        cfg = PipelineConfig(
            ba=BAConfig(max_iters=15, pcg_iters=30),
            map=MapConfig(max_frames=16, max_points=2048, max_obs=16384))
        scene = SyntheticScene(rng, n_points=300, n_frames=10)
        # shuffle=True: per-frame keypoint order is randomized so the
        # match-index plumbing (xy_j[idx[q]]) is actually exercised.
        feats = synthetic_features(rng, scene, noise_px=0.3, shuffle=True)
        cam = Pinhole.from_K(scene.K)
        rec = global_reconstruct(feats, cam, cfg, window=6)
        assert rec.n_frames == 10
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.05  # scene diameter ~8
        st = rec.frame_stats[-1]
        assert st["ba_cost"] < st["ba_cost0"]
        # exports work on the global result (same Reconstruction contract)
        assert rec.n_points > 100 and rec.n_obs > 500
