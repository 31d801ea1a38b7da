"""Geometry tier (SURVEY.md §5.2): RANSAC/triangulation/PnP on synthetic
scenes with exact expected poses."""

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SO3
from fastmatch_tpu.geometry.epipolar import (
    eight_point_essential,
    essential_from_pose,
    sampson_error,
)
from fastmatch_tpu.geometry.ransac import ransac_essential
from fastmatch_tpu.geometry.triangulation import triangulate_dlt
from fastmatch_tpu.geometry.pnp import pnp_dlt, ransac_pnp, refine_pose_gn
from synth import SyntheticScene


def _norm_coords(scene, f):
    K = scene.K
    return (scene.pixels[f] - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])


def _relpose(scene, f1, f2):
    """Ground-truth (R, t_unit) of cam f2 relative to cam f1."""
    R = scene.R[f2] @ scene.R[f1].T
    t = scene.t[f2] - R @ scene.t[f1]
    return R, t / np.linalg.norm(t)


class TestEightPoint:
    def test_recovers_essential(self, rng):
        scene = SyntheticScene(rng, n_points=100, n_frames=2)
        x1, x2 = _norm_coords(scene, 0), _norm_coords(scene, 1)
        vis = scene.visible[0] & scene.visible[1]
        E = eight_point_essential(jnp.asarray(x1[vis][:40]), jnp.asarray(x2[vis][:40]))
        err = sampson_error(E, jnp.asarray(x1[vis]), jnp.asarray(x2[vis]))
        assert float(jnp.max(err)) < 1e-8

    def test_matches_gt_up_to_scale(self, rng):
        scene = SyntheticScene(rng, n_points=60, n_frames=2)
        R, t = _relpose(scene, 0, 1)
        E_gt = np.array(essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
        x1, x2 = _norm_coords(scene, 0), _norm_coords(scene, 1)
        vis = scene.visible[0] & scene.visible[1]
        E = np.array(
            eight_point_essential(jnp.asarray(x1[vis]), jnp.asarray(x2[vis]))
        )
        E_gt /= np.linalg.norm(E_gt)
        E /= np.linalg.norm(E)
        err = min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
        assert err < 1e-5


class TestRansacEssential:
    def test_pose_with_outliers(self, rng):
        scene = SyntheticScene(rng, n_points=200, n_frames=2, noise_px=0.3)
        x1, x2 = _norm_coords(scene, 0), _norm_coords(scene, 1)
        vis = scene.visible[0] & scene.visible[1]
        # Corrupt 30% with gross outliers.
        n = x1.shape[0]
        bad = rng.random(n) < 0.3
        x2c = x2.copy()
        x2c[bad] += rng.uniform(0.2, 0.6, size=(bad.sum(), 2))
        res = ransac_essential(
            jax.random.PRNGKey(0),
            jnp.asarray(x1),
            jnp.asarray(x2c),
            jnp.asarray(vis),
            thr=(2.0 / 500.0) ** 2,
        )
        assert bool(res.ok)
        R_gt, t_gt = _relpose(scene, 0, 1)
        # Rotation error in degrees.
        dR = np.asarray(res.R) @ R_gt.T
        ang = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR)))).max())
        assert ang < 1.5, f"rotation error {ang:.2f} deg"
        t_err = np.linalg.norm(np.asarray(res.t) - t_gt)
        assert min(t_err, np.linalg.norm(np.asarray(res.t) + t_gt)) < 0.05
        # Outliers must largely be rejected.
        inl = np.asarray(res.inliers)
        assert (inl & bad & vis).sum() <= 0.05 * max(inl.sum(), 1)


class TestTriangulation:
    def test_exact_recovery(self, rng):
        scene = SyntheticScene(rng, n_points=120, n_frames=4)
        x = np.stack([_norm_coords(scene, f) for f in range(4)])
        pts, ok = triangulate_dlt(
            jnp.asarray(scene.R), jnp.asarray(scene.t), jnp.asarray(x),
            jnp.asarray(scene.visible),
        )
        okn = np.asarray(ok)
        assert okn.sum() > 100
        err = np.linalg.norm(np.asarray(pts)[okn] - scene.points[okn], axis=1)
        assert err.max() < 1e-3


class TestPnP:
    def test_dlt_exact(self, rng):
        scene = SyntheticScene(rng, n_points=80, n_frames=1)
        x = _norm_coords(scene, 0)
        vis = scene.visible[0]
        pose = pnp_dlt(jnp.asarray(scene.points[vis]), jnp.asarray(x[vis]))
        np.testing.assert_allclose(np.asarray(pose.R), scene.R[0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(pose.t), scene.t[0], atol=1e-3)

    def test_ransac_pnp_outliers(self, rng):
        scene = SyntheticScene(rng, n_points=150, n_frames=1, noise_px=0.3)
        x = _norm_coords(scene, 0).copy()
        vis = scene.visible[0]
        bad = rng.random(150) < 0.3
        x[bad] += rng.uniform(0.1, 0.5, size=(bad.sum(), 2))
        res = ransac_pnp(
            jax.random.PRNGKey(1),
            jnp.asarray(scene.points),
            jnp.asarray(x),
            jnp.asarray(vis),
            thr=(2.0 / 500.0) ** 2,
        )
        assert bool(res.ok)
        dR = np.asarray(res.pose.R) @ scene.R[0].T
        ang = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR)))).max())
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(res.pose.t) - scene.t[0]) < 0.05

    def test_gn_refinement_improves(self, rng):
        scene = SyntheticScene(rng, n_points=60, n_frames=1, noise_px=0.5)
        x = _norm_coords(scene, 0)
        vis = scene.visible[0]
        w = vis.astype(np.float32)
        pose0 = pnp_dlt(jnp.asarray(scene.points), jnp.asarray(x), jnp.asarray(w))
        pose1 = refine_pose_gn(
            pose0, jnp.asarray(scene.points), jnp.asarray(x), jnp.asarray(w)
        )

        def reproj(pose):
            p = np.asarray(pose.R) @ scene.points.T + np.asarray(pose.t)[:, None]
            uv = (p[:2] / p[2]).T
            return (np.linalg.norm(uv - x, axis=1) * w).sum()

        assert reproj(pose1) <= reproj(pose0) + 1e-9


class TestDegenerateInputs:
    """Fewer candidates than the minimal sample: ok=False, no crash."""

    def test_essential_too_few(self, rng):
        import jax

        res = ransac_essential(
            jax.random.PRNGKey(0),
            jnp.zeros((5, 2)), jnp.zeros((5, 2)), jnp.ones(5, bool),
        )
        assert not bool(res.ok)
        assert int(res.n_inliers) == 0

    def test_pnp_too_few(self, rng):
        import jax
        from fastmatch_tpu.geometry.pnp import ransac_pnp

        res = ransac_pnp(
            jax.random.PRNGKey(0),
            jnp.zeros((5, 3)), jnp.zeros((5, 2)), jnp.ones(5, bool),
        )
        assert not bool(res.ok)

    def test_pnp_empty(self, rng):
        import jax
        from fastmatch_tpu.geometry.pnp import ransac_pnp

        res = ransac_pnp(
            jax.random.PRNGKey(0),
            jnp.zeros((0, 3)), jnp.zeros((0, 2)), jnp.ones(0, bool),
        )
        assert not bool(res.ok)


class TestHomography:
    """Planar model: DLT, RANSAC, decomposition, H-vs-E selection."""

    @staticmethod
    def _planar_pair(rng, n_pts=200, noise=0.0, rot_scale=0.08):
        n = np.array([0.15, -0.1, 1.0])
        n /= np.linalg.norm(n)
        d = 3.0
        xy = rng.uniform(-1.5, 1.5, (n_pts, 2))
        z = (d - xy @ n[:2]) / n[2]
        X = np.column_stack([xy, z])
        R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * rot_scale,
                                           jnp.float32)))
        t = np.array([0.4, -0.1, 0.15], np.float32)
        X2 = X @ R.T + t
        x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
        x2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
        if noise:
            x1 = x1 + rng.standard_normal(x1.shape).astype(np.float32) * noise
            x2 = x2 + rng.standard_normal(x2.shape).astype(np.float32) * noise
        return x1, x2, R, t, n, d

    def test_dlt_exact(self, rng):
        from fastmatch_tpu.geometry.homography import (
            dlt_homography, homography_from_pose, symmetric_transfer_error)
        x1, x2, R, t, n, d = self._planar_pair(rng)
        H = dlt_homography(jnp.asarray(x1), jnp.asarray(x2))
        err = symmetric_transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
        assert float(jnp.max(err)) < 1e-9
        H_gt = np.array(homography_from_pose(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(n, jnp.float32), d))
        H_gt /= np.linalg.norm(H_gt)
        Hn = np.asarray(H)
        assert min(np.abs(Hn - H_gt).max(), np.abs(Hn + H_gt).max()) < 1e-5

    def test_minimal_four_point(self, rng):
        from fastmatch_tpu.geometry.homography import (
            dlt_homography, symmetric_transfer_error)
        x1, x2, *_ = self._planar_pair(rng, n_pts=4)
        H = dlt_homography(jnp.asarray(x1), jnp.asarray(x2))
        err = symmetric_transfer_error(H, jnp.asarray(x1), jnp.asarray(x2))
        assert float(jnp.max(err)) < 1e-8

    def test_decompose_recovers_pose(self, rng):
        from fastmatch_tpu.geometry.homography import (
            cheirality_vote, decompose_homography, dlt_homography,
            fix_homography_sign)
        x1, x2, R, t, n, d = self._planar_pair(rng)
        H = dlt_homography(jnp.asarray(x1), jnp.asarray(x2))
        inl = jnp.ones(x1.shape[0], bool)
        Hf = fix_homography_sign(H, jnp.asarray(x1), jnp.asarray(x2), inl)
        Rs, ts, ns = decompose_homography(Hf)
        bi, votes = cheirality_vote(Rs, ts, ns, jnp.asarray(x1),
                                    jnp.asarray(x2), inl)
        assert int(votes[bi]) >= 0.95 * x1.shape[0]
        # Two views of a plane admit TWO consistent interpretations (the
        # classic two-fold ambiguity) — the ground truth must be among the
        # full-vote candidates, with exact (R, t/d, n) recovery.
        vn = np.asarray(votes)
        top = np.where(vn >= 0.95 * x1.shape[0])[0]
        errs = [
            (np.abs(np.asarray(Rs[i]) - R).max(),
             np.abs(np.asarray(ts[i]) - t / d).max(),
             min(np.abs(np.asarray(ns[i]) - n).max(),
                 np.abs(np.asarray(ns[i]) + n).max()))
            for i in top
        ]
        best = min(errs, key=lambda e: e[0])
        assert best[0] < 1e-4 and best[1] < 1e-4 and best[2] < 1e-4

    def test_decompose_pure_rotation(self, rng):
        from fastmatch_tpu.geometry.homography import decompose_homography
        R = np.asarray(SO3.exp(jnp.asarray([0.05, -0.1, 0.2], jnp.float32)))
        Rs, ts, _ = decompose_homography(jnp.asarray(R))
        assert np.abs(np.asarray(Rs[0]) - R).max() < 1e-5
        assert np.abs(np.asarray(ts)).max() < 1e-8

    def test_ransac_with_outliers(self, rng):
        from fastmatch_tpu.geometry.homography import ransac_homography
        x1, x2, *_ = self._planar_pair(rng, noise=3e-4)
        n_pts = x1.shape[0]
        bad = rng.random(n_pts) < 0.3
        x2c = x2.copy()
        x2c[bad] += rng.uniform(0.2, 0.6, (bad.sum(), 2)).astype(np.float32)
        res = ransac_homography(
            jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2c),
            jnp.ones(n_pts, bool), thr=2 * (2.0 / 500.0) ** 2)
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert (inl & bad).sum() <= 0.05 * max(inl.sum(), 1)
        assert inl.sum() >= 0.9 * (~bad).sum()

    def test_model_selection_planar_vs_general(self, rng):
        from fastmatch_tpu.geometry.homography import select_two_view_model
        # Planar scene: homography must win and give the correct pose.
        x1, x2, R, t, n, d = self._planar_pair(rng, noise=3e-4)
        m = select_two_view_model(
            jax.random.PRNGKey(1), jnp.asarray(x1), jnp.asarray(x2),
            jnp.ones(x1.shape[0], bool), thr=(2.0 / 500.0) ** 2)
        assert bool(m.ok) and bool(m.used_homography)

        def rot_err_deg(Rc):
            dR = np.asarray(Rc) @ R.T
            return np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR)))).max())

        # Under the planar two-fold ambiguity the GT pose may be either
        # candidate; the model must flag it and expose the alternate.
        if bool(m.ambiguous):
            assert min(rot_err_deg(m.R), rot_err_deg(m.R_alt)) < 1.0
        else:
            assert rot_err_deg(m.R) < 1.0
        # General (non-planar) scene: essential must win.
        scene = SyntheticScene(rng, n_points=200, n_frames=2, noise_px=0.2)
        y1, y2 = _norm_coords(scene, 0), _norm_coords(scene, 1)
        vis = scene.visible[0] & scene.visible[1]
        m2 = select_two_view_model(
            jax.random.PRNGKey(2), jnp.asarray(y1.astype(np.float32)),
            jnp.asarray(y2.astype(np.float32)), jnp.asarray(vis),
            thr=(2.0 / 500.0) ** 2)
        assert bool(m2.ok) and not bool(m2.used_homography)
        R_gt, _ = _relpose(scene, 0, 1)
        dR2 = np.asarray(m2.R) @ R_gt.T
        ang2 = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR2)))).max())
        assert ang2 < 1.5


class TestFundamental:
    """Uncalibrated path: 8-point, 7-point cubic solver, RANSAC."""

    @staticmethod
    def _pixel_pair(rng, n_pts=300, noise=0.0):
        from fastmatch_tpu.geometry.fundamental import fundamental_from_essential
        from fastmatch_tpu.geometry.epipolar import essential_from_pose
        X = np.column_stack([rng.uniform(-1.5, 1.5, (n_pts, 2)),
                             rng.uniform(2.0, 6.0, n_pts)])
        R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * 0.08,
                                           jnp.float32)))
        t = np.array([0.4, -0.1, 0.15], np.float32)
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
        X2 = X @ R.T + t
        px1 = (X[:, :2] / X[:, 2:3] * 500 + [320, 240]).astype(np.float32)
        px2 = (X2[:, :2] / X2[:, 2:3] * 500 + [320, 240]).astype(np.float32)
        if noise:
            px1 = px1 + rng.standard_normal(px1.shape).astype(np.float32) * noise
            px2 = px2 + rng.standard_normal(px2.shape).astype(np.float32) * noise
        E = essential_from_pose(jnp.asarray(R), jnp.asarray(t))
        F_gt = np.array(fundamental_from_essential(E, jnp.asarray(K),
                                                   jnp.asarray(K)))
        return px1, px2, F_gt / np.linalg.norm(F_gt)

    def test_cubic_roots(self):
        from fastmatch_tpu.geometry.fundamental import _cubic_roots
        r, v = _cubic_roots(jnp.float32(1.0), jnp.float32(-6.0),
                            jnp.float32(11.0), jnp.float32(-6.0))
        got = sorted(np.asarray(r)[np.asarray(v)].tolist())
        assert np.allclose(got, [1.0, 2.0, 3.0], atol=1e-4)
        # single real root: x^3 + x = 0 has roots {0} real among 3
        r, v = _cubic_roots(jnp.float32(1.0), jnp.float32(0.0),
                            jnp.float32(1.0), jnp.float32(0.0))
        real = np.asarray(r)[np.asarray(v)]
        assert real.shape[0] == 1 and abs(real[0]) < 1e-6
        # quadratic degenerate: x^2 - 1
        r, v = _cubic_roots(jnp.float32(0.0), jnp.float32(1.0),
                            jnp.float32(0.0), jnp.float32(-1.0))
        got = sorted(np.asarray(r)[np.asarray(v)].tolist())
        assert np.allclose(got, [-1.0, 1.0], atol=1e-6)

    def test_eight_point_recovers_f(self, rng):
        from fastmatch_tpu.geometry.fundamental import eight_point_fundamental
        px1, px2, F_gt = self._pixel_pair(rng)
        F = np.array(eight_point_fundamental(jnp.asarray(px1),
                                             jnp.asarray(px2)))
        assert min(np.abs(F - F_gt).max(), np.abs(F + F_gt).max()) < 1e-3

    def test_seven_point_minimal(self, rng):
        from fastmatch_tpu.geometry.fundamental import seven_point_fundamental
        px1, px2, _ = self._pixel_pair(rng)
        Fs, valid = seven_point_fundamental(jnp.asarray(px1[:7]),
                                            jnp.asarray(px2[:7]))
        errs = np.asarray(sampson_error(Fs, jnp.asarray(px1)[None],
                                        jnp.asarray(px2)[None]))
        best = np.where(np.asarray(valid), errs.max(axis=1), np.inf).min()
        # One cubic root must reproduce the true epipolar geometry on ALL
        # 300 points given an exact minimal sample.
        assert best < 0.1  # px^2

    def test_ransac_with_outliers(self, rng):
        from fastmatch_tpu.geometry.fundamental import ransac_fundamental
        px1, px2, F_gt = self._pixel_pair(rng, noise=0.3)
        n = px1.shape[0]
        bad = rng.random(n) < 0.3
        px2c = px2.copy()
        px2c[bad] += rng.uniform(30, 200, (bad.sum(), 2)).astype(np.float32)
        res = ransac_fundamental(jax.random.PRNGKey(0), jnp.asarray(px1),
                                 jnp.asarray(px2c), jnp.ones(n, bool), thr=4.0)
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert (inl & bad).sum() <= 0.05 * max(inl.sum(), 1)
        assert inl.sum() >= 0.85 * (~bad).sum()

    def test_third_view_disambiguation(self, rng):
        """The pipeline resolves the planar two-fold ambiguity with frame 2:
        the wrong interpretation's map must lose the PnP vote."""
        from fastmatch_tpu.core.camera import Pinhole
        from fastmatch_tpu.geometry.homography import select_two_view_model
        from fastmatch_tpu.pipeline.reconstruct import (
            _disambiguate_planar_bootstrap)
        from synth import random_descriptors

        n = np.array([0.15, -0.1, 1.0]); n /= np.linalg.norm(n); d = 3.0
        P = 150
        xy = rng.uniform(-1.5, 1.5, (P, 2))
        z = (d - xy @ n[:2]) / n[2]
        X = np.column_stack([xy, z])
        Rg = [np.eye(3)]
        tg = [np.zeros(3)]
        for k in (1, 2):
            Rg.append(np.asarray(SO3.exp(jnp.asarray(
                rng.standard_normal(3) * 0.05, jnp.float32))))
            tg.append(np.array([0.4, -0.1, 0.15]) * k)
        proj = []
        for k in range(3):
            Xc = X @ Rg[k].T + tg[k]
            proj.append((Xc[:, :2] / Xc[:, 2:3]).astype(np.float32))
        m = select_two_view_model(
            jax.random.PRNGKey(0), jnp.asarray(proj[0]), jnp.asarray(proj[1]),
            jnp.ones(P, bool))
        assert bool(m.used_homography)
        if not bool(m.ambiguous):
            return  # nothing to disambiguate on this draw
        cam = Pinhole(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        desc = random_descriptors(rng, P)
        feats = [None, None,
                 (proj[2] * 500 + [320, 240], desc, np.ones(P, bool))]

        class Cfg:
            class matching:
                ratio = 0.8; cross_check = True
                backend = "jnp"; precision = "exact"
        Rp, tp = _disambiguate_planar_bootstrap(
            m, proj[0], proj[1], desc, feats, cam, Cfg,
            (2.0 / 500.0) ** 2, jax.random.PRNGKey(1))
        ang = np.degrees(np.abs(np.asarray(SO3.log(
            jnp.asarray(Rp @ Rg[1].T)))).max())
        assert ang < 1.0, f"picked the wrong interpretation ({ang:.1f} deg)"


class TestFivePoint:
    """Minimal 5-point essential solver (geometry/five_point.py)."""

    @staticmethod
    def _minimal_problem(rng):
        X = np.column_stack([rng.uniform(-1.5, 1.5, (5, 2)),
                             rng.uniform(2.0, 6.0, 5)])
        R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * 0.2,
                                           jnp.float32)))
        t = rng.standard_normal(3).astype(np.float32)
        t /= np.linalg.norm(t)
        X2 = X @ R.T + t
        x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
        x2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
        E_gt = np.array(essential_from_pose(jnp.asarray(R), jnp.asarray(t)))
        return x1, x2, E_gt / np.linalg.norm(E_gt)

    def test_gt_among_candidates(self, rng):
        """10/10 GT recovery through the PRODUCT path (jitted — the module
        contract says always call through jit; eager and jit resolve the
        f32 RREF's discrete branches differently on marginal problems, and
        the auxiliary polish starts were tuned against the jitted path)."""
        from fastmatch_tpu.geometry.five_point import five_point_essential
        solve = jax.jit(five_point_essential)
        hits = 0
        for _ in range(10):
            x1, x2, E_gt = self._minimal_problem(rng)
            Es, valid = solve(jnp.asarray(x1), jnp.asarray(x2))
            Es, valid = np.array(Es), np.array(valid)
            errs = [min(np.abs(Es[i] - E_gt).max(), np.abs(Es[i] + E_gt).max())
                    for i in range(Es.shape[0]) if valid[i]]
            if errs and min(errs) < 1e-3:
                hits += 1
        assert hits == 10, f"only {hits}/10 minimal problems recovered GT"

    def test_candidates_satisfy_correspondences(self, rng):
        from fastmatch_tpu.geometry.five_point import five_point_essential
        x1, x2, _ = self._minimal_problem(rng)
        Es, valid = five_point_essential(jnp.asarray(x1), jnp.asarray(x2))
        errs = np.asarray(sampson_error(Es, jnp.asarray(x1)[None],
                                        jnp.asarray(x2)[None]))
        v = np.array(valid)
        assert v.sum() >= 1
        # Every valid candidate is an exact solution of the minimal problem.
        assert errs[v].max() < 1e-6

    def test_ransac_5pt_heavy_outliers(self, rng):
        from fastmatch_tpu.geometry.ransac import ransac_essential
        P = 300
        X = np.column_stack([rng.uniform(-1.5, 1.5, (P, 2)),
                             rng.uniform(2.0, 6.0, P)])
        R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * 0.08,
                                           jnp.float32)))
        t = np.array([0.4, -0.1, 0.15], np.float32)
        X2 = X @ R.T + t
        x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
        x2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
        x1 += rng.standard_normal(x1.shape).astype(np.float32) * 5e-4
        x2 += rng.standard_normal(x2.shape).astype(np.float32) * 5e-4
        bad = rng.random(P) < 0.6
        x2[bad] = rng.uniform(-1, 1, (int(bad.sum()), 2)).astype(np.float32)
        res = ransac_essential(jax.random.PRNGKey(0), jnp.asarray(x1),
                               jnp.asarray(x2), jnp.ones(P, bool),
                               n_hyp=256, solver="5pt")
        assert bool(res.ok)
        dR = np.asarray(res.R) @ R.T
        ang = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR)))).max())
        assert ang < 1.5, f"rotation error {ang:.2f} deg"
        inl = np.asarray(res.inliers)
        assert (inl & bad).sum() <= 0.05 * max(inl.sum(), 1)


class TestPlanarPnP:
    """Coplanar 2D-3D: the 6-point DLT is rank-deficient on a plane; the
    plane-homography solver family must carry RANSAC there."""

    @staticmethod
    def _planar_pnp_problem(rng, n_pts=150):
        n = np.array([0.2, -0.1, 1.0])
        n /= np.linalg.norm(n)
        d = 4.0
        xy = rng.uniform(-2.0, 2.0, (n_pts, 2))
        z = (d - xy @ n[:2]) / n[2]
        X = np.column_stack([xy, z]).astype(np.float32)
        R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * 0.15,
                                           jnp.float32)))
        t = np.array([0.3, -0.2, 0.5], np.float32)
        Xc = X @ R.T + t
        x = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
        return X, x, R, t

    def test_pnp_planar_exact(self, rng):
        from fastmatch_tpu.geometry.pnp import pnp_planar
        X, x, R, t = self._planar_pnp_problem(rng)
        pose = pnp_planar(jnp.asarray(X), jnp.asarray(x))
        assert np.abs(np.asarray(pose.R) - R).max() < 1e-4
        assert np.abs(np.asarray(pose.t) - t).max() < 1e-3

    def test_ransac_pnp_planar_outliers(self, rng):
        X, x, R, t = self._planar_pnp_problem(rng)
        x = x + rng.standard_normal(x.shape).astype(np.float32) * 5e-4
        bad = rng.random(len(x)) < 0.3
        x[bad] += rng.uniform(0.1, 0.5, (int(bad.sum()), 2)).astype(np.float32)
        res = ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(x),
                         jnp.ones(len(x), bool), thr=(2.0 / 500.0) ** 2)
        assert bool(res.ok)
        dR = np.asarray(res.pose.R) @ R.T
        ang = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(dR)))).max())
        assert ang < 1.0, f"rotation error {ang:.2f} deg"
        assert np.linalg.norm(np.asarray(res.pose.t) - t) < 0.05
