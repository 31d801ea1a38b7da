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
