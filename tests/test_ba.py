"""BA tests: synthetic scene with perturbed init must converge to ground
truth (SURVEY.md §5.2 Integration tier for config 3/4)."""

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.ba.lm import ba_solve
from fastmatch_tpu.ba.schur import assemble, pcg_solve, reduced_rhs, schur_matvec
from fastmatch_tpu.utils.evaluation import ate_rmse, align_umeyama
from synth import SyntheticScene


def build_problem(rng, n_frames=6, n_points=120, noise_px=0.0, perturb=0.05,
                  cap_obs=1024):
    scene = SyntheticScene(rng, n_points=n_points, n_frames=n_frames,
                           noise_px=noise_px)
    K = scene.K
    f = np.array([K[0, 0], K[1, 1]])
    c = K[:2, 2]
    cams, pts, uvs = [], [], []
    for fi in range(n_frames):
        for pi in range(n_points):
            if scene.visible[fi, pi]:
                cams.append(fi)
                pts.append(pi)
                uvs.append((scene.pixels[fi, pi] - c) / f)
    O = len(cams)
    assert O <= cap_obs
    cam_idx = np.zeros(cap_obs, np.int32)
    pt_idx = np.zeros(cap_obs, np.int32)
    uv = np.zeros((cap_obs, 2), np.float32)
    mask = np.zeros(cap_obs, bool)
    cam_idx[:O] = cams
    pt_idx[:O] = pts
    uv[:O] = uvs
    mask[:O] = True

    # Perturb everything except the two gauge cameras (left-multiply a small
    # random SE3 onto each pose).
    R0 = scene.R.copy()
    t0 = scene.t.copy()
    X0 = scene.points + perturb * rng.standard_normal(scene.points.shape)
    for fi in range(2, n_frames):
        tw = np.concatenate([perturb * 0.5 * rng.standard_normal(3),
                             perturb * rng.standard_normal(3)])
        g = SE3.exp(jnp.asarray(tw))
        R0[fi] = np.asarray(g.R) @ scene.R[fi]
        t0[fi] = np.asarray(g.R) @ scene.t[fi] + np.asarray(g.t)

    fixed = np.zeros(n_frames, bool)
    fixed[:2] = True  # fix two cameras: locks gauge incl. scale
    problem = BAProblem(
        poses=SE3(jnp.asarray(R0.astype(np.float32)), jnp.asarray(t0.astype(np.float32))),
        points=jnp.asarray(X0.astype(np.float32)),
        obs=Observations(
            jnp.asarray(cam_idx), jnp.asarray(pt_idx), jnp.asarray(uv), jnp.asarray(mask)
        ),
        cam_mask=jnp.ones(n_frames, bool),
        pt_mask=jnp.ones(n_points, bool),
        fixed_cams=jnp.asarray(fixed),
    )
    return scene, problem


def centers(R, t):
    return -np.einsum("fji,fj->fi", np.asarray(R), np.asarray(t))


class TestSchurPieces:
    def test_matvec_matches_dense(self, rng):
        # Small problem: build the dense reduced system explicitly and
        # compare S @ x against the matrix-free product.
        scene, problem = build_problem(rng, n_frames=3, n_points=20, cap_obs=64)
        n_c, n_p = 3, 20
        sys, _ = assemble(problem.poses, problem.points, problem.obs, n_c, n_p, None)
        lam = jnp.float32(1e-3)
        upd = jnp.ones(n_c)
        # Dense assembly from blocks.
        obs = problem.obs
        O = obs.capacity
        Hcp = np.zeros((n_c * 6, n_p * 3))
        for o in range(O):
            if not bool(obs.mask[o]):
                continue
            ci, pi = int(obs.cam_idx[o]), int(obs.pt_idx[o])
            Hcp[ci * 6:(ci + 1) * 6, pi * 3:(pi + 1) * 3] += np.asarray(sys.Wcp[o])
        from fastmatch_tpu.ba.schur import _damped
        Hcc = np.zeros((n_c * 6, n_c * 6))
        dH = np.asarray(_damped(sys.Hcc, lam))
        for ci in range(n_c):
            Hcc[ci * 6:(ci + 1) * 6, ci * 6:(ci + 1) * 6] = dH[ci]
        Hpp = np.zeros((n_p * 3, n_p * 3))
        dP = np.asarray(_damped(sys.Hpp, lam))
        for pi in range(n_p):
            Hpp[pi * 3:(pi + 1) * 3, pi * 3:(pi + 1) * 3] = dP[pi]
        S = Hcc - Hcp @ np.linalg.solve(Hpp, Hcp.T)
        x = rng.standard_normal((n_c, 6)).astype(np.float32)
        Sx = schur_matvec(sys, obs, lam, jnp.asarray(x), n_p, upd)
        expected = (S @ x.reshape(-1)).reshape(n_c, 6)
        np.testing.assert_allclose(np.asarray(Sx), expected, rtol=2e-3, atol=2e-4)

    def test_pcg_solves_system(self, rng):
        scene, problem = build_problem(rng, n_frames=4, n_points=40, cap_obs=256)
        n_c, n_p = 4, 40
        sys, _ = assemble(problem.poses, problem.points, problem.obs, n_c, n_p, None)
        lam = jnp.float32(1e-2)
        upd = (problem.cam_mask & ~problem.fixed_cams).astype(jnp.float32)
        x = pcg_solve(sys, problem.obs, lam, n_p, upd, iters=60)
        rhs = reduced_rhs(sys, problem.obs, lam, n_p, upd)
        Sx = schur_matvec(sys, problem.obs, lam, x, n_p, upd)
        resid = np.linalg.norm(np.asarray(Sx - rhs)) / max(np.linalg.norm(np.asarray(rhs)), 1e-12)
        assert resid < 1e-3, f"PCG relative residual {resid}"


class TestBASolve:
    def test_converges_to_ground_truth(self, rng):
        scene, problem = build_problem(rng, n_frames=6, n_points=120,
                                       perturb=0.05)
        res = ba_solve(problem, max_iters=25, pcg_iters=50)
        assert float(res.cost) < float(res.cost0) * 1e-3
        est_c = centers(res.poses.R, res.poses.t)
        gt_c = centers(scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c)))
        assert ate < 1e-3, f"ATE {ate}"

    def test_noisy_observations(self, rng):
        scene, problem = build_problem(rng, n_frames=6, n_points=120,
                                       noise_px=0.5, perturb=0.05)
        res = ba_solve(problem, max_iters=25, pcg_iters=50)
        assert float(res.cost) < float(res.cost0) * 0.1
        est_c = centers(res.poses.R, res.poses.t)
        gt_c = centers(scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c)))
        assert ate < 0.02, f"ATE {ate}"

    def test_fixed_cameras_stay_fixed(self, rng):
        scene, problem = build_problem(rng, n_frames=5, n_points=80, cap_obs=512)
        res = ba_solve(problem, max_iters=10)
        np.testing.assert_allclose(
            np.asarray(res.poses.R[:2]), np.asarray(problem.poses.R[:2]), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(res.poses.t[:2]), np.asarray(problem.poses.t[:2]), atol=1e-7
        )

    def test_huber_robust_to_outliers(self, rng):
        scene, problem = build_problem(rng, n_frames=6, n_points=120, perturb=0.03)
        # Corrupt 5% of observations grossly.
        uv = np.asarray(problem.obs.uv).copy()
        m = np.asarray(problem.obs.mask)
        idx = np.where(m)[0]
        bad = rng.choice(idx, size=max(len(idx) // 20, 1), replace=False)
        uv[bad] += 0.3
        problem = problem._replace(obs=problem.obs._replace(uv=jnp.asarray(uv)))
        res = ba_solve(problem, max_iters=25, huber_delta_static=2.0 / 500.0)
        est_c = centers(res.poses.R, res.poses.t)
        gt_c = centers(scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c)))
        assert ate < 0.02, f"ATE with outliers {ate}"


class TestAlignment:
    def test_umeyama_exact(self, rng):
        X = rng.standard_normal((50, 3))
        R_gt = np.asarray(SE3.exp(jnp.asarray(rng.standard_normal(6))).R)
        s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
        Y = s_gt * X @ R_gt.T + t_gt
        s, R, t = align_umeyama(jnp.asarray(X), jnp.asarray(Y))
        assert abs(float(s) - s_gt) < 1e-4
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)


class TestGroupedSchur:
    """Scatter-free block-dense path (T13) parity vs the segment-sum path."""

    def test_grouped_matvec_matches_scatter(self, rng):
        from fastmatch_tpu.ba.schur import (
            group_observations, grouped_system, schur_matvec_grouped,
            pcg_solve_grouped, reduced_rhs, damped_pp_inverse,
            back_substitute, back_substitute_grouped,
        )
        _, problem = build_problem(rng, n_frames=6, n_points=64, cap_obs=512)
        n_c, n_p = problem.n_cams, problem.n_points
        sys, _ = assemble(problem.poses, problem.points, problem.obs, n_c, n_p)
        lam = jnp.float32(1e-3)
        upd = (problem.cam_mask & ~problem.fixed_cams).astype(jnp.float32)
        grouped = group_observations(problem.obs, n_c, n_p)
        gs = grouped_system(sys, grouped, lam)

        x = jnp.asarray(rng.standard_normal((n_c, 6)).astype(np.float32))
        Sx_scatter = schur_matvec(sys, problem.obs, lam, x, n_p, upd)
        Sx_grouped = schur_matvec_grouped(gs, grouped, x, upd)
        np.testing.assert_allclose(
            np.asarray(Sx_scatter), np.asarray(Sx_grouped), rtol=2e-4, atol=1e-5
        )

        dx_scatter = pcg_solve(sys, problem.obs, lam, n_p, upd, iters=50)
        dx_grouped = pcg_solve_grouped(sys, gs, grouped, upd, iters=50)
        np.testing.assert_allclose(
            np.asarray(dx_scatter), np.asarray(dx_grouped), rtol=1e-2, atol=1e-4
        )
        bp_s = back_substitute(sys, problem.obs, lam, dx_scatter, n_p)
        bp_g = back_substitute_grouped(sys, gs, grouped, dx_grouped)
        np.testing.assert_allclose(
            np.asarray(bp_s), np.asarray(bp_g), rtol=1e-2, atol=1e-4
        )

    def test_grouped_ba_solve_converges_same(self, rng):
        _, problem = build_problem(rng, n_frames=6, n_points=64,
                                   noise_px=0.5, perturb=0.02, cap_obs=512)
        res_scatter = ba_solve(problem, grouped=None, max_iters=8, pcg_iters=30)
        res_grouped = ba_solve(problem, grouped="auto", max_iters=8, pcg_iters=30)
        # Same starting cost, both converge to the same optimum.
        assert np.isclose(float(res_scatter.cost0), float(res_grouped.cost0))
        assert float(res_grouped.cost) < 0.5 * float(res_grouped.cost0)
        np.testing.assert_allclose(
            float(res_scatter.cost), float(res_grouped.cost), rtol=1e-3
        )

    def test_group_observations_layout(self, rng):
        from fastmatch_tpu.ba.schur import group_observations
        from fastmatch_tpu.ba.problem import Observations

        ci = jnp.asarray(np.array([0, 1, 1, 2, 2, 2], np.int32))
        pi = jnp.asarray(np.array([3, 3, 0, 1, 0, 3], np.int32))
        obs = Observations(ci, pi, jnp.zeros((6, 2)), jnp.ones(6, bool))
        g = group_observations(obs, n_cams=4, n_points=4)
        pt = np.asarray(g.pt_gather)
        # point 3 is observed by obs {0, 1, 5}
        assert set(pt[3][pt[3] < 6].tolist()) == {0, 1, 5}
        # pad slots point at the pad row (index O = 6)
        assert (pt[2] == 6).all()
        cam = np.asarray(g.cam_gather)
        assert set(cam[2][cam[2] < 6].tolist()) == {3, 4, 5}


class TestCompactObs:
    def test_bucketed_ba_equals_full(self):
        """compact_obs (pipeline/tracker.py): BA over the bucket-compacted
        observation table must match BA over the padded full-capacity
        table to f32 tolerance — live rows interleaved with masked padding
        to exercise the stable compaction, not just prefix truncation."""
        from fastmatch_tpu.pipeline.tracker import compact_obs, obs_bucket

        rng = np.random.default_rng(7)
        scene, prob = build_problem(rng, n_frames=6, n_points=80,
                                    perturb=0.04, cap_obs=4096)
        # Shuffle rows so live observations scatter through the padding.
        perm = rng.permutation(4096)
        o = prob.obs
        prob = prob._replace(obs=Observations(
            o.cam_idx[perm], o.pt_idx[perm], o.uv[perm], o.mask[perm]))
        n_live = int(np.asarray(prob.obs.mask).sum())
        b = obs_bucket(n_live, 4096, floor=512)
        assert b < 4096
        small = compact_obs(prob, b)
        assert small.obs.mask.shape[0] == b
        assert int(np.asarray(small.obs.mask).sum()) == n_live
        full = ba_solve(prob, max_iters=8, pcg_iters=30)
        comp = ba_solve(small, max_iters=8, pcg_iters=30)
        np.testing.assert_allclose(np.asarray(comp.poses.t),
                                   np.asarray(full.poses.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(comp.points),
                                   np.asarray(full.points), atol=1e-4)

    def test_bucket_at_capacity_is_identity(self):
        from fastmatch_tpu.pipeline.tracker import compact_obs, obs_bucket

        rng = np.random.default_rng(8)
        _, prob = build_problem(rng, cap_obs=1024)
        assert obs_bucket(900, 1024) == 1024
        same = compact_obs(prob, 1024)
        np.testing.assert_array_equal(np.asarray(same.obs.mask),
                                      np.asarray(prob.obs.mask))
