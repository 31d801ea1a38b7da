"""Pose-graph tests: drifted odometry + loop closure must snap back to
ground truth (config-4 machinery, SURVEY.md §5.2)."""

import numpy as np
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.posegraph.pgo import PoseGraph, pgo_solve, edge_residuals
from fastmatch_tpu.utils.evaluation import ate_rmse


def circle_trajectory(n, radius=5.0):
    """Ground-truth poses around a circle (world->cam)."""
    Rs, ts = [], []
    for k in range(n):
        ang = 2 * np.pi * k / n
        # Camera yaw follows the tangent.
        c, s = np.cos(ang), np.sin(ang)
        R_wc = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])  # cam axes in world
        eye = np.array([radius * s, 0.0, -radius * c])
        R_cw = R_wc.T
        t_cw = -R_cw @ eye
        Rs.append(R_cw)
        ts.append(t_cw)
    return np.stack(Rs).astype(np.float32), np.stack(ts).astype(np.float32)


def rel(Ra, ta, Rb, tb):
    """Measurement Z_ab = T_a T_b^-1."""
    Ta = SE3(jnp.asarray(Ra), jnp.asarray(ta))
    Tb = SE3(jnp.asarray(Rb), jnp.asarray(tb))
    return Ta.compose(Tb.inverse())


def build_graph(rng, n=40, drift=0.02, loop=True, bad_loop=False):
    Rg, tg = circle_trajectory(n)
    # Odometry-integrated initial guess with accumulated drift.
    R0 = [Rg[0]]
    t0 = [tg[0]]
    ei, ej, ZR, Zt, w = [], [], [], [], []
    for k in range(1, n):
        Z = rel(Rg[k], tg[k], Rg[k - 1], tg[k - 1])  # k relative to k-1
        noise = SE3.exp(jnp.asarray(np.concatenate([
            drift * rng.standard_normal(3), drift * 0.5 * rng.standard_normal(3)
        ]).astype(np.float32)))
        Zn = noise.compose(Z)
        # Integrate noisy odometry: T_k = Zn T_{k-1}.
        Tk = Zn.compose(SE3(jnp.asarray(R0[-1]), jnp.asarray(t0[-1])))
        R0.append(np.array(Tk.R))
        t0.append(np.array(Tk.t))
        ei.append(k)
        ej.append(k - 1)
        ZR.append(np.array(Zn.R))
        Zt.append(np.array(Zn.t))
        w.append(1.0)
    if loop:
        # Loop closure: exact measurement between last and first frames.
        Z = rel(Rg[n - 1], tg[n - 1], Rg[0], tg[0])
        ei.append(n - 1)
        ej.append(0)
        ZR.append(np.array(Z.R))
        Zt.append(np.array(Z.t))
        w.append(1.0)
    if bad_loop:
        # A wrong loop closure (random transform) to test robustness.
        Zbad = SE3.exp(jnp.asarray(rng.standard_normal(6).astype(np.float32)))
        ei.append(n // 2)
        ej.append(0)
        ZR.append(np.array(Zbad.R))
        Zt.append(np.array(Zbad.t))
        w.append(1.0)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    g = PoseGraph(
        poses=SE3(jnp.asarray(np.stack(R0)), jnp.asarray(np.stack(t0))),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        Z=SE3(jnp.asarray(np.stack(ZR)), jnp.asarray(np.stack(Zt))),
        edge_weight=jnp.asarray(np.array(w, np.float32)),
        pose_mask=jnp.ones(n, bool),
        fixed=jnp.asarray(fixed),
    )
    return g, Rg, tg


def centers(R, t):
    return -np.einsum("fji,fj->fi", np.asarray(R), np.asarray(t))


class TestPGO:
    def test_residual_zero_at_gt(self, rng):
        g, Rg, tg = build_graph(rng, n=10, drift=0.0)
        r = edge_residuals(SE3(jnp.asarray(Rg[:10]), jnp.asarray(tg[:10])), g)
        assert float(jnp.abs(r).max()) < 1e-4

    def test_loop_closure_fixes_drift(self, rng):
        g, Rg, tg = build_graph(rng, n=40, drift=0.02, loop=True)
        drift_ate = float(ate_rmse(jnp.asarray(centers(g.poses.R, g.poses.t)),
                                   jnp.asarray(centers(Rg, tg))))
        res = pgo_solve(g, max_iters=40)
        opt_ate = float(ate_rmse(jnp.asarray(centers(res.poses.R, res.poses.t)),
                                 jnp.asarray(centers(Rg, tg))))
        assert float(res.cost) < float(res.cost0)
        assert opt_ate < drift_ate * 0.5, f"{opt_ate} !< {drift_ate}/2"

    def test_fixed_pose_unmoved(self, rng):
        g, *_ = build_graph(rng, n=20, drift=0.02)
        res = pgo_solve(g, max_iters=15)
        np.testing.assert_allclose(np.asarray(res.poses.R[0]),
                                   np.asarray(g.poses.R[0]), atol=1e-7)

    def test_pcg_matches_dense(self, rng):
        """Matrix-free PCG and dense Cholesky solve the SAME normal
        equations — final costs and trajectories must agree."""
        g, Rg, tg = build_graph(rng, n=60, drift=0.02, loop=True)
        rd = pgo_solve(g, max_iters=40)
        rp = pgo_solve(g, max_iters=40, solver="pcg", pcg_iters=100)
        gt = jnp.asarray(centers(Rg, tg))
        ate_d = float(ate_rmse(jnp.asarray(centers(rd.poses.R, rd.poses.t)), gt))
        ate_p = float(ate_rmse(jnp.asarray(centers(rp.poses.R, rp.poses.t)), gt))
        assert float(rp.cost) < float(rp.cost0)
        # Same optimum to LM-path tolerance (iterate orders may differ).
        assert abs(float(rp.cost) - float(rd.cost)) <= 0.05 * max(
            float(rd.cost), 1e-8) + 1e-6
        assert ate_p < max(1.5 * ate_d, 0.02), f"pcg {ate_p} vs dense {ate_d}"

    def test_pcg_fixed_pose_unmoved(self, rng):
        g, *_ = build_graph(rng, n=20, drift=0.02)
        res = pgo_solve(g, max_iters=15, solver="pcg")
        np.testing.assert_allclose(np.asarray(res.poses.R[0]),
                                   np.asarray(g.poses.R[0]), atol=1e-7)

    def test_huber_rejects_bad_loop(self, rng):
        g, Rg, tg = build_graph(rng, n=40, drift=0.015, loop=True, bad_loop=True)
        res_plain = pgo_solve(g, max_iters=40)
        res_rob = pgo_solve(g, max_iters=40, huber_delta_static=0.1, kernel="geman")
        gt = jnp.asarray(centers(Rg, tg))
        ate_plain = float(ate_rmse(jnp.asarray(centers(res_plain.poses.R, res_plain.poses.t)), gt))
        ate_rob = float(ate_rmse(jnp.asarray(centers(res_rob.poses.R, res_rob.poses.t)), gt))
        assert ate_rob < ate_plain, f"huber {ate_rob} !< plain {ate_plain}"
        assert ate_rob < 0.1


def abs_rmse(R, t, Rg, tg):
    """RMSE of camera centers WITHOUT alignment — priors must land the
    solution in the measurement (GPS) frame, so no sim(3) forgiveness."""
    d = centers(R, t) - centers(Rg, tg)
    return float(np.sqrt(np.mean(np.sum(d * d, -1))))


class TestPriors:
    """Unary prior factors (GPS / anchor fusion)."""

    def test_gps_anchors_absolute_frame(self, rng):
        from fastmatch_tpu.posegraph.pgo import with_position_priors

        n = 40
        g, Rg, tg = build_graph(rng, n=n, drift=0.02, loop=False)
        # No fixed pose, no loop closure: the GPS priors alone must fix
        # the gauge AND correct the drift, in absolute coordinates.
        g = g._replace(fixed=jnp.zeros(n, bool))
        idx = np.arange(0, n, 4)
        gps = centers(Rg, tg)[idx] + 0.005 * rng.standard_normal(
            (len(idx), 3)).astype(np.float32)
        g2 = with_position_priors(g, idx, gps, 10.0 * np.ones(len(idx)))
        err0 = abs_rmse(g.poses.R, g.poses.t, Rg, tg)
        res = pgo_solve(g2, max_iters=40)
        err = abs_rmse(res.poses.R, res.poses.t, Rg, tg)
        assert float(res.cost) < float(res.cost0)
        assert err < 0.05, f"absolute err {err} (drifted {err0})"
        assert err < err0 * 0.3

    def test_gps_outlier_redescending_kernel(self, rng):
        from fastmatch_tpu.posegraph.pgo import with_position_priors

        n = 40
        g, Rg, tg = build_graph(rng, n=n, drift=0.015, loop=False)
        g = g._replace(fixed=jnp.zeros(n, bool))
        idx = np.arange(0, n, 4)
        gps = centers(Rg, tg)[idx].astype(np.float32)
        gps[3] += np.array([5.0, -3.0, 4.0], np.float32)  # gross outlier
        g2 = with_position_priors(g, idx, gps, 10.0 * np.ones(len(idx)))
        res_q = pgo_solve(g2, max_iters=40)                     # quadratic
        res_r = pgo_solve(g2, max_iters=40, prior_delta=0.25,
                          kernel="geman")                       # redescending
        err_q = abs_rmse(res_q.poses.R, res_q.poses.t, Rg, tg)
        err_r = abs_rmse(res_r.poses.R, res_r.poses.t, Rg, tg)
        assert err_r < err_q, f"robust {err_r} !< quadratic {err_q}"
        assert err_r < 0.08, err_r

    def test_pose_prior_anchors(self, rng):
        from fastmatch_tpu.core.lie import SE3 as _SE3
        from fastmatch_tpu.posegraph.pgo import with_pose_priors

        n = 20
        g, Rg, tg = build_graph(rng, n=n, drift=0.02, loop=False)
        g = g._replace(fixed=jnp.zeros(n, bool))
        idx = np.array([0, n // 2])
        T = _SE3(jnp.asarray(Rg[idx]), jnp.asarray(tg[idx]))
        g2 = with_pose_priors(g, idx, T, 50.0 * np.ones(2))
        err0 = abs_rmse(g.poses.R, g.poses.t, Rg, tg)
        res = pgo_solve(g2, max_iters=40)
        err = abs_rmse(res.poses.R, res.poses.t, Rg, tg)
        # Two anchors pin the frame; odometry drift BETWEEN anchors
        # remains (no loop closures here), so assert improvement, not
        # near-exact recovery.
        assert err < err0 * 0.7, (err, err0)
        # The anchored poses sit (nearly) on their anchors.
        np.testing.assert_allclose(np.asarray(res.poses.R[0]), Rg[0],
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.poses.t[0]), tg[0],
                                   atol=2e-2)

    def test_pcg_priors_match_dense(self, rng):
        from fastmatch_tpu.posegraph.pgo import with_position_priors

        n = 40
        g, Rg, tg = build_graph(rng, n=n, drift=0.02, loop=False)
        g = g._replace(fixed=jnp.zeros(n, bool))
        idx = np.arange(0, n, 5)
        gps = centers(Rg, tg)[idx].astype(np.float32)
        g2 = with_position_priors(g, idx, gps, 10.0 * np.ones(len(idx)))
        rd = pgo_solve(g2, max_iters=40)
        rp = pgo_solve(g2, max_iters=40, solver="pcg", pcg_iters=120)
        assert abs(float(rp.cost) - float(rd.cost)) <= 0.05 * max(
            float(rd.cost), 1e-8) + 1e-6
        err_d = abs_rmse(rd.poses.R, rd.poses.t, Rg, tg)
        err_p = abs_rmse(rp.poses.R, rp.poses.t, Rg, tg)
        assert err_p < max(1.5 * err_d, 0.02), (err_p, err_d)
