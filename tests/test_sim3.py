"""Sim(3) Lie group (core/lie.py) + Sim3 pose-graph solver (posegraph/sim3.py).

The drift test builds the canonical monocular failure: a VO chain whose
local map scale drifts by a constant factor per frame, plus one accurate
Sim3 loop-closure measurement. SE(3) PGO cannot represent the scale
correction; Sim(3) PGO distributes it around the cycle and the corrected
SE3 trajectory lands back on ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmatch_tpu.core.lie import SE3, SO3, Sim3, _sim3_W
from fastmatch_tpu.posegraph import PoseGraph, pgo_solve
from fastmatch_tpu.posegraph.sim3 import (Sim3Graph, graph_from_se3,
                                          sim3_correct_map, sim3_pgo_solve)


class TestSim3Group:
    def test_W_matches_quadrature(self):
        rng = np.random.default_rng(0)
        cases = [(rng.normal(0, 1.2, 3), rng.normal(0, 0.7)) for _ in range(4)]
        cases += [(np.zeros(3), 0.4), (rng.normal(0, 1, 3), 0.0),
                  (np.zeros(3), 0.0), (np.full(3, 1e-6), 1e-6)]
        us = np.linspace(0.0, 1.0, 4001)
        for w, sig in cases:
            w = np.asarray(w, np.float32)
            sig = np.float32(sig)
            W = np.asarray(_sim3_W(jnp.asarray(w), jnp.asarray(sig)))
            quad = sum(np.exp(sig * u) * np.asarray(SO3.exp(jnp.asarray(u * w)))
                       for u in us) / len(us)
            assert np.abs(W - quad).max() < 5e-4, (w, sig)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        tau = rng.normal(0, 0.8, (64, 7)).astype(np.float32)
        # log returns the canonical |omega| <= pi representative; restrict
        # the sample there so tangent-space comparison is meaningful (group
        # elements with |omega| > pi wrap — exp(log(S)) == S still holds,
        # checked by the group-level equality below).
        wn = np.linalg.norm(tau[:, 3:6], axis=1, keepdims=True)
        tau[:, 3:6] *= np.where(wn > 3.0, 3.0 / wn, 1.0)
        S = Sim3.exp(jnp.asarray(tau))
        back = np.asarray(S.log())
        np.testing.assert_allclose(back, tau, atol=2e-5)
        S2 = Sim3.exp(jnp.asarray(back))
        np.testing.assert_allclose(np.asarray(S2.t), np.asarray(S.t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S2.R), np.asarray(S.R), atol=1e-5)

    def test_compose_inverse_apply(self):
        rng = np.random.default_rng(2)
        S1 = Sim3.exp(jnp.asarray(rng.normal(0, 0.5, (8, 7)).astype(np.float32)))
        S2 = Sim3.exp(jnp.asarray(rng.normal(0, 0.5, (8, 7)).astype(np.float32)))
        x = jnp.asarray(rng.normal(0, 1, (8, 3)).astype(np.float32))
        lhs = np.asarray(S1.compose(S2).apply(x))
        rhs = np.asarray(S1.apply(S2.apply(x)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)
        I = S1.compose(S1.inverse())
        assert np.abs(np.asarray(I.t)).max() < 1e-5
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)

    def test_jacfwd_nan_free_at_zero(self):
        J = jax.jacfwd(lambda xi: Sim3.exp(xi).log())(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(J), np.eye(7), atol=1e-5)


def _circle_gt(n, radius=5.0):
    """Cam-from-world SE3 poses on a circle, facing the center."""
    Rs, ts = [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        z = -c / np.linalg.norm(c)                      # look at origin
        x = np.array([-np.sin(a), np.cos(a), 0.0])
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], axis=1)               # world-from-cam cols
        Rcw = Rwc.T
        Rs.append(Rcw)
        ts.append(-Rcw @ c)
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


class TestSim3PGO:
    def test_exact_recovery(self):
        """Chain + loops with exact Sim3 measurements, noisy init (incl.
        scale noise): the solver must drive cost to ~0 and recover GT."""
        rng = np.random.default_rng(3)
        n = 24
        tau = rng.normal(0, 0.4, (n, 7)).astype(np.float32)
        tau[0] = 0
        gt = Sim3.exp(jnp.asarray(tau))
        ei = list(range(n - 1)) + [0, 5, 11]
        ej = list(range(1, n)) + [n - 1, 17, 20]
        ei, ej = np.asarray(ei, np.int32), np.asarray(ej, np.int32)
        Si = Sim3(gt.R[ei], gt.t[ei], gt.s[ei])
        Sj = Sim3(gt.R[ej], gt.t[ej], gt.s[ej])
        Z = Si.compose(Sj.inverse())
        noise = rng.normal(0, 0.1, (n, 7)).astype(np.float32)
        noise[0] = 0
        init = Sim3.exp(jnp.asarray(noise)).compose(gt)
        g = Sim3Graph(init, jnp.asarray(ei), jnp.asarray(ej), Z,
                      jnp.ones(len(ei), jnp.float32),
                      jnp.ones(n, bool),
                      jnp.asarray([True] + [False] * (n - 1)))
        res = sim3_pgo_solve(g, max_iters=50)
        assert float(res.cost) < 1e-8 * max(float(res.cost0), 1.0)
        np.testing.assert_allclose(np.asarray(res.poses.s), np.asarray(gt.s),
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res.poses.t), np.asarray(gt.t),
                                   atol=5e-3)

    @pytest.fixture(scope="class")
    def drift_problem(self):
        n = 30
        drift = 1.03                   # per-step local-scale growth
        R_gt, t_gt = _circle_gt(n)
        sig = drift ** np.arange(n)    # local map scale at frame k
        # VO estimate: chain relatives whose translation is scaled by the
        # CURRENT local scale (the monocular drift mechanism).
        Re = [np.asarray(R_gt[0])]
        te = [np.asarray(t_gt[0])]
        Zs_R, Zs_t = [], []
        for k in range(n - 1):
            Tk = SE3(R_gt[k], t_gt[k])
            Tk1 = SE3(R_gt[k + 1], t_gt[k + 1])
            rel = Tk.compose(Tk1.inverse())            # cam_{k+1} -> cam_k
            Zt = np.asarray(rel.t) * sig[k]            # drifted odometry
            Zs_R.append(np.asarray(rel.R)); Zs_t.append(Zt)
            Zinv = SE3(jnp.asarray(rel.R), jnp.asarray(Zt)).inverse()
            nxt = Zinv.compose(SE3(jnp.asarray(Re[-1]), jnp.asarray(te[-1])))
            Re.append(np.asarray(nxt.R)); te.append(np.asarray(nxt.t))
        # Loop closure (n-1 -> 0): an accurate Sim3 alignment of the two
        # ends' local maps: Z = (R_rel, sig_{n-1} * t_rel, sig_{n-1}/sig_0).
        T0 = SE3(R_gt[n - 1], t_gt[n - 1]).compose(SE3(R_gt[0], t_gt[0]).inverse())
        Zs_R.append(np.asarray(T0.R))
        Zs_t.append(np.asarray(T0.t) * sig[n - 1])
        ei = np.arange(n - 1).tolist() + [n - 1]
        ej = np.arange(1, n).tolist() + [0]
        Z_scale = np.ones(n, np.float32)
        Z_scale[-1] = sig[n - 1]
        est = SE3(jnp.asarray(np.stack(Re), jnp.float32),
                  jnp.asarray(np.stack(te), jnp.float32))
        Z = SE3(jnp.asarray(np.stack(Zs_R), jnp.float32),
                jnp.asarray(np.stack(Zs_t), jnp.float32))
        return (n, sig, R_gt, t_gt, est, np.asarray(ei, np.int32),
                np.asarray(ej, np.int32), Z, Z_scale)

    @staticmethod
    def _centers(R, t):
        return -np.einsum("fji,fj->fi", np.asarray(R), np.asarray(t))

    def test_scale_drift_closed_by_sim3_not_se3(self, drift_problem):
        n, sig, R_gt, t_gt, est, ei, ej, Z, Z_scale = drift_problem
        gt_c = self._centers(R_gt, t_gt)
        init_err = np.linalg.norm(self._centers(est.R, est.t) - gt_c,
                                  axis=1).max()
        fixed = np.zeros(n, bool); fixed[0] = True
        weight = np.ones(n, np.float32)
        weight[-1] = 5.0                      # trust the loop alignment

        g3 = graph_from_se3(est, ei, ej, Z, weight, np.ones(n, bool), fixed,
                            Z_scale=Z_scale)
        res = sim3_pgo_solve(g3, max_iters=60)
        new_poses, _ = sim3_correct_map(
            res.poses, est, jnp.zeros((1, 3)), jnp.zeros(1, jnp.int32))
        sim3_err = np.linalg.norm(
            self._centers(new_poses.R, new_poses.t) - gt_c, axis=1).max()

        gse3 = PoseGraph(est, jnp.asarray(ei), jnp.asarray(ej), Z,
                         jnp.asarray(weight), jnp.ones(n, bool),
                         jnp.asarray(fixed))
        rse3 = pgo_solve(gse3, max_iters=60)
        se3_err = np.linalg.norm(
            self._centers(rse3.poses.R, rse3.poses.t) - gt_c, axis=1).max()

        # drifted input is way off; Sim3 fixes it; SE3 cannot.
        assert init_err > 0.5, init_err
        assert sim3_err < 0.25 * init_err, (sim3_err, init_err)
        assert sim3_err < 0.6 * se3_err, (sim3_err, se3_err)
        # recovered per-frame scales track the injected drift profile.
        np.testing.assert_allclose(np.asarray(res.poses.s), sig, rtol=0.08)

    def test_correct_map_preserves_projection(self, drift_problem):
        """T = (R, t/s) induces the same pinhole projection as S = (R, t, s):
        points re-anchored by sim3_correct_map reproject identically."""
        n, sig, R_gt, t_gt, est, ei, ej, Z, Z_scale = drift_problem
        rng = np.random.default_rng(4)
        fixed = np.zeros(n, bool); fixed[0] = True
        g3 = graph_from_se3(est, ei, ej, Z, np.ones(n, np.float32),
                            np.ones(n, bool), fixed, Z_scale=Z_scale)
        res = sim3_pgo_solve(g3, max_iters=40)
        pts = rng.normal(0, 1.0, (50, 3)).astype(np.float32)
        ref = rng.integers(0, n, 50).astype(np.int32)
        new_poses, new_pts = sim3_correct_map(res.poses, est,
                                              jnp.asarray(pts),
                                              jnp.asarray(ref))
        # old cam coords through the OLD pose == new cam coords through the
        # corrected similarity (up to the uniform 1/s depth rescale that a
        # projective camera cannot see): check pinhole projections match.
        old_cam = SE3(est.R[ref], est.t[ref]).apply(jnp.asarray(pts))
        new_cam = SE3(new_poses.R[ref], new_poses.t[ref]).apply(new_pts)
        proj_old = np.asarray(old_cam[:, :2] / old_cam[:, 2:3])
        proj_new = np.asarray(new_cam[:, :2] / new_cam[:, 2:3])
        np.testing.assert_allclose(proj_new, proj_old, atol=1e-3)
