"""Structural scale tests for BASELINE.json configs 4-5 (slow-marked):

- config 4: 500-keyframe pose graph with loop closures — the dense-Cholesky
  PGO at its design scale.
- config 5 (matching structure): a 16,384-row descriptor bank — larger than
  the Pallas VMEM-resident limit — queried through the 8-device ring-sharded
  matcher AND the single-device chunked-merge path, both bit-equal to the
  unsharded jnp matcher.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.dist.mesh import make_mesh
from fastmatch_tpu.dist.sharded_match import match_pair_sharded
from fastmatch_tpu.kernels.distance_topk import MAX_RESIDENT_M, match_pair_pallas
from fastmatch_tpu.matching.matcher import match_pair_jnp
from fastmatch_tpu.posegraph.pgo import (PoseGraph, pgo_solve,
                                          pgo_solve_hierarchical)
from fastmatch_tpu.utils.evaluation import ate_rmse
from synth import random_descriptors


@pytest.mark.slow
class TestBigBank:
    """16k-row bank: ring-sharded and chunked paths vs the jnp anchor."""

    BANK = 16384  # == 8 shards x 2048, and 4x MAX_RESIDENT_M

    def _bank(self, rng):
        q = descriptors_from_numpy(random_descriptors(rng, 200), 256)
        bank = descriptors_from_numpy(random_descriptors(rng, self.BANK - 100),
                                      self.BANK)
        return q, bank

    def test_chunked_equals_jnp(self, rng):
        assert self.BANK > MAX_RESIDENT_M
        q, bank = self._bank(rng)
        ref = match_pair_jnp(q, bank)
        got = match_pair_pallas(q, bank, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        np.testing.assert_array_equal(
            np.asarray(ref.idx)[np.asarray(ref.valid)],
            np.asarray(got.idx)[np.asarray(got.valid)],
        )

    def test_ring_equals_jnp(self, rng):
        q, bank = self._bank(rng)
        mesh = make_mesh(n_data=1, n_bank=8)
        ref = match_pair_jnp(q, bank)
        got = match_pair_sharded(q, bank, mesh, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
        np.testing.assert_array_equal(
            np.asarray(ref.idx)[np.asarray(ref.valid)],
            np.asarray(got.idx)[np.asarray(got.valid)],
        )


@pytest.mark.slow
class TestPoseGraph500:
    """Config 4 scale: 500 keyframes, drifted odometry, 5 loop closures."""

    def test_500_keyframe_loop(self, rng):
        n = 500
        ang = 2 * np.pi * np.arange(n) / n
        Rg = np.zeros((n, 3, 3), np.float32)
        tg = np.zeros((n, 3), np.float32)
        for k in range(n):
            c, s = np.cos(ang[k]), np.sin(ang[k])
            Rw = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            Rg[k] = Rw.T
            tg[k] = -Rw.T @ np.array([10 * c, 10 * s, 0], np.float32)

        def rel(Ri, ti, Rj, tj):
            return SE3(jnp.asarray(Ri), jnp.asarray(ti)).compose(
                SE3(jnp.asarray(Rj), jnp.asarray(tj)).inverse()
            )

        drift = 0.004
        R0, t0 = [Rg[0]], [tg[0]]
        ei, ej, ZR, Zt, w = [], [], [], [], []
        for k in range(1, n):
            Z = rel(Rg[k], tg[k], Rg[k - 1], tg[k - 1])
            noise = SE3.exp(jnp.asarray(np.concatenate([
                drift * rng.standard_normal(3),
                0.5 * drift * rng.standard_normal(3),
            ]).astype(np.float32)))
            Zn = noise.compose(Z)
            Tk = Zn.compose(SE3(jnp.asarray(R0[-1]), jnp.asarray(t0[-1])))
            R0.append(np.array(Tk.R))
            t0.append(np.array(Tk.t))
            ei.append(k); ej.append(k - 1)
            ZR.append(np.array(Zn.R)); Zt.append(np.array(Zn.t)); w.append(1.0)
        # 5 exact loop closures spread around the circle.
        for a, b in [(n - 1, 0), (n // 2, 0), (n - 1, n // 2),
                     (3 * n // 4, n // 4), (n // 4, 0)]:
            Z = rel(Rg[a], tg[a], Rg[b], tg[b])
            ei.append(a); ej.append(b)
            ZR.append(np.array(Z.R)); Zt.append(np.array(Z.t)); w.append(1.0)

        fixed = np.zeros(n, bool); fixed[0] = True
        g = PoseGraph(
            poses=SE3(jnp.asarray(np.stack(R0)), jnp.asarray(np.stack(t0))),
            edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            Z=SE3(jnp.asarray(np.stack(ZR)), jnp.asarray(np.stack(Zt))),
            edge_weight=jnp.asarray(np.array(w, np.float32)),
            pose_mask=jnp.ones(n, bool),
            fixed=jnp.asarray(fixed),
        )

        def centers(R, t):
            return -np.einsum("nji,nj->ni", np.asarray(R), np.asarray(t))

        gt_c = jnp.asarray(centers(Rg, tg))
        ate0 = float(ate_rmse(jnp.asarray(centers(np.stack(R0), np.stack(t0))), gt_c))
        res = pgo_solve(g, max_iters=30)
        ate1 = float(ate_rmse(jnp.asarray(centers(res.poses.R, res.poses.t)), gt_c))
        assert float(res.cost) < float(res.cost0)
        assert ate1 < 0.25 * ate0, f"PGO ATE {ate1} !< 0.25 * {ate0}"


@pytest.mark.slow
class TestPoseGraph10k:
    """Config-5 scale (BASELINE.json:12, 10k+ keyframes): the dense PGO
    Hessian would be (60k, 60k) = 14.4 GB — only the matrix-free PCG solver
    (pgo_solve(solver="pcg")) can run this graph. Vectorized builder: the
    500-kf test's Python compose-per-frame loop would be 10k jnp dispatches."""

    def test_10k_keyframe_pcg(self, rng):
        """Odometry-drift init (the real SLAM shape: init = integrated
        noisy odometry, drift is exactly what the loop closures observe).
        Flat block-Jacobi PCG cannot fix it — information moves ~one
        edge per inner iteration, so 12 LM x 80 PCG leaves ATE at ~97%
        of init (asserted below as the negative control) — while the
        hierarchical condensed-graph solve crushes it. The original
        version of this test perturbed GT with a small random walk and
        demanded ATE below the information floor of its own noisy
        measurements; it had never passed."""
        n = 10_000
        ang = 2 * np.pi * np.arange(n) / n
        c, s = np.cos(ang), np.sin(ang)
        Rw = np.zeros((n, 3, 3), np.float32)
        Rw[:, 0, 0] = c; Rw[:, 0, 1] = -s
        Rw[:, 1, 0] = s; Rw[:, 1, 1] = c
        Rw[:, 2, 2] = 1.0
        Rg = np.swapaxes(Rw, 1, 2).copy()                     # world->cam
        eye = np.stack([100 * c, 100 * s, np.zeros(n)], 1).astype(np.float32)
        tg = -np.einsum("nij,nj->ni", Rg, eye).astype(np.float32)

        def rel_np(Ra, ta, Rb, tb):
            """Z_ab = T_a T_b^-1, batched numpy."""
            R = np.einsum("nij,nkj->nik", Ra, Rb)
            t = ta - np.einsum("nij,nj->ni", R, tb)
            return R.astype(np.float32), t.astype(np.float32)

        oi = np.arange(1, n, dtype=np.int32)
        oj = oi - 1
        ZRo, Zto = rel_np(Rg[oi], tg[oi], Rg[oj], tg[oj])
        nz = jax.vmap(SE3.exp)(jnp.asarray(
            0.002 * rng.standard_normal((n - 1, 6)).astype(np.float32)))
        Zo = nz.compose(SE3(jnp.asarray(ZRo), jnp.asarray(Zto)))

        # init = integrate the NOISY odometry from pose 0 (host f64).
        ZoR = np.asarray(Zo.R, np.float64)
        Zot = np.asarray(Zo.t, np.float64)
        Ri = np.zeros((n, 3, 3)); ti = np.zeros((n, 3))
        Ri[0], ti[0] = Rg[0], tg[0]
        for k in range(1, n):
            Ri[k] = ZoR[k - 1] @ Ri[k - 1]
            ti[k] = ZoR[k - 1] @ ti[k - 1] + Zot[k - 1]
        init = SE3(jnp.asarray(Ri.astype(np.float32)),
                   jnp.asarray(ti.astype(np.float32)))

        # exact loop closures every 250 frames, information-weighted
        li = np.arange(250, n, 250, dtype=np.int32)
        lj = li - 250
        ZRl, Ztl = rel_np(Rg[li], tg[li], Rg[lj], tg[lj])

        fixed = np.zeros(n, bool); fixed[0] = True
        g = PoseGraph(
            poses=init,
            edge_i=jnp.asarray(np.concatenate([oi, li])),
            edge_j=jnp.asarray(np.concatenate([oj, lj])),
            Z=SE3(jnp.concatenate([Zo.R, jnp.asarray(ZRl)]),
                  jnp.concatenate([Zo.t, jnp.asarray(Ztl)])),
            edge_weight=jnp.asarray(np.concatenate(
                [np.ones(len(oi)), 10.0 * np.ones(len(li))]).astype(
                    np.float32)),
            pose_mask=jnp.ones(n, bool),
            fixed=jnp.asarray(fixed),
        )

        def centers(R, t):
            return -np.einsum("nji,nj->ni", np.asarray(R), np.asarray(t))

        gt_c = jnp.asarray(centers(Rg, tg))
        ate0 = float(ate_rmse(jnp.asarray(centers(init.R, init.t)), gt_c))
        assert ate0 > 2.0          # the drift is macroscopic

        # negative control: flat PCG converges cost but not the drift
        flat = pgo_solve(g, max_iters=12, solver="pcg", pcg_iters=80)
        ate_flat = float(ate_rmse(
            jnp.asarray(centers(flat.poses.R, flat.poses.t)), gt_c))
        assert float(flat.cost) < float(flat.cost0)
        assert ate_flat > 0.5 * ate0, "flat PCG fixed the drift?! " \
            "hierarchical path no longer motivated — revisit this test"

        res = pgo_solve_hierarchical(g)
        ate1 = float(ate_rmse(
            jnp.asarray(centers(res.poses.R, res.poses.t)), gt_c))
        assert float(res.cost) < float(res.cost0)
        assert ate1 < 0.1 * ate0, f"10k PGO ATE {ate1} !< 0.1 * {ate0}"
