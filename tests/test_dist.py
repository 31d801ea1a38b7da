"""Distributed tier (SURVEY.md §5.2): every sharded path must equal its
unsharded counterpart on the simulated 8-device CPU topology."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy
from fastmatch_tpu.dist.mesh import make_mesh
from fastmatch_tpu.dist.sharded_match import match_batch_dp, match_pair_sharded
from fastmatch_tpu.dist.dist_ba import ba_solve_sharded
from fastmatch_tpu.dist.overlap import OverlapScheduler
from fastmatch_tpu.matching.matcher import match_batch, match_pair_jnp
from fastmatch_tpu.ba.lm import ba_solve
from synth import corresponding_descriptors, random_descriptors
from test_ba import build_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(n_data=1, n_bank=8)


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(n_data=2, n_bank=4)


class TestShardedMatch:
    def test_ring_equals_unsharded(self, rng, mesh8):
        a, b, _ = corresponding_descriptors(rng, 700, noise=0.1, n_distract=324)
        da = descriptors_from_numpy(a, 1024)
        db = descriptors_from_numpy(b, 2048)
        ms = match_pair_sharded(da, db, mesh8)
        mj = match_pair_jnp(da, db)
        np.testing.assert_array_equal(np.asarray(ms.valid), np.asarray(mj.valid))
        v = np.asarray(ms.valid)
        np.testing.assert_array_equal(np.asarray(ms.idx)[v], np.asarray(mj.idx)[v])
        np.testing.assert_allclose(
            np.asarray(ms.dist)[v], np.asarray(mj.dist)[v], rtol=1e-6, atol=1e-6
        )

    def test_ring_adversarial_masks(self, rng, mesh8):
        a = random_descriptors(rng, 512)
        b = random_descriptors(rng, 1024)
        keep_a = np.arange(512) % 3 != 0
        keep_b = np.arange(1024) % 5 != 2
        da = Descriptors(jnp.asarray(a), jnp.asarray(keep_a))
        db = Descriptors(jnp.asarray(b), jnp.asarray(keep_b))
        ms = match_pair_sharded(da, db, mesh8)
        mj = match_pair_jnp(da, db)
        np.testing.assert_array_equal(np.asarray(ms.valid), np.asarray(mj.valid))
        v = np.asarray(ms.valid)
        np.testing.assert_array_equal(np.asarray(ms.idx)[v], np.asarray(mj.idx)[v])

    def test_dp_batch_equals_local(self, rng, mesh2x4):
        B = 4
        pairs = [corresponding_descriptors(rng, 100, noise=0.1, n_distract=28)
                 for _ in range(B)]
        da = Descriptors(
            jnp.stack([descriptors_from_numpy(p[0], 128).data for p in pairs]),
            jnp.stack([descriptors_from_numpy(p[0], 128).mask for p in pairs]),
        )
        db = Descriptors(
            jnp.stack([descriptors_from_numpy(p[1], 128).data for p in pairs]),
            jnp.stack([descriptors_from_numpy(p[1], 128).mask for p in pairs]),
        )
        md = match_batch_dp(da, db, mesh2x4)
        ml = match_batch(da, db)
        np.testing.assert_array_equal(np.asarray(md.valid), np.asarray(ml.valid))
        v = np.asarray(md.valid)
        np.testing.assert_array_equal(np.asarray(md.idx)[v], np.asarray(ml.idx)[v])


class TestDistBA:
    def test_sharded_equals_single(self, rng, mesh8):
        _, problem = build_problem(rng, n_frames=6, n_points=100, perturb=0.04)
        res_s = ba_solve_sharded(problem, mesh8, max_iters=12, pcg_iters=40)
        res_1 = ba_solve(problem, max_iters=12, pcg_iters=40)
        # psum changes summation order: equality to tolerance, not bits.
        assert float(res_s.cost) < float(res_s.cost0) * 1e-2
        np.testing.assert_allclose(
            np.asarray(res_s.poses.t), np.asarray(res_1.poses.t), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(res_s.points), np.asarray(res_1.points), atol=5e-3
        )

    def test_obs_padding(self, rng, mesh8):
        # Capacity not divisible by 8 gets padded with dead observations.
        _, problem = build_problem(rng, n_frames=4, n_points=40, cap_obs=250)
        res = ba_solve_sharded(problem, mesh8, max_iters=6)
        assert float(res.cost) <= float(res.cost0)


class TestOverlap:
    def test_results_equal_serial(self, rng, mesh8):
        blocks = [jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
                  for _ in range(5)]
        fa = jax.jit(lambda x: x @ x.T)
        fb = jax.jit(lambda y: jnp.tanh(y).sum(axis=0))
        sched = OverlapScheduler(fa, fb)
        out = sched.run(blocks)
        serial = [fb(fa(b)) for b in blocks]
        for o, s in zip(out, serial):
            np.testing.assert_allclose(np.asarray(o), np.asarray(s), rtol=1e-6)
