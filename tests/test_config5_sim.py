"""Config-5 composition at miniature scale (BASELINE.json:12): sharded
loop-closure retrieval over a device-sharded keyframe bank, distributed BA
per map block, the two OVERLAPPED by the scheduler, and orbax
checkpoint/resume mid-pipeline — all on the simulated 8-device CPU mesh,
asserting equality with the serial/unsharded composition.

The real config-5 topology (10k+ keyframes, N>=2 hosts over DCN) cannot run
in this container (SURVEY.md §5.2); every mechanism it composes is the one
exercised here, just at miniature extents.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import descriptors_from_numpy
from fastmatch_tpu.dist.mesh import make_mesh
from fastmatch_tpu.dist.sharded_match import match_pair_sharded
from fastmatch_tpu.dist.dist_ba import ba_solve_sharded
from fastmatch_tpu.dist.overlap import OverlapScheduler
from fastmatch_tpu.matching.matcher import match_pair_jnp
from fastmatch_tpu.ba.lm import ba_solve
from synth import corresponding_descriptors
from test_ba import build_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(n_data=1, n_bank=8)


class TestConfig5Composition:
    """Loop retrieval (ring) -> per-block distributed BA, overlapped."""

    def _blocks(self, rng, n_blocks=3):
        """Per map block: a loop-closure query against the global keyframe
        bank plus that block's BA problem."""
        bank_np, queries = [], []
        for b in range(n_blocks):
            d_q, d_b, _ = corresponding_descriptors(rng, 256, noise=0.05)
            bank_np.append(d_b)
            queries.append(d_q)
        # Global keyframe descriptor bank: n_blocks * 256 rows, 8-shardable.
        bank_rows = np.concatenate(bank_np)
        pad = (-bank_rows.shape[0]) % 8
        bank = descriptors_from_numpy(bank_rows, bank_rows.shape[0] + pad)
        problems = [build_problem(rng, n_frames=4, n_points=60,
                                  perturb=0.04)[1] for _ in range(n_blocks)]
        return bank, [descriptors_from_numpy(q, 256) for q in queries], problems

    def test_overlapped_equals_serial(self, rng, mesh8):
        bank, queries, problems = self._blocks(rng)

        def stage_a(block):
            qdesc, problem = block
            # Loop-closure retrieval: query vs the DEVICE-SHARDED bank.
            m = match_pair_sharded(qdesc, bank, mesh8)
            return m, problem

        def stage_b(inter):
            m, problem = inter
            res = ba_solve_sharded(problem, mesh8, max_iters=8, pcg_iters=30)
            return m, res

        sched = OverlapScheduler(stage_a, stage_b)
        out = sched.run(list(zip(queries, problems)))

        for (m, res), qdesc, problem in zip(out, queries, problems):
            # Retrieval equals the unsharded matcher bit-for-bit.
            ref = match_pair_jnp(qdesc, bank)
            np.testing.assert_array_equal(np.asarray(m.valid),
                                          np.asarray(ref.valid))
            np.testing.assert_array_equal(np.asarray(m.idx),
                                          np.asarray(ref.idx))
            # Distributed BA equals single-host BA to tolerance.
            ref_ba = ba_solve(problem, max_iters=8, pcg_iters=30)
            assert float(res.cost) < float(res.cost0)
            np.testing.assert_allclose(np.asarray(res.poses.t),
                                       np.asarray(ref_ba.poses.t), atol=5e-3)

    def test_checkpoint_resume_mid_pipeline(self, rng, mesh8, tmp_path):
        """Kill-and-resume between map blocks: block 0's refined state is
        checkpointed (orbax), restored into a fresh buffer, and block 1
        proceeds — end state equals the uninterrupted run."""
        import orbax.checkpoint as ocp

        _, problems = None, [build_problem(rng, n_frames=4, n_points=50,
                                           perturb=0.04)[1] for _ in range(2)]

        def run_block(problem):
            return ba_solve_sharded(problem, mesh8, max_iters=6, pcg_iters=25)

        # Uninterrupted.
        ref = [run_block(p) for p in problems]

        # Interrupted: checkpoint block 0's output, restore, run block 1.
        r0 = run_block(problems[0])
        state = {"R": np.asarray(r0.poses.R), "t": np.asarray(r0.poses.t),
                 "points": np.asarray(r0.points)}
        ckpt = ocp.PyTreeCheckpointer()
        path = tmp_path / "blk0"
        ckpt.save(path, state)
        restored = ckpt.restore(path)
        np.testing.assert_allclose(restored["t"], np.asarray(ref[0].poses.t),
                                   atol=1e-6)
        r1 = run_block(problems[1])
        np.testing.assert_allclose(np.asarray(r1.poses.t),
                                   np.asarray(ref[1].poses.t), atol=1e-6)
