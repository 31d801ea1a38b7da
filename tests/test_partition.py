"""Covisibility map-block partition (dist/partition.py): covisibility
counts, balanced block recovery on a two-cluster scene, and the partition
feeding distributed BA (block-contiguous observation shards) without
changing the solution (VERDICT r1 #7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.dist.partition import (
    covisibility_matrix, order_observations_by_block, partition_frames,
    partition_problem)


def _two_cluster_obs(rng, n_frames=16, n_points=200, bridge=2):
    """Frames 0..7 see points 0..99, frames 8..15 see points 100..199;
    ``bridge`` frames near the boundary see a few of both."""
    cams, pts = [], []
    for f in range(n_frames):
        lo, hi = (0, 100) if f < n_frames // 2 else (100, 200)
        seen = rng.choice(np.arange(lo, hi), size=40, replace=False)
        if abs(f - n_frames // 2) <= bridge // 2:
            other = rng.choice(np.arange((hi) % 200, (hi) % 200 + 100),
                               size=5, replace=False)
            seen = np.concatenate([seen, other])
        cams.extend([f] * len(seen))
        pts.extend(seen.tolist())
    cam = np.asarray(cams, np.int32)
    pt = np.asarray(pts, np.int32)
    msk = np.ones(len(cam), bool)
    return cam, pt, msk, n_frames, n_points


class TestCovisibility:
    def test_matrix_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        cam, pt, msk, F, P = _two_cluster_obs(rng)
        msk = msk.copy()
        msk[::7] = False  # dead rows must not count
        C = covisibility_matrix(cam, pt, msk, F, P)
        assert C.shape == (F, F)
        assert np.array_equal(C, C.T)
        sets = [set(pt[(cam == f) & msk]) for f in range(F)]
        for i in range(F):
            for j in range(F):
                assert C[i, j] == len(sets[i] & sets[j]), (i, j)

    def test_partition_recovers_clusters(self):
        rng = np.random.default_rng(1)
        cam, pt, msk, F, P = _two_cluster_obs(rng)
        C = covisibility_matrix(cam, pt, msk, F, P)
        blocks = partition_frames(C, 2)
        assert set(blocks.tolist()) == {0, 1}
        # Away from the bridge, each half must land in one block.
        left = blocks[:6]
        right = blocks[10:]
        assert len(set(left.tolist())) == 1
        assert len(set(right.tolist())) == 1
        assert left[0] != right[0]
        # Balance: within 1.5x target weight by construction.
        w = np.bincount(blocks, weights=np.diag(C), minlength=2)
        assert w.max() <= 1.5 * np.diag(C).sum() / 2 + np.diag(C).max()

    def test_degenerate_inputs(self):
        # All frames observing nothing -> everything in one block, no crash.
        C = np.zeros((5, 5), np.int64)
        blocks = partition_frames(C, 2)
        assert blocks.shape == (5,)
        assert ((blocks >= 0) & (blocks < 2)).all()
        # More blocks than live frames.
        C2 = np.zeros((3, 3), np.int64)
        C2[0, 0] = 4
        blocks2 = partition_frames(C2, 4)
        assert ((blocks2 >= 0) & (blocks2 < 4)).all()


def _synth_ba_problem(rng, n_cams=8, n_pts=64, obs_per_cam=24):
    pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
    t = np.zeros((n_cams, 3), np.float32)
    t[:, 2] = 4.0 + 0.3 * np.arange(n_cams)
    t[:, 0] = 0.1 * np.arange(n_cams)
    cam_idx = np.repeat(np.arange(n_cams, dtype=np.int32), obs_per_cam)
    # Two-cluster structure: first half of cams sees first half of points.
    pt_idx = np.concatenate([
        rng.integers(0, n_pts // 2, (n_cams // 2) * obs_per_cam),
        rng.integers(n_pts // 2, n_pts, (n_cams - n_cams // 2) * obs_per_cam),
    ]).astype(np.int32)
    p = np.einsum("oij,oj->oi", R[cam_idx], pts[pt_idx]) + t[cam_idx]
    uv = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    uv += 0.001 * rng.standard_normal(uv.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    return BAProblem(
        poses=SE3(jnp.asarray(R), jnp.asarray(t)),
        points=jnp.asarray(pts + 0.01 * rng.standard_normal(pts.shape)
                           .astype(np.float32)),
        obs=Observations(jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                         jnp.asarray(uv), jnp.ones(len(cam_idx), bool)),
        cam_mask=jnp.ones(n_cams, bool),
        pt_mask=jnp.ones(n_pts, bool),
        fixed_cams=jnp.asarray(fixed),
    )


class TestPartitionFeedsDistBA:
    def test_block_ordered_dist_ba_equals_unordered(self):
        """Reordering observation rows into covisibility blocks (so each
        device's shard IS a map block) must not change the distributed BA
        solution beyond psum summation order."""
        from fastmatch_tpu.dist.dist_ba import ba_solve_sharded
        from fastmatch_tpu.dist.mesh import make_mesh

        assert len(jax.devices()) == 8
        mesh = make_mesh(n_data=1, n_bank=8)
        rng = np.random.default_rng(3)
        prob = _synth_ba_problem(rng)

        C = covisibility_matrix(prob.obs.cam_idx, prob.obs.pt_idx,
                                prob.obs.mask, prob.n_cams,
                                prob.points.shape[0])
        blocks = partition_frames(C, 8)
        perm, sizes = order_observations_by_block(prob.obs, blocks, 8)
        assert sorted(perm.tolist()) == list(range(prob.obs.capacity))
        assert int(sizes.sum()) == int(np.asarray(prob.obs.mask).sum())
        obs2 = jax.tree.map(lambda x: x[perm], prob.obs)
        # Rows of each block are contiguous.
        blk_of_row = blocks[np.asarray(obs2.cam_idx)]
        blk_of_row = blk_of_row[np.asarray(obs2.mask)]
        assert (np.diff(blk_of_row) >= 0).all()

        res_plain = ba_solve_sharded(prob, mesh, max_iters=5, pcg_iters=20)
        res_blk = ba_solve_sharded(prob._replace(obs=obs2), mesh,
                                   max_iters=5, pcg_iters=20)
        assert float(res_blk.cost) < float(res_blk.cost0)
        # psum summation order differs between the two row orders, and the
        # delta compounds through 5 LM accept/reject decisions — so the
        # comparison is solution-quality, not bitwise: same final cost,
        # poses within a fraction of the observation noise (1e-3 rad/px).
        np.testing.assert_allclose(float(res_blk.cost),
                                   float(res_plain.cost), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res_blk.poses.t),
                                   np.asarray(res_plain.poses.t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_blk.points),
                                   np.asarray(res_plain.points), atol=2e-3)

    def test_partition_problem_presorted_solve(self):
        """partition_problem lays the table out as equal per-block
        pt-sorted shards (dead padding first, like sort_obs_by_point);
        ba_solve_sharded(presorted=True) on it must match the default
        global-sort path to psum tolerance."""
        from fastmatch_tpu.dist.dist_ba import ba_solve_sharded
        from fastmatch_tpu.dist.mesh import make_mesh

        mesh = make_mesh(n_data=1, n_bank=8)
        rng = np.random.default_rng(5)
        prob = _synth_ba_problem(rng)
        prob2, blocks = partition_problem(prob, 8, bucket=8)
        S = prob2.obs.capacity // 8
        cam2 = np.asarray(prob2.obs.cam_idx).reshape(8, S)
        pt2 = np.asarray(prob2.obs.pt_idx).reshape(8, S)
        msk2 = np.asarray(prob2.obs.mask).reshape(8, S)
        assert msk2.sum() == int(np.asarray(prob.obs.mask).sum())
        for b in range(8):
            # Dead rows first (pt 0), live rows pt-sorted: the whole slice
            # is non-decreasing in pt_idx.
            assert (np.diff(pt2[b]) >= 0).all(), b
            k = int(msk2[b].sum())
            assert not msk2[b][:S - k].any() and msk2[b][S - k:].all(), b
            # Every live row's frame belongs to this block.
            assert (blocks[cam2[b][msk2[b]]] == b).all(), b
        res_ref = ba_solve_sharded(prob, mesh, max_iters=5, pcg_iters=20)
        res_blk = ba_solve_sharded(prob2, mesh, max_iters=5, pcg_iters=20,
                                   presorted=True)
        np.testing.assert_allclose(float(res_blk.cost),
                                   float(res_ref.cost), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res_blk.poses.t),
                                   np.asarray(res_ref.poses.t), atol=2e-3)
        np.testing.assert_allclose(np.asarray(res_blk.points),
                                   np.asarray(res_ref.points), atol=2e-3)
