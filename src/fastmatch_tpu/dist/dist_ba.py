"""Distributed bundle adjustment (component T18).

Observation-sharded BA: the observation table partitions across the mesh's
``bank`` axis (map blocks / covisibility groups per device); camera poses and
landmarks are replicated. Each LM/PCG step assembles local partial
Hessian/gradient blocks with segment-sums and psum-reduces them over the
axis — on a pod slice these are the separator-camera reductions riding ICI
(BASELINE.json:5 "distributed Levenberg-Marquardt ... over ICI collectives").

The entire solver (ba/lm.py with ``axis_name`` threaded through) runs inside
one ``shard_map``: the while_loop/PCG state is replicated, the heavy
per-observation work is sharded, and the only cross-device traffic is the
psum of (C,6,6)/(P,3,3)/(C,6)/(P,3) blocks per linearization plus two small
psums per PCG matvec.

Equivalence with single-device ba_solve is exact up to psum summation order
(tested to tight tolerance on the 8-device CPU mesh, SURVEY.md §5.2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fastmatch_tpu.ba.lm import ba_solve_raw, BAResult
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.core.lie import SE3


def shard_observations(obs: Observations, n_shards: int) -> Observations:
    """Pad the observation table to a multiple of n_shards (dead padding)."""
    o = obs.capacity
    rem = (-o) % n_shards
    if rem == 0:
        return obs
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((rem,) + x.shape[1:], x.dtype)], axis=0
    )
    return Observations(
        cam_idx=pad(obs.cam_idx),
        pt_idx=pad(obs.pt_idx),
        uv=pad(obs.uv),
        mask=jnp.concatenate([obs.mask, jnp.zeros(rem, bool)]),
    )


import functools


@functools.lru_cache(maxsize=None)
def _sharded_solver(mesh: Mesh, max_iters: int, pcg_iters: int,
                    huber_delta_static):
    """Jitted shard_map'd BA solver, cached per (mesh, options) — building
    and retracing the collective graph per map block costs host seconds,
    serialized against the device (exactly what the overlap scheduler is
    meant to hide)."""
    rep = P()
    obs_spec = Observations(P("bank"), P("bank"), P("bank"), P("bank"))
    in_specs = BAProblem(
        poses=SE3(rep, rep),
        points=rep,
        obs=obs_spec,
        cam_mask=rep,
        pt_mask=rep,
        fixed_cams=rep,
    )

    def body(prob):
        return ba_solve_raw(
            prob,
            max_iters=max_iters,
            pcg_iters=pcg_iters,
            huber_delta_static=huber_delta_static,
            axis_name="bank",
        )

    out_specs = BAResult(
        poses=SE3(rep, rep), points=rep, cost0=rep, cost=rep, iters=rep,
        accepted=rep,
    )
    fn = shard_map(
        body, mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)


def ba_solve_sharded(
    problem: BAProblem,
    mesh: Mesh,
    max_iters: int = 20,
    pcg_iters: int = 40,
    huber_delta_static: float | None = None,
    presorted: bool = False,
) -> BAResult:
    """Run LM-BA with observations sharded over mesh axis ``bank``.

    ``presorted``: the caller has already laid the table out as equal,
    per-shard pt-sorted slices — e.g. covisibility map blocks from
    dist/partition.partition_problem — so skip the global pad+sort (which
    would scatter block rows across all devices again)."""
    from fastmatch_tpu.ba.lm import sort_obs_by_point

    n_shards = mesh.shape["bank"]
    if presorted:
        if problem.obs.capacity % n_shards:
            raise ValueError(
                f"presorted obs capacity {problem.obs.capacity} must be a "
                f"multiple of the bank axis size {n_shards}")
    else:
        # Pad first (padding appends pt_idx-0 rows), THEN pt-sort globally:
        # contiguous shards of a sorted table stay sorted, which the Pallas
        # segment kernels rely on per-device.
        obs = shard_observations(problem.obs, n_shards)
        problem = sort_obs_by_point(problem._replace(obs=obs))
    fn = _sharded_solver(mesh, max_iters, pcg_iters, huber_delta_static)
    return fn(problem)
