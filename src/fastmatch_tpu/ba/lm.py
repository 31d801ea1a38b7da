"""Levenberg-Marquardt bundle adjustment (component T12).

Outer LM loop as a ``lax.while_loop`` (BASELINE.json:5: "distributed
Levenberg-Marquardt with Schur-complement reduction"): each iteration
linearizes, solves the Schur-reduced camera system with PCG (ba/schur.py),
back-substitutes point updates, and accepts/rejects with multiplicative
damping. Gauge fixed by freezing designated cameras (fixed_cams).

The same solve path is reused by the distributed BA (dist/): the segment-sum
assembly runs per map-block shard and separator-camera blocks are psum-ed
over the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.ba.problem import BAProblem
from fastmatch_tpu.ba.schur import (
    GroupedObs,
    assemble,
    assemble_grouped,
    back_substitute,
    damped_pp_inverse,
    group_observations,
    pcg_solve,
)


class BAResult(NamedTuple):
    poses: SE3
    points: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray
    iters: jnp.ndarray          # LM iterations executed
    accepted: jnp.ndarray       # LM steps accepted


class _LMState(NamedTuple):
    poses_R: jnp.ndarray
    poses_t: jnp.ndarray
    points: jnp.ndarray
    sys: object                 # BlockSystem/GroupedSystem at the carried
    #                             point (carried so each iteration runs ONE
    #                             assembly, not two — see body)
    lam: jnp.ndarray
    cost: jnp.ndarray
    it: jnp.ndarray
    accepted: jnp.ndarray
    done: jnp.ndarray


def ba_solve_raw(
    problem: BAProblem,
    max_iters: int = 20,
    pcg_iters: int = 40,
    lam0: float = 1e-3,
    huber_delta_static: float | None = None,
    rtol: float = 1e-6,
    axis_name: str | None = None,
    grouped: GroupedObs | None = None,
) -> BAResult:
    """Run LM to convergence (or max_iters). Returns refined poses/points.

    huber_delta_static: optional robust-kernel width in normalized image
    units (static: changes the traced graph).
    grouped: optional block-dense observation grouping (group_observations);
    switches the PCG inner loop to the scatter-free matvec (T13).
    """
    n_cams = problem.n_cams
    n_points = problem.n_points
    obs = problem.obs
    upd_mask = (problem.cam_mask & ~problem.fixed_cams).astype(jnp.float32)
    pt_upd = problem.pt_mask.astype(jnp.float32)

    def cost_at(R, t, X):
        if grouped is not None:
            return assemble_grouped(
                SE3(R, t), X, obs, grouped, n_cams, n_points,
                huber_delta_static, axis_name=axis_name,
            )
        return assemble(
            SE3(R, t), X, obs, n_cams, n_points, huber_delta_static,
            axis_name=axis_name,
        )

    sys0, cost0 = cost_at(problem.poses.R, problem.poses.t, problem.points)

    def body(state: _LMState) -> _LMState:
        # ONE assembly per iteration: the linearization at the carried
        # point lives in state.sys (evaluated when that point was the
        # TRIAL point of a previous iteration, or at init). Re-assembling
        # here — as the round-1/2 loop did — produced bit-identical values
        # (assemble is deterministic on the same point) at ~2x the
        # assembly cost per iteration; measured 14.1 -> 17+ LM iters/s at
        # the 131k-obs config-4 block.
        sys, cost = state.sys, state.cost
        # One damped point-block inverse per LM iteration, shared by the
        # PCG matvecs and the back-substitution (same sys, same lam).
        # (The fully scatter-free PCG variant — pcg_solve_grouped — trades
        # per-matvec scatters for one big Wcp pre-gather per LM iteration;
        # on v5e the pre-gather loses below ~110 matvecs/iteration, so the
        # default inner loop stays on segment-sums. See tests for parity.)
        Hpp_inv = damped_pp_inverse(sys, state.lam)
        dx_c = pcg_solve(sys, obs, state.lam, n_points, upd_mask,
                         iters=pcg_iters, axis_name=axis_name,
                         Hpp_inv=Hpp_inv)
        dx_p = (
            back_substitute(sys, obs, state.lam, dx_c, n_points, axis_name,
                            Hpp_inv=Hpp_inv)
            * pt_upd[:, None]
        )
        new_poses = jax.vmap(lambda tw, R, t: SE3.exp(tw).compose(SE3(R, t)))(
            dx_c, state.poses_R, state.poses_t
        )
        new_points = state.points + dx_p
        new_sys, new_cost = cost_at(new_poses.R, new_poses.t, new_points)
        accept = new_cost < cost
        R = jnp.where(accept, new_poses.R, state.poses_R)
        t = jnp.where(accept, new_poses.t, state.poses_t)
        X = jnp.where(accept, new_points, state.points)
        sys = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                           new_sys, sys)
        lam = jnp.where(accept, state.lam * 0.5, state.lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-12)
        done = accept & (rel < rtol)
        return _LMState(
            R, t, X, sys, lam,
            jnp.where(accept, new_cost, cost),
            state.it + 1,
            state.accepted + accept.astype(jnp.int32),
            done,
        )

    def cond(state: _LMState):
        return (state.it < max_iters) & ~state.done

    init = _LMState(
        problem.poses.R,
        problem.poses.t,
        problem.points,
        sys0,
        jnp.float32(lam0),
        cost0,
        jnp.int32(0),
        jnp.int32(0),
        jnp.bool_(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    return BAResult(
        poses=SE3(final.poses_R, final.poses_t),
        points=final.points,
        cost0=cost0,
        cost=final.cost,
        iters=final.it,
        accepted=final.accepted,
    )


_ba_solve_jit = partial(jax.jit, static_argnames=(
    "max_iters", "pcg_iters", "huber_delta_static", "axis_name"))(ba_solve_raw)


def sort_obs_by_point(problem: BAProblem) -> BAProblem:
    """Sort the observation table by pt_idx (stable, mask-preserving).

    The Pallas sorted-segment kernels (kernels/segment_ops.py) rely on this
    invariant for every pt-keyed reduction/gather; on other backends the
    order only changes f32 summation order. Dead observations (pt_idx 0,
    zero weight) sort to the front of segment 0 — harmless.
    """
    from fastmatch_tpu.ba.problem import Observations

    order = jnp.argsort(problem.obs.pt_idx)
    o = problem.obs
    obs = Observations(
        cam_idx=o.cam_idx[order],
        pt_idx=o.pt_idx[order],
        uv=o.uv[order],
        mask=o.mask[order],
    )
    return problem._replace(obs=obs)


def ba_solve(problem: BAProblem, grouped: GroupedObs | None | str = None,
             **kwargs) -> BAResult:
    """Jitted BA entry point.

    ``grouped="auto"`` builds the block-dense observation grouping host-side
    (requires a concrete observation table) and switches assembly to the
    scatter-free einsum path. Measured on v5e at 128 cams / 16k pts / 131k
    obs, the default segment-sum path and the grouped path are within 3% of
    each other (the grouped layout's large-table gathers cost what the
    scatters cost), so the simpler default stays; the grouped path is kept
    as a tested alternative for topologies where gathers are cheaper.
    """
    problem = sort_obs_by_point(problem)
    if grouped == "auto":
        grouped = None
        if not isinstance(jnp.asarray(problem.obs.cam_idx), jax.core.Tracer):
            grouped = group_observations(
                problem.obs, problem.n_cams, problem.n_points
            )
    fn = partial(_ba_solve_jit, grouped=grouped, **kwargs)
    if not isinstance(jnp.asarray(problem.obs.cam_idx), jax.core.Tracer):
        from fastmatch_tpu.utils.guards import maybe_checked

        # FASTMATCH_CHECKIFY=1 sweeps BA's observation-table gathers and
        # scatters with index/float checks (SURVEY.md §6.2); free when
        # unset. Skipped under tracing: check_error raises on host.
        fn = maybe_checked(fn)
    return fn(problem)
