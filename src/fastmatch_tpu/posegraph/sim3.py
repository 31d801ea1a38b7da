"""Sim(3) pose-graph optimization: loop closure with scale drift.

A monocular reconstruction is determined only up to a similarity, so its
drift lives in Sim(3): by the time a loop closes, accumulated error has a
*scale* component that an SE(3) correction cannot represent — distributing
it over the cycle requires optimizing over 7-dof similarity poses
(the classic monocular loop-closure formulation; no counterpart exists in
the reference, whose mount is empty — SURVEY.md §0; this extends component
T15 / BASELINE.json config 4 to the monocular-drift group).

Design mirrors posegraph/pgo.py's dense path exactly, lifted to 7-dim
tangents ``[rho, omega, sigma]`` (core/lie.py Sim3):

- per-edge residual r_e = log(Z_ij^-1 S_i S_j^-1), Jacobians by vmapped
  forward-mode autodiff of the left-perturbed residual;
- dense (7N, 7N) normal equations via 4 block scatter-adds per edge,
  damped Cholesky, LM accept/reject in ``lax.while_loop``;
- Huber/Geman robust kernels and gauge fixing shared with pgo.py.

Scale observability: odometry edges measured with unit relative scale say
"no LOCAL drift"; a loop-closure edge whose Sim3 measurement (from e.g.
aligning the two ends' local maps) carries s != 1 injects the accumulated
drift, and the solver spreads it around the cycle. At least one pose must
be ``fixed`` (or carry priors) — scale gauge is otherwise free.

``sim3_correct_map`` converts the solved similarity poses back to an SE3
trajectory + rescaled landmarks (the t/s extraction).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3, Sim3
from fastmatch_tpu.posegraph.pgo import _robust_cost, _robust_weight


class Sim3Graph(NamedTuple):
    """poses: Sim3 batch (N,) cam-from-world similarities; edges i->j with
    measurement Z_ij = S_i S_j^-1 (maps cam_j coords into cam_i, with
    relative scale). Fixed-capacity edge table, same masking discipline as
    pgo.PoseGraph."""

    poses: Sim3
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,) int32
    Z: Sim3                   # (E,) measurements
    edge_weight: jnp.ndarray  # (E,) f32; 0 = dead edge
    pose_mask: jnp.ndarray    # (N,) live poses
    fixed: jnp.ndarray        # (N,) gauge-fixed poses


def graph_from_se3(poses: SE3, edge_i, edge_j, Z: SE3, edge_weight,
                   pose_mask, fixed, Z_scale=None) -> Sim3Graph:
    """Lift an SE3 pose graph to Sim3. Odometry edges get scale 1;
    loop-closure edges pass their measured relative scale via ``Z_scale``
    (E,) — the scale-drift signal the optimizer distributes."""
    s1 = jnp.ones(poses.t.shape[:-1], poses.t.dtype)
    zs = jnp.ones(Z.t.shape[:-1], Z.t.dtype) if Z_scale is None else jnp.asarray(Z_scale)
    return Sim3Graph(Sim3(poses.R, poses.t, s1),
                     jnp.asarray(edge_i, jnp.int32),
                     jnp.asarray(edge_j, jnp.int32),
                     Sim3(Z.R, Z.t, zs),
                     jnp.asarray(edge_weight, jnp.float32),
                     jnp.asarray(pose_mask), jnp.asarray(fixed))


def sim3_edge_residuals(poses: Sim3, g: Sim3Graph) -> jnp.ndarray:
    """(E, 7) residuals r_e = log(Z^-1 S_i S_j^-1)."""
    Si = Sim3(poses.R[g.edge_i], poses.t[g.edge_i], poses.s[g.edge_i])
    Sj = Sim3(poses.R[g.edge_j], poses.t[g.edge_j], poses.s[g.edge_j])
    rel = Si.compose(Sj.inverse())
    return g.Z.inverse().compose(rel).log()


def _edge_jacobians(poses: Sim3, g: Sim3Graph):
    """Per-edge residual + Jacobians wrt left tangents of S_i, S_j:
    (r (E, 7), Ji (E, 7, 7), Jj (E, 7, 7))."""

    def res_one(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, ZR, Zt, Zs):
        Si = Sim3.exp(xi_i).compose(Sim3(Ri, ti, si))
        Sj = Sim3.exp(xi_j).compose(Sim3(Rj, tj, sj))
        rel = Si.compose(Sj.inverse())
        return Sim3(ZR, Zt, Zs).inverse().compose(rel).log()

    zeros = jnp.zeros(7)

    def one(Ri, ti, si, Rj, tj, sj, ZR, Zt, Zs):
        args = (Ri, ti, si, Rj, tj, sj, ZR, Zt, Zs)
        r = res_one(zeros, zeros, *args)
        Ji = jax.jacfwd(res_one, argnums=0)(zeros, zeros, *args)
        Jj = jax.jacfwd(res_one, argnums=1)(zeros, zeros, *args)
        return r, Ji, Jj

    return jax.vmap(one)(poses.R[g.edge_i], poses.t[g.edge_i], poses.s[g.edge_i],
                         poses.R[g.edge_j], poses.t[g.edge_j], poses.s[g.edge_j],
                         g.Z.R, g.Z.t, g.Z.s)


def _graph_cost(poses: Sim3, g: Sim3Graph, delta, kernel: str):
    r = sim3_edge_residuals(poses, g)
    rn = jnp.linalg.norm(r, axis=-1)
    return jnp.sum(g.edge_weight * _robust_cost(rn, delta, kernel))


def _build_normal_eqs(poses: Sim3, g: Sim3Graph, delta, kernel: str):
    n = poses.R.shape[0]
    r, Ji, Jj = _edge_jacobians(poses, g)
    w = g.edge_weight
    if delta is not None:
        w = w * _robust_weight(jnp.linalg.norm(r, axis=-1), delta, kernel)
    wv = w[:, None, None]
    Hii = jnp.einsum("eki,ekj->eij", Ji * wv, Ji)
    Hjj = jnp.einsum("eki,ekj->eij", Jj * wv, Jj)
    Hij = jnp.einsum("eki,ekj->eij", Ji * wv, Jj)
    gi = jnp.einsum("eki,ek->ei", Ji * wv, r)
    gj = jnp.einsum("eki,ek->ei", Jj * wv, r)
    H = jnp.zeros((n, 7, n, 7))
    H = H.at[g.edge_i, :, g.edge_i, :].add(Hii)
    H = H.at[g.edge_j, :, g.edge_j, :].add(Hjj)
    H = H.at[g.edge_i, :, g.edge_j, :].add(Hij)
    H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
    grad = jnp.zeros((n, 7)).at[g.edge_i].add(gi).at[g.edge_j].add(gj)
    return H.reshape(7 * n, 7 * n), grad.reshape(7 * n)


class Sim3Result(NamedTuple):
    poses: Sim3
    cost0: jnp.ndarray
    cost: jnp.ndarray
    iters: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iters", "huber_delta_static", "kernel"))
def sim3_pgo_solve(
    g: Sim3Graph,
    max_iters: int = 30,
    lam0: float = 1e-4,
    huber_delta_static: float | None = None,
    kernel: str = "huber",
    rtol: float = 1e-8,
) -> Sim3Result:
    """LM over Sim(3) poses, dense damped-Cholesky normal equations.

    Dense-only by design: Sim3 PGO runs on loop-closure keyframe graphs
    (hundreds to ~1-2k poses); scale-out graphs go through the SE3 PCG path
    after sim3_correct_map. 7N x 7N at N=1k is 49 MF — one MXU Cholesky."""
    n = g.poses.R.shape[0]
    upd = (g.pose_mask & ~g.fixed).astype(jnp.float32)
    upd7 = jnp.repeat(upd, 7)

    def cost_of(R, t, s):
        return _graph_cost(Sim3(R, t, s), g, huber_delta_static, kernel)

    cost0 = cost_of(g.poses.R, g.poses.t, g.poses.s)

    def body(state):
        R, t, s, lam, cost, it, done = state
        H, grad = _build_normal_eqs(Sim3(R, t, s), g, huber_delta_static, kernel)
        H = H * upd7[:, None] * upd7[None, :] + jnp.diag(1.0 - upd7)
        grad = grad * upd7
        Hd = H + jnp.diag(lam * jnp.diagonal(H) + 1e-10)
        L = jnp.linalg.cholesky(Hd)
        dx = -jax.scipy.linalg.cho_solve((L, True), grad).reshape(n, 7)
        bad = jnp.any(jnp.isnan(dx))
        dx = jnp.where(bad, 0.0, dx) * upd[:, None]
        newp = jax.vmap(lambda tw, R_, t_, s_: Sim3.exp(tw).compose(Sim3(R_, t_, s_)))(
            dx, R, t, s)
        new_cost = cost_of(newp.R, newp.t, newp.s)
        accept = (new_cost < cost) & ~bad
        R = jnp.where(accept, newp.R, R)
        t = jnp.where(accept, newp.t, t)
        s = jnp.where(accept, newp.s, s)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-15)
        done = accept & (rel < rtol)
        return R, t, s, lam, jnp.where(accept, new_cost, cost), it + 1, done

    def cond(state):
        return (state[5] < max_iters) & ~state[6]

    R, t, s, _, cost, it, _ = jax.lax.while_loop(
        cond, body,
        (g.poses.R, g.poses.t, g.poses.s, jnp.float32(lam0), cost0,
         jnp.int32(0), jnp.bool_(False)))
    return Sim3Result(poses=Sim3(R, t, s), cost0=cost0, cost=cost, iters=it)


def sim3_correct_map(solved: Sim3, old_poses: SE3, points: jnp.ndarray,
                     point_ref: jnp.ndarray):
    """Convert solved cam-from-world similarities back to an SE3 map.

    - poses: T_i = (R_i, t_i / s_i) — the standard extraction (the
      similarity S = [sR | t] and the rigid pose [R | t/s] induce the same
      image projection under a pinhole camera, so reprojection residuals
      are preserved).
    - points: each landmark follows its reference keyframe:
      x' = S_i_solved^-1 ( T_i_old (x) ) — re-anchor the point's old
      cam-frame coordinates through the corrected (inverse) similarity.

    point_ref: (P,) int32 reference keyframe per landmark (e.g. the first
    observing keyframe from the covisibility/obs table).
    """
    new_poses = SE3(solved.R, solved.t / solved.s[..., None])
    Told = SE3(old_poses.R[point_ref], old_poses.t[point_ref])
    x_cam = Told.apply(points)
    Sinv = Sim3(solved.R[point_ref], solved.t[point_ref],
                solved.s[point_ref]).inverse()
    return new_poses, Sinv.apply(x_cam)
