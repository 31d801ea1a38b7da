"""Pose-graph optimization with loop closures (component T15).

Gauss-Newton/LM on SE(3) poses with relative-pose edges (odometry + loop
closures; BASELINE.json config 4). TPU-first choices:

- residuals/Jacobians per edge via vmapped forward-mode autodiff of the
  boxplus-perturbed residual — exact, no hand-derived adjoint bookkeeping;
- the (6N x 6N) Hessian is assembled *densely* via 4 block scatter-adds per
  edge and solved with damped Cholesky: for single-host graphs (N <= ~1k,
  BASELINE config 4's 500 keyframes) the dense solve is one big MXU-friendly
  factorization, far faster on TPU than sparse bookkeeping;
- Huber robust weights on edges (loop closures may be wrong);
- LM accept/reject loop in ``lax.while_loop``; gauge fixed by freezing
  designated poses.

The multi-host variant (dist/) reuses ``edge_residuals``; graphs beyond the
dense limit go through the same matrix-free PCG machinery as BA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3


class PoseGraph(NamedTuple):
    """poses: SE3 batch (N,); edges i->j with measurement Z_ij = T_i T_j^-1
    (maps cam_j coordinates into cam_i). Fixed-capacity edge table.

    Optional unary PRIOR factors (sensor fusion; all default None):
    - position priors (the GPS case): ``prior_idx`` (K,) pose indices,
      ``prior_xyz`` (K, 3) measured camera centers in world coordinates,
      ``prior_weight`` (K,) information scale (0 = dead slot). Three or
      more non-collinear position priors anchor the full gauge — no pose
      needs to be ``fixed``, and the solution lands in the GPS frame
      (absolute coordinates, not up-to-sim(3)).
    - full-pose priors: ``prior_T`` SE3 batch (K2,) anchoring
      ``prior_T_idx`` with ``prior_T_weight`` — e.g. a survey-grade anchor
      or a previous session's pose.
    Use ``with_position_priors`` / ``with_pose_priors`` to attach them."""

    poses: SE3
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    Z: SE3                  # measurement batch (E,)
    edge_weight: jnp.ndarray  # (E,) f32 (information scale; 0 = dead edge)
    pose_mask: jnp.ndarray  # (N,) live poses
    fixed: jnp.ndarray      # (N,) gauge-fixed poses
    prior_idx: jnp.ndarray | None = None      # (K,) int32
    prior_xyz: jnp.ndarray | None = None      # (K, 3)
    prior_weight: jnp.ndarray | None = None   # (K,)
    prior_T_idx: jnp.ndarray | None = None    # (K2,) int32
    prior_T: SE3 | None = None                # (K2,) SE3 anchors
    prior_T_weight: jnp.ndarray | None = None  # (K2,)


def with_position_priors(g: PoseGraph, idx, xyz, weight) -> PoseGraph:
    """Attach GPS-style camera-center priors (world coordinates)."""
    return g._replace(prior_idx=jnp.asarray(idx, jnp.int32),
                      prior_xyz=jnp.asarray(xyz, jnp.float32),
                      prior_weight=jnp.asarray(weight, jnp.float32))


def with_pose_priors(g: PoseGraph, idx, T: SE3, weight) -> PoseGraph:
    """Attach full SE3 anchors on the given poses."""
    return g._replace(prior_T_idx=jnp.asarray(idx, jnp.int32),
                      prior_T=T,
                      prior_T_weight=jnp.asarray(weight, jnp.float32))


def edge_residuals(poses: SE3, g: PoseGraph) -> jnp.ndarray:
    """(E, 6) residuals r_e = log(Z^-1 T_i T_j^-1)."""
    Ti = SE3(poses.R[g.edge_i], poses.t[g.edge_i])
    Tj = SE3(poses.R[g.edge_j], poses.t[g.edge_j])
    rel = Ti.compose(Tj.inverse())
    return g.Z.inverse().compose(rel).log()


def _edge_jacobians(poses: SE3, g: PoseGraph):
    """Per-edge residual + Jacobians wrt left-multiplicative twists of T_i,
    T_j. Returns (r (E, 6), Ji (E, 6, 6), Jj (E, 6, 6))."""

    def res_one(xi_i, xi_j, Ri, ti, Rj, tj, ZR, Zt):
        Ti = SE3.exp(xi_i).compose(SE3(Ri, ti))
        Tj = SE3.exp(xi_j).compose(SE3(Rj, tj))
        rel = Ti.compose(Tj.inverse())
        return SE3(ZR, Zt).inverse().compose(rel).log()

    zeros = jnp.zeros(6)

    def one(Ri, ti, Rj, tj, ZR, Zt):
        r = res_one(zeros, zeros, Ri, ti, Rj, tj, ZR, Zt)
        Ji = jax.jacfwd(res_one, argnums=0)(zeros, zeros, Ri, ti, Rj, tj, ZR, Zt)
        Jj = jax.jacfwd(res_one, argnums=1)(zeros, zeros, Ri, ti, Rj, tj, ZR, Zt)
        return r, Ji, Jj

    Ri = poses.R[g.edge_i]
    ti = poses.t[g.edge_i]
    Rj = poses.R[g.edge_j]
    tj = poses.t[g.edge_j]
    return jax.vmap(one)(Ri, ti, Rj, tj, g.Z.R, g.Z.t)


def _robust_weight(rn, delta, kernel: str):
    """IRLS weight w = rho'(r)/r for residual norm rn: huber's linear tail
    still exerts constant pull on gross outliers; geman (Geman-McClure)
    redescends to zero — use it for possibly-wrong loop closures."""
    if kernel == "huber":
        return jnp.where(rn <= delta, 1.0, delta / jnp.maximum(rn, 1e-12))
    if kernel == "geman":
        return (delta**2 / (delta**2 + rn**2)) ** 2
    raise ValueError(f"unknown robust kernel {kernel!r}")


def _robust_cost(rn, delta, kernel: str):
    """The TRUE robust loss rho(rn) (monotone, saturating). LM acceptance
    must compare this — the IRLS surrogate 0.5*w(r)*r^2 is NON-monotone for
    redescending kernels (a step that blows a residual past delta scores
    LOWER than a small residual), so accepting on it lets divergence
    masquerade as convergence."""
    if delta is None:
        return 0.5 * rn * rn
    if kernel == "huber":
        return jnp.where(rn <= delta, 0.5 * rn * rn, delta * (rn - 0.5 * delta))
    if kernel == "geman":
        return 0.5 * delta**2 * rn**2 / (delta**2 + rn**2)
    raise ValueError(f"unknown robust kernel {kernel!r}")


def _center(R, t):
    """Camera center c = -R^T t for one pose."""
    return -jnp.einsum("ji,j->i", R, t)


def _prior_residuals(poses: SE3, g: PoseGraph):
    """(pos_r (K, 3) or None, pose_r (K2, 6) or None)."""
    pos_r = pose_r = None
    if g.prior_idx is not None:
        Rk = poses.R[g.prior_idx]
        tk = poses.t[g.prior_idx]
        pos_r = jax.vmap(_center)(Rk, tk) - g.prior_xyz
    if g.prior_T_idx is not None:
        Tk = SE3(poses.R[g.prior_T_idx], poses.t[g.prior_T_idx])
        pose_r = g.prior_T.inverse().compose(Tk).log()
    return pos_r, pose_r


def _prior_cost(poses: SE3, g: PoseGraph, prior_delta, kernel: str):
    pos_r, pose_r = _prior_residuals(poses, g)
    cost = jnp.float32(0.0)
    if pos_r is not None:
        rn = jnp.linalg.norm(pos_r, axis=-1)
        cost = cost + jnp.sum(
            g.prior_weight * _robust_cost(rn, prior_delta, kernel))
    if pose_r is not None:
        rn = jnp.linalg.norm(pose_r, axis=-1)
        cost = cost + jnp.sum(
            g.prior_T_weight * _robust_cost(rn, prior_delta, kernel))
    return cost


def _prior_normal_blocks(poses: SE3, g: PoseGraph, prior_delta,
                         kernel: str):
    """Unary normal-equation blocks: list of (idx, Hk (K, 6, 6),
    gk (K, 6)) — one group per prior type present."""
    groups = []
    zeros = jnp.zeros(6)
    if g.prior_idx is not None:
        def res_pos(xi, R, t, xyz):
            T = SE3.exp(xi).compose(SE3(R, t))
            return _center(T.R, T.t) - xyz

        def one(R, t, xyz):
            r = res_pos(zeros, R, t, xyz)
            J = jax.jacfwd(res_pos)(zeros, R, t, xyz)
            return r, J

        r, J = jax.vmap(one)(poses.R[g.prior_idx], poses.t[g.prior_idx],
                             g.prior_xyz)
        w = g.prior_weight
        if prior_delta is not None:
            w = w * _robust_weight(jnp.linalg.norm(r, axis=-1),
                                   prior_delta, kernel)
        wv = w[:, None, None]
        groups.append((g.prior_idx,
                       jnp.einsum("eki,ekj->eij", J * wv, J),
                       jnp.einsum("eki,ek->ei", J * wv, r)))
    if g.prior_T_idx is not None:
        def res_T(xi, R, t, ZR, Zt):
            T = SE3.exp(xi).compose(SE3(R, t))
            return SE3(ZR, Zt).inverse().compose(T).log()

        def oneT(R, t, ZR, Zt):
            r = res_T(zeros, R, t, ZR, Zt)
            J = jax.jacfwd(res_T)(zeros, R, t, ZR, Zt)
            return r, J

        r, J = jax.vmap(oneT)(poses.R[g.prior_T_idx],
                              poses.t[g.prior_T_idx],
                              g.prior_T.R, g.prior_T.t)
        w = g.prior_T_weight
        if prior_delta is not None:
            w = w * _robust_weight(jnp.linalg.norm(r, axis=-1),
                                   prior_delta, kernel)
        wv = w[:, None, None]
        groups.append((g.prior_T_idx,
                       jnp.einsum("eki,ekj->eij", J * wv, J),
                       jnp.einsum("eki,ek->ei", J * wv, r)))
    return groups


def _graph_cost(poses: SE3, g: PoseGraph, delta, kernel: str,
                prior_delta=None):
    """sum_e edge_weight * rho(|r_e|) (+ prior terms) — cheap (residuals
    only, no Jacobian/Hessian assembly) and the correct LM acceptance
    criterion."""
    r = edge_residuals(poses, g)
    rn = jnp.linalg.norm(r, axis=-1)
    cost = jnp.sum(g.edge_weight * _robust_cost(rn, delta, kernel))
    if g.prior_idx is not None or g.prior_T_idx is not None:
        cost = cost + _prior_cost(poses, g, prior_delta, kernel)
    return cost


def _edge_normal_blocks(poses: SE3, g: PoseGraph, huber_delta: float | None,
                        kernel: str = "huber"):
    """Per-edge 6x6 normal-equation blocks (IRLS-weighted):
    (Hii, Hjj, Hij, gi, gj, w, r). Shared by the dense assembly and the
    matrix-free PCG path — the blocks ARE the Hessian; only what happens
    to them next differs (scatter into a dense (6N, 6N) vs gather/segment-sum
    matvecs)."""
    r, Ji, Jj = _edge_jacobians(poses, g)
    w = g.edge_weight
    if huber_delta is not None:
        rn = jnp.linalg.norm(r, axis=-1)
        w = w * _robust_weight(rn, huber_delta, kernel)
    wv = w[:, None, None]
    Hii = jnp.einsum("eki,ekj->eij", Ji * wv, Ji)
    Hjj = jnp.einsum("eki,ekj->eij", Jj * wv, Jj)
    Hij = jnp.einsum("eki,ekj->eij", Ji * wv, Jj)
    gi = jnp.einsum("eki,ek->ei", Ji * wv, r)
    gj = jnp.einsum("eki,ek->ei", Jj * wv, r)
    return Hii, Hjj, Hij, gi, gj, w, r


def _build_normal_eqs(poses: SE3, g: PoseGraph, huber_delta: float | None,
                      kernel: str = "huber", prior_delta=None):
    n = poses.R.shape[0]
    Hii, Hjj, Hij, gi, gj, w, r = _edge_normal_blocks(
        poses, g, huber_delta, kernel)
    H = jnp.zeros((n, 6, n, 6))
    H = H.at[g.edge_i, :, g.edge_i, :].add(Hii)
    H = H.at[g.edge_j, :, g.edge_j, :].add(Hjj)
    H = H.at[g.edge_i, :, g.edge_j, :].add(Hij)
    H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
    grad = jnp.zeros((n, 6)).at[g.edge_i].add(gi).at[g.edge_j].add(gj)
    for idx, Hk, gk in _prior_normal_blocks(poses, g, prior_delta, kernel):
        H = H.at[idx, :, idx, :].add(Hk)
        grad = grad.at[idx].add(gk)
    cost = 0.5 * jnp.sum(w * jnp.sum(r * r, -1))
    return H.reshape(6 * n, 6 * n), grad.reshape(6 * n), cost


def _pcg_normal_step(g: PoseGraph, poses: SE3, lam, huber_delta, kernel,
                     upd, pcg_iters: int, prior_delta=None):
    """One LM linearization solved matrix-free (component T15 at config-5
    scale): the damped gauge-masked normal equations
    ``(H + lam diag(H)) dx = -grad`` via block-Jacobi-preconditioned CG,
    never materializing the (6N, 6N) Hessian — at 10k+ keyframes
    (BASELINE.json:12) the dense matrix alone would be 14+ GB. Per matvec:
    two (E, 6) gathers of the trial vector, four (E, 6, 6)x(E, 6) batched
    block products, two segment-sum scatters back to poses — the same
    gather/segment-sum discipline as ba/schur.py, whose measured TPU costs
    (docs/PERFORMANCE.md "random access") this reuses. Fixed iteration
    count, stagnation-guarded alpha/beta (extra iterations are numeric
    no-ops), identical gauge semantics to the dense path (fixed poses ride
    an identity block, zero gradient)."""
    n = poses.R.shape[0]
    Hii, Hjj, Hij, gi, gj, _, _ = _edge_normal_blocks(
        poses, g, huber_delta, kernel)

    def seg(vals, idx):
        return jax.ops.segment_sum(vals, idx, num_segments=n)

    updc = upd[:, None]
    grad = (seg(gi, g.edge_i) + seg(gj, g.edge_j)) * updc      # (N, 6)
    D = seg(Hii, g.edge_i) + seg(Hjj, g.edge_j)                # (N, 6, 6)
    # Unary priors contribute only diagonal blocks: into D (the block-
    # Jacobi preconditioner) and, below, into the matvec's H x.
    prior_groups = _prior_normal_blocks(poses, g, prior_delta, kernel)
    for idx, Hk, gk in prior_groups:
        D = D + seg(Hk, idx)
        grad = grad + seg(gk, idx) * updc
    d = jnp.diagonal(D, axis1=-2, axis2=-1)                    # (N, 6)
    damp = lam * d + 1e-10
    # Block-Jacobi preconditioner = the damped diagonal blocks of the
    # gauge-masked system (identity on fixed poses, as in the dense path).
    eye6 = jnp.eye(6, dtype=D.dtype)
    Dd = D + jax.vmap(jnp.diag)(damp)
    Dd = jnp.where(upd[:, None, None] > 0, Dd, eye6)
    Minv = jnp.linalg.inv(Dd)

    def matvec(x):                                             # x: (N, 6)
        xm = x * updc
        xi = xm[g.edge_i]
        xj = xm[g.edge_j]
        yi = (jnp.einsum("eij,ej->ei", Hii, xi)
              + jnp.einsum("eij,ej->ei", Hij, xj))
        yj = (jnp.einsum("eji,ej->ei", Hij, xi)
              + jnp.einsum("eij,ej->ei", Hjj, xj))
        y = seg(yi, g.edge_i) + seg(yj, g.edge_j) + damp * xm
        for idx, Hk, _gk in prior_groups:
            y = y + seg(jnp.einsum("eij,ej->ei", Hk, xm[idx]), idx)
        return y * updc + (1.0 - updc) * x

    def precond(r):
        return jnp.einsum("nij,nj->ni", Minv, r)

    r0 = -grad
    z0 = precond(r0)

    def body(_, state):
        x, r, z, p, rz = state
        Hp = matvec(p)
        pHp = jnp.sum(p * Hp)
        alpha = jnp.where(jnp.abs(pHp) < 1e-20, 0.0,
                          rz / jnp.where(jnp.abs(pHp) < 1e-20, 1.0, pHp))
        x = x + alpha * p
        r = r - alpha * Hp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) < 1e-20, 0.0,
                         rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1.0, rz))
        return x, r, z, p * beta + z, rz_new

    dx, *_ = jax.lax.fori_loop(
        0, pcg_iters, body,
        (jnp.zeros_like(r0), r0, z0, z0, jnp.sum(r0 * z0)))
    return dx


class PGOResult(NamedTuple):
    poses: SE3
    cost0: jnp.ndarray
    cost: jnp.ndarray
    iters: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iters", "huber_delta_static", "kernel",
                                   "solver", "pcg_iters", "prior_delta"))
def pgo_solve(
    g: PoseGraph,
    max_iters: int = 30,
    lam0: float = 1e-4,
    huber_delta_static: float | None = None,
    kernel: str = "huber",
    rtol: float = 1e-8,
    solver: str = "dense",
    pcg_iters: int = 64,
    prior_delta: float | None = None,
) -> PGOResult:
    """LM on the pose graph. ``solver="dense"`` (default): one damped
    Cholesky factorization of the full (6N, 6N) system per iteration —
    MXU-friendly and fastest up to ~1-2k poses (config 4). ``solver="pcg"``:
    matrix-free block-Jacobi PCG (``_pcg_normal_step``) — O(E) memory, the
    only option at config-5 scale (10k+ keyframes, BASELINE.json:12) where
    the dense Hessian would be 14+ GB.

    ``prior_delta``: robust-kernel width for the unary prior factors
    (PoseGraph prior_* fields) in their own units — meters for position
    priors; None = quadratic (trust every prior). A redescending kernel
    here is the GPS-outlier defense."""
    if solver not in ("dense", "pcg"):
        raise ValueError(f"unknown solver {solver!r}")
    n = g.poses.R.shape[0]
    upd = (g.pose_mask & ~g.fixed).astype(jnp.float32)
    upd6 = jnp.repeat(upd, 6)

    def cost_of(R, t):
        return _graph_cost(SE3(R, t), g, huber_delta_static, kernel,
                           prior_delta)

    cost0 = cost_of(g.poses.R, g.poses.t)

    def dense_step(poses, lam):
        H, grad, _ = _build_normal_eqs(poses, g, huber_delta_static, kernel,
                                       prior_delta)
        # Gauge: zero out fixed rows/cols, identity on their diagonal.
        H = H * upd6[:, None] * upd6[None, :] + jnp.diag(1.0 - upd6)
        grad = grad * upd6
        d = jnp.diagonal(H)
        Hd = H + jnp.diag(lam * d + 1e-10)
        L = jnp.linalg.cholesky(Hd)
        return -jax.scipy.linalg.cho_solve((L, True), grad).reshape(n, 6)

    def body(state):
        R, t, lam, cost, it, done = state
        if solver == "dense":
            dx = dense_step(SE3(R, t), lam)
        else:
            dx = _pcg_normal_step(g, SE3(R, t), lam, huber_delta_static,
                                  kernel, upd, pcg_iters, prior_delta)
        bad = jnp.any(jnp.isnan(dx))
        dx = jnp.where(bad, 0.0, dx) * upd[:, None]
        newp = jax.vmap(lambda tw, R_, t_: SE3.exp(tw).compose(SE3(R_, t_)))(dx, R, t)
        new_cost = cost_of(newp.R, newp.t)
        accept = (new_cost < cost) & ~bad
        R = jnp.where(accept, newp.R, R)
        t = jnp.where(accept, newp.t, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-10, 1e8)
        rel = jnp.abs(cost - new_cost) / jnp.maximum(cost, 1e-15)
        done = accept & (rel < rtol)
        return R, t, lam, jnp.where(accept, new_cost, cost), it + 1, done

    def cond(state):
        return (state[4] < max_iters) & ~state[5]

    R, t, _, cost, it, _ = jax.lax.while_loop(
        cond,
        body,
        (g.poses.R, g.poses.t, jnp.float32(lam0), cost0, jnp.int32(0), jnp.bool_(False)),
    )
    return PGOResult(poses=SE3(R, t), cost0=cost0, cost=cost, iters=it)


def pgo_solve_hierarchical(
    g: PoseGraph,
    segment_len: int = 250,
    coarse_max_iters: int = 40,
    polish_max_iters: int = 10,
    pcg_iters: int = 80,
    huber_delta_static: float | None = None,
    kernel: str = "huber",
) -> PGOResult:
    """Coarse-to-fine LM for LONG chain-backbone graphs (config-5 scale).

    Block-Jacobi PCG moves information ~one edge per inner iteration, so
    on a 10k-pose odometry chain the loop-closure corrections — pure
    long-wavelength drift modes — are invisible to ``pgo_solve``'s
    budgeted inner solves: measured on the 10k circle, 20 LM x 200 PCG
    drops the cost 36 -> 0.05 while ATE stays at 8.2 of 8.5 (the drift
    never propagates around the ring). The classical answer is hierarchy
    (HOG-Man/condensed-graph style), which maps to TPU well:

    1. **Condense the chain**: cumulative odometry products C_k (host
       f64 bookkeeping — f32 drifts over 10k products) give exact
       composed measurements between anchors (every ``segment_len``-th
       pose plus every closure endpoint), and transport closure edges
       to their anchors: Z'_(a_i, a_j) = D_i^-1 Z_ij D_j with
       D_k = C_k C_(a_k)^-1.
    2. **Solve the anchor graph densely** — tens of nodes, one damped
       Cholesky per LM iteration on the MXU (the regime pgo_solve's
       dense path is built for). Composed chain edges carry weight
       w / L (an L-fold composition has ~L-fold variance).
    3. **Interpolate the correction**: per-anchor left-deltas
       D_m = T_new T_old^-1, geodesically blended along each segment
       (vmapped exp/log), applied to every pose.
    4. **Polish** with the flat matrix-free PCG LM — the remaining
       error is local, exactly what block-Jacobi PCG is good at.

    Requires a live chain backbone: a (k, k-1) edge for every live k.
    """
    import numpy as np

    n = int(np.asarray(g.pose_mask).sum())
    ei = np.asarray(g.edge_i)
    ej = np.asarray(g.edge_j)
    ew = np.asarray(g.edge_weight)
    live_e = ew > 0
    chain = live_e & (ei == ej + 1) & (ei < n)
    chain_of = -np.ones(n, np.int64)
    chain_of[ei[chain]] = np.where(chain)[0]
    if n > 1 and (chain_of[1:n] < 0).any():
        missing = int(np.where(chain_of[1:n] < 0)[0][0]) + 1
        raise ValueError(
            f"hierarchical solve needs a full odometry chain; no live "
            f"(k, k-1) edge for k={missing}")
    closure = live_e & ~chain & (ei < n) & (ej < n)

    # 1. cumulative odometry C_k = Z_k ... Z_1 (C_0 = I), host f64.
    ZR = np.asarray(g.Z.R, np.float64)
    Zt = np.asarray(g.Z.t, np.float64)
    C_R = np.zeros((n, 3, 3))
    C_t = np.zeros((n, 3))
    C_R[0] = np.eye(3)
    for k in range(1, n):
        e = chain_of[k]
        C_R[k] = ZR[e] @ C_R[k - 1]
        C_t[k] = ZR[e] @ C_t[k - 1] + Zt[e]

    anchors = np.unique(np.concatenate([
        np.arange(0, n, segment_len), [n - 1],
        ei[closure], ej[closure]])).astype(np.int64)
    M = len(anchors)
    seg_of = np.searchsorted(anchors, np.arange(n), side="right") - 1
    a_idx = -np.ones(n, np.int64)
    a_idx[anchors] = np.arange(M)

    def rel(Ra, ta, Rb, tb):
        """T_a T_b^-1 on (R, t) pairs (f64)."""
        R = Ra @ Rb.T
        return R, ta - R @ tb

    cei, cej, cR, ct, cw = [], [], [], [], []
    w_chain = float(ew[chain].mean()) if chain.any() else 1.0
    for m in range(1, M):
        a, b = anchors[m], anchors[m - 1]
        R, t = rel(C_R[a], C_t[a], C_R[b], C_t[b])
        cei.append(m)
        cej.append(m - 1)
        cR.append(R)
        ct.append(t)
        cw.append(w_chain / max(int(a - b), 1))
    for e in np.where(closure)[0]:
        i, j = int(ei[e]), int(ej[e])
        ai, aj = anchors[seg_of[i]], anchors[seg_of[j]]
        DiR, Dit = rel(C_R[i], C_t[i], C_R[ai], C_t[ai])
        DjR, Djt = rel(C_R[j], C_t[j], C_R[aj], C_t[aj])
        R1 = DiR.T @ ZR[e]                 # Z' = Di^-1 Z Dj
        t1 = DiR.T @ (Zt[e] - Dit)
        cei.append(int(a_idx[ai]))
        cej.append(int(a_idx[aj]))
        cR.append(R1 @ DjR)
        ct.append(R1 @ Djt + t1)
        cw.append(float(ew[e]))

    R_old = np.asarray(g.poses.R, np.float64)[:n]
    t_old = np.asarray(g.poses.t, np.float64)[:n]
    coarse = PoseGraph(
        poses=SE3(jnp.asarray(R_old[anchors].astype(np.float32)),
                  jnp.asarray(t_old[anchors].astype(np.float32))),
        edge_i=jnp.asarray(np.asarray(cei, np.int32)),
        edge_j=jnp.asarray(np.asarray(cej, np.int32)),
        Z=SE3(jnp.asarray(np.stack(cR).astype(np.float32)),
              jnp.asarray(np.stack(ct).astype(np.float32))),
        edge_weight=jnp.asarray(np.asarray(cw, np.float32)),
        pose_mask=jnp.ones(M, bool),
        fixed=jnp.asarray(np.asarray(g.fixed)[anchors]),
    )
    if not bool(np.asarray(coarse.fixed).any()):
        coarse = coarse._replace(fixed=jnp.asarray(np.arange(M) == 0))

    cost0 = _graph_cost(g.poses, g, huber_delta_static, kernel, None)

    # 2. small dense solve on the anchor graph
    cres = pgo_solve(coarse, max_iters=coarse_max_iters, solver="dense",
                     huber_delta_static=huber_delta_static, kernel=kernel)

    # 3. per-anchor left-deltas, geodesically interpolated along segments
    T_old_a = SE3(jnp.asarray(R_old[anchors].astype(np.float32)),
                  jnp.asarray(t_old[anchors].astype(np.float32)))
    D = cres.poses.compose(T_old_a.inverse())          # (M,) SE3
    seg = jnp.asarray(seg_of)
    nxt = jnp.minimum(seg + 1, M - 1)
    a0 = jnp.asarray(anchors)[seg]
    a1 = jnp.asarray(anchors)[nxt]
    frac = jnp.where(a1 > a0,
                     (jnp.arange(n) - a0) / jnp.maximum(a1 - a0, 1), 0.0)
    R_old32 = jnp.asarray(R_old.astype(np.float32))
    t_old32 = jnp.asarray(t_old.astype(np.float32))

    def correct(k):
        Dm = SE3(D.R[seg[k]], D.t[seg[k]])
        Dn = SE3(D.R[nxt[k]], D.t[nxt[k]])
        step = Dn.compose(Dm.inverse()).log()
        delta = SE3.exp(frac[k] * step).compose(Dm)
        return delta.compose(SE3(R_old32[k], t_old32[k]))

    T_new = jax.vmap(correct)(jnp.arange(n))
    R_full = jnp.asarray(np.asarray(g.poses.R)).at[:n].set(T_new.R)
    t_full = jnp.asarray(np.asarray(g.poses.t)).at[:n].set(T_new.t)

    # 4. polish with the flat PCG LM
    res = pgo_solve(g._replace(poses=SE3(R_full, t_full)),
                    max_iters=polish_max_iters, solver="pcg",
                    pcg_iters=pcg_iters,
                    huber_delta_static=huber_delta_static, kernel=kernel)
    return PGOResult(poses=res.poses, cost0=cost0, cost=res.cost,
                     iters=cres.iters + res.iters)
