"""Global rotation + translation averaging over a view graph.

The global-SfM family (companion to the incremental pipeline,
BASELINE.json config 3): instead of chaining two-view poses frame by
frame, estimate ALL camera rotations at once from pairwise relative
rotations, then all camera centers from pairwise translation
directions, then triangulate and bundle-adjust. Drift does not
accumulate along the sequence — every loop edge constrains the solution
from the start — and the whole solve is a batch problem, which is
exactly what a TPU wants:

- every edge residual is computed in one (E, ...) batch (VPU),
- the normal equations are never materialized: both solvers run
  matrix-free conjugate gradients whose matvec is two gathers, one
  batched 3x3 product, and two segment-sums over the edge list —
  the same sparsity discipline as ba/schur.py,
- robustness is IRLS (Huber) re-weighting between GN steps, so the
  whole solve is fixed-shape `lax.fori_loop`s: no data-dependent
  control flow anywhere.

Rotation averaging is the Lie-algebra Gauss-Newton iteration
(Govindu-style): with world->camera rotations ``R_i`` and measured
relative rotations ``R_ij = R_j R_i^T`` (camera i -> camera j), the
per-edge error ``E_ij = R_ij R_i R_j^T`` should be identity. Updating
``R_k <- Exp(d_k) R_k`` gives, to first order,
``Log(E'_ij) = r_ij + R_ij d_i - d_j`` with ``r_ij = Log(E_ij)``, so
each outer iteration solves the linear least squares

    min_d  sum_e w_e || d_j - R_ij d_i - r_e ||^2        (gauge: d_0 = 0)

by CG on the (projected) normal operator, then retracts.

Translation averaging: an edge measures the world-frame DIRECTION of
``C_i - C_j`` (``t_ij = R_j (C_i - C_j)``, so ``d_e = R_j^T t_ij /
|t_ij|``). The scale-free objective is the perpendicular violation

    min_C  sum_e w_e || P_e (C_i - C_j) ||^2,   P_e = I - d_e d_e^T,

whose minimizer ray (gauge C_0 = 0) is the null space of the PSD
normal operator N — i.e. the smallest eigenvector. That is found
matrix-free by shifted inverse power iteration, each step a CG solve
of ``(N + sigma I) y = x`` (the matvec is two gathers, one projection,
two segment-sums), with IRLS Huber reweighting between rounds for
outlier directions. A final LUD alternation (per-edge scales under the
sum constraint ``sum s_e = E``) polishes with the full residual.

Why not plain LUD alternation from scratch: starting from C = 0 the
first solve lands in the "every edge has length ~1" valley, and the
scale update cannot escape it (measured: center RMSE 10.6 on a
scale-2.9 scene; the spectral init gets 1e-3). The eigen-ray is
scale/sign-ambiguous; sign is fixed by majority vote of the edge
projections, scale is the caller's gauge anyway.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SO3


class ViewGraph(NamedTuple):
    """Pairwise relative-pose measurements.

    edge_i, edge_j: (E,) int32 frame indices (i < j by convention).
    R_ij: (E, 3, 3) relative rotation, ``x_cj = R_ij x_ci + t_ij``
      (i.e. ``R_ij = R_j R_i^T`` for world->camera frames) — exactly what
      geometry/ransac.ransac_essential returns for (x1=i, x2=j).
    t_ij: (E, 3) unit translation direction in camera-j coordinates
      (cheirality-resolved sign, from the essential decomposition).
    weight: (E,) f32 edge confidence (e.g. RANSAC inlier count).
    mask: (E,) bool valid edges (padding rows carry False).
    """

    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    R_ij: jnp.ndarray
    t_ij: jnp.ndarray
    weight: jnp.ndarray
    mask: jnp.ndarray


def spanning_tree_rotations(edge_i, edge_j, R_ij, weight, mask,
                            n_frames: int) -> np.ndarray:
    """Host-side init: propagate rotations over a max-weight spanning tree.

    BFS from frame 0 following edges in descending weight order. Frames
    unreachable from frame 0 stay at identity (the averaging itself only
    moves frames touched by valid edges, so they remain identity there
    too — callers should drop disconnected frames from the output).
    """
    edge_i = np.asarray(edge_i)
    edge_j = np.asarray(edge_j)
    R_ij = np.asarray(R_ij)
    order = np.argsort(-np.where(np.asarray(mask), np.asarray(weight), -1.0))
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n_frames)]
    for e in order:
        if not mask[e]:
            continue
        adj[int(edge_i[e])].append((int(edge_j[e]), e))
        adj[int(edge_j[e])].append((int(edge_i[e]), e))
    R = np.tile(np.eye(3, dtype=np.float32), (n_frames, 1, 1))
    seen = np.zeros(n_frames, bool)
    seen[0] = True
    stack = [0]
    while stack:
        u = stack.pop()
        for v, e in adj[u]:
            if seen[v]:
                continue
            seen[v] = True
            if int(edge_i[e]) == u:     # R_j = R_ij R_i
                R[v] = R_ij[e] @ R[u]
            else:                       # R_i = R_ij^T R_j
                R[v] = R_ij[e].T @ R[u]
            stack.append(v)
    return R


def _huber_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel: 1 inside, delta/|r| outside."""
    return jnp.minimum(1.0, delta / jnp.maximum(r_norm, 1e-12))


def _cg(matvec, b, iters: int, eps: float = 1e-12):
    """Plain conjugate gradients, fixed iteration count, (F, 3) unknowns."""

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), eps)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, eps)) * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.sum(b * b))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@partial(jax.jit, static_argnames=("n_frames", "iters", "cg_iters"))
def rotation_averaging(
    g: ViewGraph,
    n_frames: int,
    R0: jnp.ndarray,
    iters: int = 15,
    cg_iters: int = 30,
    huber_delta: float = 0.1,
    lam: float = 1e-6,
) -> jnp.ndarray:
    """IRLS Gauss-Newton rotation averaging. Returns (F, 3, 3) rotations.

    R0: (F, 3, 3) initialization (spanning_tree_rotations). Gauge: frame 0
    is held fixed at R0[0]. ``huber_delta`` is the robust width in radians
    of relative-rotation error; ``lam`` is a small Tikhonov term keeping CG
    well-posed on weakly connected graphs.
    """
    ei, ej = g.edge_i, g.edge_j
    w_edge = g.weight * g.mask.astype(jnp.float32)
    # Gauge + connectivity projection: only frames touched by a valid edge
    # move, and frame 0 never does.
    touched = (
        jnp.zeros(n_frames, jnp.float32)
        .at[ei].add(g.mask.astype(jnp.float32))
        .at[ej].add(g.mask.astype(jnp.float32))
    )
    upd = ((touched > 0).astype(jnp.float32)).at[0].set(0.0)[:, None]

    def outer(_, R):
        E = jnp.einsum("eab,ebc,edc->ead", g.R_ij, R[ei], R[ej])
        r = SO3.log(E)                                     # (E, 3)
        w = (w_edge * _huber_weight(jnp.linalg.norm(r, axis=-1),
                                    huber_delta))[:, None]

        def matvec(v):
            v = v * upd
            u = w * (v[ej] - jnp.einsum("eab,eb->ea", g.R_ij, v[ei]))
            out = (
                jnp.zeros((n_frames, 3), v.dtype)
                .at[ej].add(u)
                .at[ei].add(-jnp.einsum("eba,eb->ea", g.R_ij, u))
            )
            return out * upd + lam * v

        wr = w * r
        b = (
            jnp.zeros((n_frames, 3), r.dtype)
            .at[ej].add(wr)
            .at[ei].add(-jnp.einsum("eba,eb->ea", g.R_ij, wr))
        ) * upd
        delta = _cg(matvec, b, cg_iters) * upd
        return jnp.einsum("fab,fbc->fac", SO3.exp(delta), R)

    return jax.lax.fori_loop(0, iters, outer, R0.astype(jnp.float32))


@jax.jit
def filter_edges_by_rotation(g: ViewGraph, R: jnp.ndarray,
                             max_err_rad: float = 0.09) -> ViewGraph:
    """Drop edges inconsistent with the averaged rotations (1DSfM-style).

    An edge whose relative rotation disagrees with the global solution is
    almost always an outlier two-view estimate — its translation direction
    is poison for translation averaging (measured on the synthetic
    30-frame graph with 10% outlier edges: center RMSE 1.30 -> 0.03 after
    this filter). Returns the graph with those edges' mask cleared.
    """
    E = jnp.einsum("eab,ebc,edc->ead", g.R_ij, R[g.edge_i], R[g.edge_j])
    err = jnp.linalg.norm(SO3.log(E), axis=-1)
    return g._replace(mask=g.mask & (err < max_err_rad))


@partial(jax.jit,
         static_argnames=("n_frames", "irls_iters", "power_iters",
                          "cg_iters", "refine_iters"))
def translation_averaging(
    g: ViewGraph,
    R: jnp.ndarray,
    n_frames: int,
    irls_iters: int = 5,
    power_iters: int = 4,
    cg_iters: int = 50,
    refine_iters: int = 5,
    huber_delta: float = 0.1,
    sigma: float = 1e-2,
    s_floor: float = 0.05,
) -> jnp.ndarray:
    """Spectral + LUD translation averaging. Returns camera centers (F, 3).

    R: (F, 3, 3) global rotations from rotation_averaging. Gauge:
    C_0 = 0; output is normalized to unit RMS center norm (monocular
    scale is arbitrary — callers renormalize as they like). ``sigma`` is
    the inverse-iteration shift (relative to the mean edge weight);
    ``huber_delta`` the IRLS width as a fraction of edge length;
    ``s_floor`` keeps LUD edge scales from crossing zero (a negative
    scale would silently flip the measured direction).
    """
    ei, ej = g.edge_i, g.edge_j
    maskf = g.mask.astype(jnp.float32)
    # Normalize weights to O(1) so sigma and CG behavior are predictable.
    w_edge = g.weight * maskf
    w_edge = w_edge / jnp.maximum(jnp.sum(w_edge) /
                                  jnp.maximum(jnp.sum(maskf), 1.0), 1e-12)
    # World-frame direction of (C_i - C_j): t_ij = R_j (C_i - C_j).
    d = jnp.einsum("eba,eb->ea", R[ej], g.t_ij)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    touched = (
        jnp.zeros(n_frames, jnp.float32).at[ei].add(maskf).at[ej].add(maskf)
    )
    upd = ((touched > 0).astype(jnp.float32)).at[0].set(0.0)[:, None]

    def perp_matvec(w):
        def mv(v):
            v = v * upd
            u = v[ei] - v[ej]
            u = w * (u - d * jnp.sum(d * u, axis=-1, keepdims=True))
            out = (
                jnp.zeros((n_frames, 3), v.dtype).at[ei].add(u).at[ej].add(-u)
            )
            return out * upd + sigma * v
        return mv

    def fix_sign_scale(C):
        # Majority sign of edge projections, then unit RMS norm.
        proj = jnp.sum((C[ei] - C[ej]) * d, axis=-1) * w_edge
        C = C * jnp.sign(jnp.sum(proj) + 1e-30)
        rms = jnp.sqrt(jnp.maximum(jnp.sum(C * C) / n_frames, 1e-18))
        return C / rms

    # --- stage 1: IRLS spectral solve of the perpendicular objective ----
    def irls_round(_, C):
        diff = C[ei] - C[ej]
        ln = jnp.linalg.norm(diff, axis=-1)
        perp = diff - d * jnp.sum(d * diff, axis=-1, keepdims=True)
        w = (w_edge * _huber_weight(
            jnp.linalg.norm(perp, axis=-1),
            huber_delta * jnp.maximum(ln, 1e-6)))[:, None]
        mv = perp_matvec(w)

        def power(_, x):
            y = _cg(mv, x * upd, cg_iters)
            rms = jnp.sqrt(jnp.maximum(jnp.sum(y * y), 1e-30))
            return y / rms

        return fix_sign_scale(jax.lax.fori_loop(0, power_iters, power, C))

    # Deterministic non-degenerate start: spread along an arbitrary ramp.
    C0 = fix_sign_scale(
        (jnp.arange(n_frames, dtype=jnp.float32)[:, None]
         * jnp.array([[1.0, 0.7, -0.4]], jnp.float32)
         + jnp.arange(n_frames, dtype=jnp.float32)[:, None] ** 2
         * jnp.array([[0.01, -0.02, 0.03]], jnp.float32)) * upd)
    C = jax.lax.fori_loop(0, irls_iters, irls_round, C0)

    # --- stage 2: LUD polish (per-edge scales, sum constraint) ----------
    n_valid = jnp.maximum(jnp.sum(maskf), 1.0)
    w_safe = jnp.where(g.mask, jnp.maximum(w_edge, 1e-6), 1.0)

    def lud_round(_, C):
        diff = C[ei] - C[ej]
        p = jnp.where(g.mask, jnp.sum(diff * d, axis=-1), 0.0)
        mu = (n_valid - jnp.sum(p)) / jnp.sum(
            jnp.where(g.mask, 1.0 / w_safe, 0.0))
        s = jnp.maximum(p + mu / w_safe, s_floor)
        rho = diff - s[:, None] * d
        w = (w_edge * _huber_weight(
            jnp.linalg.norm(rho, axis=-1),
            huber_delta * jnp.maximum(s, 1e-6)))[:, None]

        def matvec(v):
            v = v * upd
            u = w * (v[ei] - v[ej])
            out = (
                jnp.zeros((n_frames, 3), v.dtype).at[ei].add(u).at[ej].add(-u)
            )
            return out * upd + 1e-6 * v

        sd = w * (s[:, None] * d)
        b = (
            jnp.zeros((n_frames, 3), C.dtype).at[ei].add(sd).at[ej].add(-sd)
        ) * upd
        rhs = b - matvec(C)
        return C + _cg(matvec, rhs, cg_iters) * upd

    # Rescale to the LUD gauge (mean edge scale 1) before polishing.
    proj = jnp.sum((C[ei] - C[ej]) * d, axis=-1) * maskf
    C = C * n_valid / jnp.maximum(jnp.sum(proj), 1e-12)
    C = jax.lax.fori_loop(0, refine_iters, lud_round, C)
    return fix_sign_scale(C)
