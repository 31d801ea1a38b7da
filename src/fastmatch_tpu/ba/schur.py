"""Schur-complement reduced camera system, matrix-free (components T13/T14).

The camera-point Hessian is sparse; TPUs want dense tiles. This module keeps
everything in *block form* — per-camera 6x6, per-point 3x3, per-observation
6x3 coupling blocks — and exposes the reduced system

    S = (H_cc + lam*I) - H_cp (H_pp + lam*I)^-1 H_pc

only through its matrix-vector product: two segment-sums over the observation
table and one batched 3x3 solve per application. PCG with a block-Jacobi
(per-camera 6x6 inverse) preconditioner solves S dx_c = rhs without ever
materializing S (fill-in between cameras sharing points never exists).

All reductions are jax.ops.segment_sum with static segment counts —
deterministic on TPU (SURVEY.md §8.2 "determinism").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SE3, hat


def _project(p):
    z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-9, 1e-9, p[..., 2:3])
    return p[..., :2] / z


def residuals_and_jacobians(poses: SE3, points, obs, huber_delta: float | None = None):
    """Per-observation residuals and analytic Jacobians.

    Returns (res (O, 2), Jc (O, 2, 6), Jp (O, 2, 3), w (O,)) where w folds
    the validity mask and (optionally) Huber IRLS weights. Twist layout is
    [v, omega] matching core.lie.
    """
    Rc = _gather_rows(poses.R, obs.cam_idx)  # (O, 3, 3)
    tc = _gather_rows(poses.t, obs.cam_idx)
    X = _gather_rows(points, obs.pt_idx)  # (O, 3)
    p = jnp.einsum("oij,oj->oi", Rc, X) + tc
    res = _project(p) - obs.uv  # (O, 2)
    z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
    iz = 1.0 / z
    zeros = jnp.zeros_like(iz)
    Jproj = jnp.stack(
        [
            jnp.stack([iz, zeros, -p[:, 0] * iz * iz], -1),
            jnp.stack([zeros, iz, -p[:, 1] * iz * iz], -1),
        ],
        -2,
    )  # (O, 2, 3) d(res)/d(p_cam)
    # Camera (left-multiplicative twist on world->cam pose): dp/dxi = [I | -hat(p)]
    eye = jnp.broadcast_to(jnp.eye(3), (p.shape[0], 3, 3))
    Jc = Jproj @ jnp.concatenate([eye, -hat(p)], axis=-1)  # (O, 2, 6)
    # Point: dp/dX = R
    Jp = Jproj @ Rc  # (O, 2, 3)
    w = obs.mask.astype(jnp.float32)
    # Cheirality: observations that went behind the camera get zero weight
    # for this iteration instead of exploding.
    w = w * (p[:, 2] > 1e-6)
    if huber_delta is not None:
        rn = jnp.linalg.norm(res, axis=-1)
        w = w * jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
    return res, Jc, Jp, w


class BlockSystem(NamedTuple):
    """Block normal equations assembled from one linearization."""

    Hcc: jnp.ndarray  # (C, 6, 6)
    Hpp: jnp.ndarray  # (P, 3, 3)
    Wcp: jnp.ndarray  # (O, 6, 3) per-observation coupling J_c^T J_p (weighted)
    gc: jnp.ndarray   # (C, 6)   -J_c^T r
    gp: jnp.ndarray   # (P, 3)   -J_p^T r
    Jc: jnp.ndarray
    Jp: jnp.ndarray
    w: jnp.ndarray


def _pallas_ok(n_rows: int, n_target: int, sorted_keys: bool) -> bool:
    """Gate for the sorted-segment Pallas kernels (kernels/segment_ops.py):
    TPU backend, 1024-divisible row count, and a 1024-divisible (or small)
    target table. The windowed multi-tile path (n_target > 1024) derives
    per-chunk tile ranges from chunk-endpoint keys and is therefore correct
    ONLY for keys sorted ascending — ba_solve sorts the observation table by
    pt_idx, so pt-keyed reductions qualify while cam-keyed ones (Hcc, gc,
    wc) must declare sorted_keys=False and are admitted only to the
    order-free full-window path (n_target <= 1024)."""
    if n_target > 1024 and not sorted_keys:
        return False
    return (jax.default_backend() == "tpu"
            and n_rows % 1024 == 0
            and (n_target <= 1024 or n_target % 1024 == 0))


def _seg_sum(vals, idx, n, axis_name, sorted_keys=False):
    """segment_sum with the Pallas sorted/one-hot path on TPU.

    ``sorted_keys``: caller's promise that ``idx`` is sorted ascending;
    required for the windowed kernel path when n > 1024 (see _pallas_ok).
    """
    shape = vals.shape
    if _pallas_ok(shape[0], n, sorted_keys):
        from fastmatch_tpu.kernels.segment_ops import sorted_segment_sum

        flat = vals.reshape(shape[0], -1)
        out = sorted_segment_sum(flat, idx, n).reshape((n,) + shape[1:])
    else:
        out = jax.ops.segment_sum(vals, idx, num_segments=n)
    return _psum(out, axis_name)


def _gather_rows(table, idx):
    """table[idx]. Stays on the XLA gather: the Pallas windowed one-hot
    alternative (kernels/segment_ops.sorted_gather_rows) measured 1.9 ms vs
    XLA's 1.4 ms at BA scale — the dense one-hot build costs ~2 KB of VREG
    traffic per observation against the gather's 72 B of HBM, and sorted
    locality can't close a 30x constant. Kept as a helper so the choice is
    one line to revisit."""
    return table[idx]


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def assemble(poses, points, obs, n_cams, n_points, huber_delta=None,
             axis_name=None):
    """Assemble block normal equations from the (possibly sharded)
    observation table. With ``axis_name`` set (inside shard_map over an
    observation shard per device), per-camera/per-point partial sums are
    psum-reduced over the mesh axis — the distributed-BA path (T18):
    observations partition across devices, camera/point blocks are global.
    """
    res, Jc, Jp, w = residuals_and_jacobians(poses, points, obs, huber_delta)
    wv = w[:, None, None]
    Hcc = _seg_sum(
        jnp.einsum("oki,okj->oij", Jc * wv, Jc), obs.cam_idx, n_cams, axis_name)
    Hpp = _seg_sum(
        jnp.einsum("oki,okj->oij", Jp * wv, Jp), obs.pt_idx, n_points, axis_name,
        sorted_keys=True)
    Wcp = jnp.einsum("oki,okj->oij", Jc * wv, Jp)  # (O_local, 6, 3) stays sharded
    gc = -_seg_sum(
        jnp.einsum("oki,ok->oi", Jc * wv, res), obs.cam_idx, n_cams, axis_name)
    gp = -_seg_sum(
        jnp.einsum("oki,ok->oi", Jp * wv, res), obs.pt_idx, n_points, axis_name,
        sorted_keys=True)
    cost = _psum(0.5 * jnp.sum(w * jnp.sum(res * res, -1)), axis_name)
    return BlockSystem(Hcc, Hpp, Wcp, gc, gp, Jc, Jp, w), cost


def _damped(H, lam):
    """Levenberg damping: H + lam * diag(H) + eps*I (scale-invariant)."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    eye = jnp.eye(H.shape[-1])
    return H + (lam * d + 1e-8)[..., None, :] * eye


def inv3x3(H):
    """Batched closed-form (cofactor) 3x3 inverse.

    ~5x faster than jnp.linalg.solve's LU on TPU for the (P, 3, 3) point
    blocks (measured 17ms -> 3.2ms at P=16k on v5e), and the blocks are
    damped SPD so the determinant is bounded away from zero.
    """
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hc = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv = jnp.stack(
        [jnp.stack([A, B, C], -1), jnp.stack([D, E, F], -1), jnp.stack([G, Hc, I], -1)],
        -2,
    )
    return inv / det[..., None, None]


def damped_pp_inverse(sys: BlockSystem, lam):
    """(H_pp + lam diag)^-1, closed form. Constant for a fixed (sys, lam):
    callers hoist it outside the PCG loop (one inverse per LM iteration
    instead of one LU per matvec — the dominant BA cost before this)."""
    return inv3x3(_damped(sys.Hpp, lam))


def schur_matvec(sys: BlockSystem, obs, lam, x, n_points, cam_update_mask,
                 axis_name=None, Hpp_inv=None):
    """S @ x for the reduced camera system; x: (C, 6) flattened blocks.

    cam_update_mask zeroes rows/cols of fixed (gauge) cameras so they stay
    put without changing the system's conditioning for the rest. With
    ``axis_name``, the two coupling segment-sums reduce over observation
    shards (psum on ICI) — x, Hcc, Hpp replicated, Wcp sharded.
    Pass ``Hpp_inv = damped_pp_inverse(sys, lam)`` to reuse the point-block
    inverse across matvecs (pcg_solve does).
    """
    x = x * cam_update_mask[:, None]
    if Hpp_inv is None:
        Hpp_inv = damped_pp_inverse(sys, lam)
    # y_p = sum_o W_cp(o)^T x[cam_o]
    yo = jnp.einsum("oij,oi->oj", sys.Wcp, _gather_rows(x, obs.cam_idx))  # (O, 3)
    yp = _seg_sum(yo, obs.pt_idx, n_points, axis_name, sorted_keys=True)
    zp = jnp.einsum("pij,pj->pi", Hpp_inv, yp)  # (P, 3)
    # w_c = sum_o W_cp(o) z[pt_o]
    wo = jnp.einsum("oij,oj->oi", sys.Wcp, _gather_rows(zp, obs.pt_idx))  # (O, 6)
    wc = _seg_sum(wo, obs.cam_idx, x.shape[0], axis_name)
    Sx = jnp.einsum("cij,cj->ci", _damped(sys.Hcc, lam), x) - wc
    return Sx * cam_update_mask[:, None]


def reduced_rhs(sys: BlockSystem, obs, lam, n_points, cam_update_mask,
                axis_name=None, Hpp_inv=None):
    """rhs = gc - H_cp (H_pp+lam)^-1 gp."""
    if Hpp_inv is None:
        Hpp_inv = damped_pp_inverse(sys, lam)
    zp = jnp.einsum("pij,pj->pi", Hpp_inv, sys.gp)
    wo = jnp.einsum("oij,oj->oi", sys.Wcp, _gather_rows(zp, obs.pt_idx))
    wc = _seg_sum(wo, obs.cam_idx, sys.gc.shape[0], axis_name)
    return (sys.gc - wc) * cam_update_mask[:, None]


def back_substitute(sys: BlockSystem, obs, lam, dx_c, n_points, axis_name=None,
                    Hpp_inv=None):
    """dx_p = (H_pp+lam)^-1 (gp - H_pc dx_c)."""
    if Hpp_inv is None:
        Hpp_inv = damped_pp_inverse(sys, lam)
    yo = jnp.einsum("oij,oi->oj", sys.Wcp, _gather_rows(dx_c, obs.cam_idx))
    yp = _seg_sum(yo, obs.pt_idx, n_points, axis_name, sorted_keys=True)
    return jnp.einsum("pij,pj->pi", Hpp_inv, sys.gp - yp)


def pcg_solve(sys: BlockSystem, obs, lam, n_points, cam_update_mask,
              iters: int = 40, axis_name=None, Hpp_inv=None):
    """Preconditioned CG on the reduced camera system (component T14).

    Block-Jacobi preconditioner: per-camera 6x6 inverse of damped H_cc.
    Fixed iteration count with early stagnation guarded by rs tracking (no
    data-dependent exit; extra iterations are no-ops numerically). With
    ``axis_name``, each matvec psum-reduces over observation shards; the CG
    state (x, r, z, p) is replicated so the scalar reductions need no psum.
    The damped point-block inverse is computed ONCE here (or passed in) and
    reused by every matvec — it only depends on (sys, lam).
    """
    if Hpp_inv is None:
        Hpp_inv = damped_pp_inverse(sys, lam)
    rhs = reduced_rhs(sys, obs, lam, n_points, cam_update_mask, axis_name, Hpp_inv)
    Minv = jnp.linalg.inv(_damped(sys.Hcc, lam))

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r) * cam_update_mask[:, None]

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0

    def body(_, state):
        x, r, z, p, rz = state
        Sp = schur_matvec(sys, obs, lam, p, n_points, cam_update_mask, axis_name,
                          Hpp_inv)
        pSp = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(pSp) < 1e-20, 1.0, pSp)
        alpha = jnp.where(jnp.abs(pSp) < 1e-20, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1.0, rz)
        beta = jnp.where(jnp.abs(rz) < 1e-20, 0.0, beta)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, r, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0, jnp.sum(r0 * z0)))
    return x


# --------------------------------------------------------------------------
# Scatter-free grouped layout (component T13: block-dense Schur reduction)
# --------------------------------------------------------------------------


class GroupedObs(NamedTuple):
    """Block-dense observation layout (SURVEY.md §8.2 "block-dense layout per
    map block"): the observation table grouped by point and by camera at
    static widths, so every per-point / per-camera reduction in the Schur
    matvec is a dense einsum over a gathered tile — NO scatter anywhere in
    the PCG loop.

    Measured reality on v5e (131k obs): per-matvec the grouped path wins
    (3.2 vs 4.2 ms), but pre-gathering Wcp into the grouped tiles costs
    ~116 ms per LM iteration (TPU gathers of 72-byte rows from a 131k-row
    table run at ~300 MB/s), so it only pays past ~110 matvecs/iteration.
    ba_solve therefore defaults to the segment-sum path; this layout stays
    as a tested alternative and is the building block for the explicit-S
    variant on small camera systems.

    pt_gather: (P, Kp) int32 — observation index per (point, slot); dead
               slots point at the zero pad row O.
    pt_cam:    (P, Kp) int32 — cam_idx of that observation (0 for pads:
               harmless, the padded W block is zero).
    cam_gather:(C, Kc) int32 / cam_pt: (C, Kc) int32 — same, keyed by camera.
    """

    pt_gather: jnp.ndarray
    pt_cam: jnp.ndarray
    cam_gather: jnp.ndarray
    cam_pt: jnp.ndarray


def _group_one(idx: "np.ndarray", mask, n_segments: int, K=None):
    import numpy as np

    o = idx.shape[0]
    live = np.where(mask)[0]
    counts = np.bincount(idx[live], minlength=n_segments)
    kmax = int(counts.max()) if live.size else 1
    if K is None:
        K = max(8, -8 * (-kmax // 8))  # round up to a multiple of 8
    elif kmax > K:
        raise ValueError(f"group width {K} < max segment count {kmax}")
    table = np.full((n_segments, K), o, np.int32)  # pad row = o
    order = np.argsort(idx[live], kind="stable")
    sorted_obs = live[order]
    sorted_idx = idx[live][order]
    starts = np.searchsorted(sorted_idx, np.arange(n_segments))
    rank = np.arange(sorted_idx.shape[0]) - starts[sorted_idx]
    table[sorted_idx, rank] = sorted_obs
    return table


def group_observations(obs, n_cams: int, n_points: int,
                       Kp: int | None = None, Kc: int | None = None) -> GroupedObs:
    """Host-side (numpy) construction of the grouped layout — runs once per
    problem (the observation table is static across LM/PCG iterations).
    Requires concrete (non-traced) index arrays."""
    import numpy as np

    ci = np.asarray(obs.cam_idx)
    pi = np.asarray(obs.pt_idx)
    mask = np.asarray(obs.mask)
    pt_gather = _group_one(pi, mask, n_points, Kp)
    cam_gather = _group_one(ci, mask, n_cams, Kc)
    ci_pad = np.concatenate([ci, np.zeros(1, np.int32)])
    pi_pad = np.concatenate([pi, np.zeros(1, np.int32)])
    return GroupedObs(
        pt_gather=jnp.asarray(pt_gather),
        pt_cam=jnp.asarray(ci_pad[pt_gather]),
        cam_gather=jnp.asarray(cam_gather),
        cam_pt=jnp.asarray(pi_pad[cam_gather]),
    )


class GroupedSystem(NamedTuple):
    """Per-LM-iteration precompute for the scatter-free matvec: the coupling
    blocks pre-gathered into both grouped layouts (reads sys.Wcp twice per
    LM iteration instead of twice per PCG matvec)."""

    Wg_pt: jnp.ndarray   # (P, Kp, 6, 3)
    Wg_cam: jnp.ndarray  # (C, Kc, 6, 3)
    Hcc_l: jnp.ndarray   # (C, 6, 6) damped
    Hpp_inv: jnp.ndarray  # (P, 3, 3) damped inverse


def grouped_system(sys: BlockSystem, grouped: GroupedObs, lam) -> GroupedSystem:
    Wpad = jnp.concatenate([sys.Wcp, jnp.zeros((1, 6, 3), sys.Wcp.dtype)])
    return GroupedSystem(
        Wg_pt=Wpad[grouped.pt_gather],
        Wg_cam=Wpad[grouped.cam_gather],
        Hcc_l=_damped(sys.Hcc, lam),
        Hpp_inv=damped_pp_inverse(sys, lam),
    )


def schur_matvec_grouped(gs: GroupedSystem, grouped: GroupedObs, x,
                         cam_update_mask, axis_name=None):
    """S @ x, scatter-free. With ``axis_name`` (observation-sharded BA), the
    grouped tables are built per shard and the (P,3)/(C,6) partials psum."""
    x = x * cam_update_mask[:, None]
    xg = x[grouped.pt_cam]                                   # (P, Kp, 6)
    yp = jnp.einsum("pkia,pki->pa", gs.Wg_pt, xg)            # (P, 3)
    yp = _psum(yp, axis_name)
    zp = jnp.einsum("pij,pj->pi", gs.Hpp_inv, yp)            # (P, 3)
    zg = zp[grouped.cam_pt]                                  # (C, Kc, 3)
    wc = jnp.einsum("ckia,cka->ci", gs.Wg_cam, zg)           # (C, 6)
    wc = _psum(wc, axis_name)
    Sx = jnp.einsum("cij,cj->ci", gs.Hcc_l, x) - wc
    return Sx * cam_update_mask[:, None]


def reduced_rhs_grouped(sys: BlockSystem, gs: GroupedSystem, grouped: GroupedObs,
                        cam_update_mask, axis_name=None):
    zp = jnp.einsum("pij,pj->pi", gs.Hpp_inv, sys.gp)
    zg = zp[grouped.cam_pt]
    wc = _psum(jnp.einsum("ckia,cka->ci", gs.Wg_cam, zg), axis_name)
    return (sys.gc - wc) * cam_update_mask[:, None]


def back_substitute_grouped(sys: BlockSystem, gs: GroupedSystem,
                            grouped: GroupedObs, dx_c, axis_name=None):
    xg = dx_c[grouped.pt_cam]
    yp = _psum(jnp.einsum("pkia,pki->pa", gs.Wg_pt, xg), axis_name)
    return jnp.einsum("pij,pj->pi", gs.Hpp_inv, sys.gp - yp)


def pcg_solve_grouped(sys: BlockSystem, gs: GroupedSystem, grouped: GroupedObs,
                      cam_update_mask, iters: int = 40, axis_name=None):
    """PCG on the reduced camera system with the scatter-free matvec.
    Numerically equivalent to pcg_solve up to summation order."""
    rhs = reduced_rhs_grouped(sys, gs, grouped, cam_update_mask, axis_name)
    Minv = jnp.linalg.inv(gs.Hcc_l)

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r) * cam_update_mask[:, None]

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = precond(r0)
    p0 = z0

    def body(_, state):
        x, r, z, p, rz = state
        Sp = schur_matvec_grouped(gs, grouped, p, cam_update_mask, axis_name)
        pSp = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(pSp) < 1e-20, 1.0, pSp)
        alpha = jnp.where(jnp.abs(pSp) < 1e-20, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Sp
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1.0, rz)
        beta = jnp.where(jnp.abs(rz) < 1e-20, 0.0, beta)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, p0, jnp.sum(r0 * z0)))
    return x


def assemble_grouped(poses, points, obs, grouped: GroupedObs, n_cams, n_points,
                     huber_delta=None, axis_name=None):
    """Scatter-free assembly: per-observation residuals/Jacobians are
    gathered into the block-dense layouts and reduced with dense einsums —
    no segment_sum anywhere (the 4 per-linearization scatters dominate LM
    cost once the PCG loop is grouped). Results match ``assemble`` up to
    summation order."""
    res, Jc, Jp, w = residuals_and_jacobians(poses, points, obs, huber_delta)
    wv = w[:, None, None]
    Jcw = Jc * wv
    Jpw = Jp * wv

    def pad(x):
        return jnp.concatenate([x, jnp.zeros_like(x[:1])])

    # Point-grouped tiles: (P, Kp, 2, 3) / (P, Kp, 2)
    Jp_g = pad(Jpw)[grouped.pt_gather]
    Jp_raw = pad(Jp)[grouped.pt_gather]
    res_p = pad(res)[grouped.pt_gather]
    Hpp = _psum(jnp.einsum("pkai,pkaj->pij", Jp_g, Jp_raw), axis_name)
    gp = -_psum(jnp.einsum("pkai,pka->pi", Jp_g, res_p), axis_name)

    # Camera-grouped tiles: (C, Kc, 2, 6) / (C, Kc, 2)
    Jc_g = pad(Jcw)[grouped.cam_gather]
    Jc_raw = pad(Jc)[grouped.cam_gather]
    res_c = pad(res)[grouped.cam_gather]
    Hcc = _psum(jnp.einsum("ckai,ckaj->cij", Jc_g, Jc_raw), axis_name)
    gc = -_psum(jnp.einsum("ckai,cka->ci", Jc_g, res_c), axis_name)

    Wcp = jnp.einsum("oki,okj->oij", Jcw, Jp)  # (O, 6, 3), stays per-obs
    cost = _psum(0.5 * jnp.sum(w * jnp.sum(res * res, -1)), axis_name)
    return BlockSystem(Hcc, Hpp, Wcp, gc, gp, Jc, Jp, w), cost
