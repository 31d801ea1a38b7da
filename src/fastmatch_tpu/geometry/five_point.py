"""Minimal 5-point relative pose (essential matrix) solver, TPU-native.

Completes SURVEY.md §2.2 L4's "5-pt/8-pt solvers". The classic Nister
solver eigendecomposes a nonsymmetric 10x10 action matrix or carries a
hand-derived Gauss-Jordan index table — neither survives contact with TPU
(no nonsymmetric eig in XLA) or with f32 (degree-10 coefficient expansion).
This implementation keeps every step batched, shape-static, and numeric:

1. 4-dim nullspace of the 5 epipolar constraints via fixed-iteration
   inverse subspace iteration (core/batched_linalg.py), E = x E1 + y E2 +
   z E3 + E4.
2. The 10 cubic constraints (det E = 0, 2 E E^T E - tr(E E^T) E = 0) are
   expanded NUMERICALLY over the 20 degree-<=3 monomials with
   precomputed index tables — no symbolic algebra at trace time, just
   einsums.
3. Batched Gauss-Jordan reduction (partial pivoting, branchless row
   swaps) eliminates the 10 leading monomials, leaving every one of them
   expressed as x*a(z) + y*b(z) + c(z) over the trailing monomials.
4. Three polynomial identities (x<x^2> = <x^3>, y<x^2> = <x^2 y>,
   y<y^2> = <y^3>) close the system into B(z) [x, y, 1]^T = 0 with B a
   3x3 polynomial matrix. det B(z) vanishes at every solution; it is
   NEVER expanded symbolically — it is evaluated numerically on a
   tan-spaced grid, sign changes are bracketed into fixed root slots, and
   fixed-count bisection refines them (data-independent op count).
5. (x, y) from the 2x2 normal equations of B(z*); candidates are
   projected to the essential manifold and validated against the original
   cubic constraints. Spurious det-B roots (the identity set is not a
   minimal Groebner basis, so deg det B <= 13 rather than Nister's exact
   10) fail that validation and are masked.

Up to ``_N_ROOTS`` = 16 candidate essential matrices per sample; RANSAC
(geometry/ransac.py solver="5pt") scores K x 16 candidates in one batch.
(16 bracket slots > the 10 true solutions + deg-13 det-B margin: measured
failure class where noise crossings crowded true roots out of 12 slots.)

Always call through a jit boundary on TPU (ransac_essential provides one):
eagerly this function dispatches hundreds of small programs, each a
separate remote compile through the relay.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import smallest_eigvecs
from fastmatch_tpu.geometry.epipolar import _homog

# ---------------------------------------------------------------------------
# Monomial bookkeeping (built once at import, plain numpy).
# deg-1 basis for E entries: x, y, z, 1
_M1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
# deg-2 and deg-3 monomial lists (lexicographic in exponent tuples).
_M2 = [(i, j, k) for i in range(3) for j in range(3) for k in range(3)
       if i + j + k <= 2]
# Leading 10 monomials (eliminated to I by Gauss-Jordan), then trailing 10
# in the grouped order x*(z^2,z,1), y*(z^2,z,1), (z^3,z^2,z,1).
_LEAD = [(3, 0, 0), (2, 1, 0), (2, 0, 1), (2, 0, 0), (1, 2, 0),
         (1, 1, 1), (1, 1, 0), (0, 3, 0), (0, 2, 1), (0, 2, 0)]
_TRAIL = [(1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
          (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]
_M3 = _LEAD + _TRAIL
_M2_IDX = {m: i for i, m in enumerate(_M2)}
_M3_IDX = {m: i for i, m in enumerate(_M3)}

# Product tables as dense constant tensors: one einsum per polynomial
# multiply instead of a chain of scatter-adds (thousands of HLO ops and an
# eager-dispatch hazard at trace scale).
_T11 = np.zeros((4, 4, len(_M2)), np.float32)   # deg1 x deg1 -> deg2
for _a, ma in enumerate(_M1):
    for _b, mb in enumerate(_M1):
        _T11[_a, _b, _M2_IDX[tuple(np.add(ma, mb))]] = 1.0
_T21 = np.zeros((len(_M2), 4, 20), np.float32)  # deg2 x deg1 -> deg3
for _a, ma in enumerate(_M2):
    for _b, mb in enumerate(_M1):
        _T21[_a, _b, _M3_IDX[tuple(np.add(ma, mb))]] = 1.0


def _mul11(p, q):
    """(..., 4) x (..., 4) deg-1 polys -> (..., 10) deg-2."""
    return jnp.einsum("...a,...b,abm->...m", p, q, jnp.asarray(_T11))


def _mul21(p, q):
    """(..., 10) deg-2 x (..., 4) deg-1 -> (..., 20) deg-3."""
    return jnp.einsum("...a,...b,abm->...m", p, q, jnp.asarray(_T21))


def _constraint_matrix(Ebasis):
    """(..., 4, 3, 3) nullspace basis -> (..., 10, 20) cubic constraints.

    Row 0: det E. Rows 1-9: 2 E E^T E - tr(E E^T) E, flattened row-major.
    E(x, y, z) = x E1 + y E2 + z E3 + E4 -> each entry is the deg-1 poly
    with coefficient vector Ebasis[..., :, i, j] over [x, y, z, 1].
    """
    P = jnp.moveaxis(Ebasis, -3, -1)  # (..., 3, 3, 4): entry polys

    def e(i, j):
        return P[..., i, j, :]

    # det E = sum over permutations of entry triples.
    det = jnp.zeros(P.shape[:-3] + (20,), P.dtype)
    for (j0, j1, j2, sgn) in (
        (0, 1, 2, 1.0), (1, 2, 0, 1.0), (2, 0, 1, 1.0),
        (2, 1, 0, -1.0), (1, 0, 2, -1.0), (0, 2, 1, -1.0),
    ):
        det = det + sgn * _mul21(_mul11(e(0, j0), e(1, j1)), e(2, j2))

    # G = E E^T (deg-2, symmetric); trace.
    G = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc = _mul11(e(i, 0), e(j, 0))
            acc = acc + _mul11(e(i, 1), e(j, 1))
            acc = acc + _mul11(e(i, 2), e(j, 2))
            G[i][j] = acc
    trG = G[0][0] + G[1][1] + G[2][2]

    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = _mul21(G[i][0], e(0, j))
            acc = acc + _mul21(G[i][1], e(1, j))
            acc = acc + _mul21(G[i][2], e(2, j))
            rows.append(2.0 * acc - _mul21(trG, e(i, j)))
    return jnp.stack(rows, axis=-2)  # (..., 10, 20)


def _gauss_jordan(C):
    """Reduce (..., 10, 20) to [I | M]; returns M (..., 10, 10).

    Partial pivoting with branchless row swaps; fixed 10 pivot steps.
    Degenerate systems (pivot ~ 0) produce garbage rows that downstream
    constraint validation rejects.
    """
    n = 10
    # Row equilibration: constraint rows span orders of magnitude; unit-norm
    # rows keep the f32 elimination honest.
    C = C / jnp.maximum(
        jnp.linalg.norm(C, axis=-1, keepdims=True), 1e-20)
    for col in range(n):
        piv = jnp.argmax(jnp.abs(C[..., col:, col]), axis=-1) + col  # (...,)
        # Branchless swap of row `col` and row `piv`.
        idx = jnp.arange(n)
        sel = jnp.where(idx == col, piv[..., None],
                        jnp.where(idx == piv[..., None], col, idx))
        C = jnp.take_along_axis(C, sel[..., :, None], axis=-2)
        p = C[..., col, :]
        pval = p[..., col:col + 1]
        p = p / jnp.where(jnp.abs(pval) > 1e-20, pval, 1.0)
        # Eliminate every other row; write the scaled pivot row via where —
        # no .at[] (eager .at[] chains have aliasing hazards, see
        # core/batched_linalg.py).
        f = C[..., :, col:col + 1]
        rowmask = (idx == col)[:, None]
        C = jnp.where(rowmask, p[..., None, :], C - f * p[..., None, :])
    return C[..., :, 10:]


def _poly_rows(M):
    """Row r of [I | M]: leadmon_r = -(a_r(z) x + b_r(z) y + c_r(z)).

    Returns (a, b, c): a, b (..., 10, 3) coeffs over [z^2, z, 1];
    c (..., 10, 4) over [z^3, z^2, z, 1].
    """
    a = -M[..., :, 0:3]
    b = -M[..., :, 3:6]
    c = -M[..., :, 6:10]
    return a, b, c


def _polyval(coef, z):
    """Horner over the last axis (highest degree first). z (...)."""
    acc = coef[..., 0]
    for i in range(1, coef.shape[-1]):
        acc = acc * z + coef[..., i]
    return acc


def _pmul(p, q):
    """1-D convolution of coefficient arrays (highest-first), static shapes.

    Shift-and-add with concatenation (no .at[] scatter)."""
    np_, nq = p.shape[-1], q.shape[-1]
    terms = []
    for i in range(np_):
        zl = jnp.zeros(p.shape[:-1] + (i,), p.dtype)
        zr = jnp.zeros(p.shape[:-1] + (np_ - 1 - i,), p.dtype)
        terms.append(jnp.concatenate([zl, p[..., i:i + 1] * q, zr], axis=-1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _padp(p, n):
    """Left-pad (high-degree side) to n coefficients."""
    return jnp.concatenate(
        [jnp.zeros(p.shape[:-1] + (n - p.shape[-1],), p.dtype), p], axis=-1)


def _b_matrix_coeffs(a, b, c):
    """Closing identities -> B(z) (..., 3, 3) polynomial coefficient rows.

    Using RREF rows <x^3>=0, <x^2 y>=1, <x^2>=3, <xy>=6, <y^3>=7, <y^2>=9:
      I1 = x<x^2> - <x^3>:  alpha = a3*a3 + b3*a6 + c3~ - a0 ...
    Every entry is returned as coefficients over [z^5 .. 1] (length 6).
    """
    def A(r):
        return a[..., r, :]

    def Bc(r):
        return b[..., r, :]

    def Cc(r):
        return c[..., r, :]

    def row(alpha, beta, gamma):
        return [_padp(alpha, 6), _padp(beta, 6), _padp(gamma, 6)]

    # x-lift of c (deg3 over z) contributes to the x coefficient: c enters
    # alpha as-is (padded), since x * c(z) has x-degree 1.
    # I1: x<x^2> - <x^3> = x(a3^2 + b3 a6 + c3 - a0) + y(a3 b3 + b3 b6 - b0)
    #     + (a3 c3 + b3 c6 - c0)
    a3, b3, c3 = A(3), Bc(3), Cc(3)
    a6, b6, c6 = A(6), Bc(6), Cc(6)
    a9, b9, c9 = A(9), Bc(9), Cc(9)
    rows = []

    # I1: x * <x^2> - <x^3>
    alpha = _padp(_pmul(a3, a3), 6) + _padp(_pmul(b3, a6), 6) + _padp(c3, 6) \
        - _padp(A(0), 6)
    beta = _padp(_pmul(a3, b3), 6) + _padp(_pmul(b3, b6), 6) - _padp(Bc(0), 6)
    gamma = _padp(_pmul(a3, c3), 6) + _padp(_pmul(b3, c6), 6) - _padp(Cc(0), 6)
    rows.append(row(alpha, beta, gamma))

    # I2: y * <x^2> - <x^2 y>
    alpha = _padp(_pmul(a6, a3), 6) + _padp(_pmul(a9, b3), 6) - _padp(A(1), 6)
    beta = _padp(_pmul(b6, a3), 6) + _padp(_pmul(b9, b3), 6) + _padp(c3, 6) \
        - _padp(Bc(1), 6)
    gamma = _padp(_pmul(c6, a3), 6) + _padp(_pmul(c9, b3), 6) - _padp(Cc(1), 6)
    rows.append(row(alpha, beta, gamma))

    # I3: y * <y^2> - <y^3>
    alpha = _padp(_pmul(a6, a9), 6) + _padp(_pmul(a9, b9), 6) - _padp(A(7), 6)
    beta = _padp(_pmul(b6, a9), 6) + _padp(_pmul(b9, b9), 6) + _padp(c9, 6) \
        - _padp(Bc(7), 6)
    gamma = _padp(_pmul(c6, a9), 6) + _padp(_pmul(c9, b9), 6) - _padp(Cc(7), 6)
    rows.append(row(alpha, beta, gamma))

    # Stack into (..., 3 rows, 3 cols, 6 coeffs).
    return jnp.stack([jnp.stack(r, axis=-2) for r in rows], axis=-3)


def _detB(Bc, z):
    """det B(z) evaluated numerically; Bc (..., 3, 3, 6), z (..., G)."""
    vals = _polyval(Bc[..., None, :, :, :],
                    z[..., :, None, None])  # (..., G, 3, 3)
    return (
        vals[..., 0, 0] * (vals[..., 1, 1] * vals[..., 2, 2]
                           - vals[..., 1, 2] * vals[..., 2, 1])
        - vals[..., 0, 1] * (vals[..., 1, 0] * vals[..., 2, 2]
                             - vals[..., 1, 2] * vals[..., 2, 0])
        + vals[..., 0, 2] * (vals[..., 1, 0] * vals[..., 2, 1]
                             - vals[..., 1, 1] * vals[..., 2, 0])
    )


_N_ROOTS = 16
_N_AUX = 16   # fixed-z auxiliary polish starts (see five_point_essential)
_GRID = 512
# Monomial exponent table as arrays for numeric evaluation/Jacobians.
_EXP = np.array(_M3, np.int32)  # (20, 3)


# Vectorized monomial evaluation: one broadcasted power/product instead of
# 20 (or 60) separately traced scalar-power chains — shrinks the jitted
# program (this function is called inside every polish iteration and the
# solver is vmapped over K RANSAC hypotheses).
_EXPF = _EXP.astype(np.float32)                      # (20, 3)
_EXP_DEC = np.maximum(_EXP[None] - np.eye(3, dtype=np.int32)[:, None], 0)
# (3, 20, 3): exponents of d(monomial)/d(var), per var.


def _mono20(xyz):
    """(..., 3) -> (..., 20) monomial evaluations."""
    return jnp.prod(xyz[..., None, :] ** jnp.asarray(_EXPF), axis=-1)


def _mono20_jac(xyz):
    """(..., 3) -> (..., 20, 3) d(monomials)/d(x, y, z)."""
    # For var v: coeff = exp[m, v], monomial with exp[m, v] decremented.
    base = jnp.prod(
        xyz[..., None, None, :] ** jnp.asarray(_EXP_DEC, jnp.float32),
        axis=-1)                                     # (..., 3, 20)
    return jnp.moveaxis(jnp.asarray(_EXPF.T) * base, -2, -1)


def _newton_polish(C, xyz, iters: int = 24):
    """Gauss-Newton on the 10 cubic constraints r = C m(x,y,z).

    The det-B root scan runs in f32 through a Gauss-Jordan eliminate —
    enough noise to displace roots by ~1e-1 in (x, y, z). The original
    constraint matrix C is numerically benign, so a few damped GN steps
    from each approximate root land on the true variety (f64-free
    alternative to Nister's traditional double-precision pipeline).
    fori_loop body: the polish is iteration-count-fixed anyway and
    unrolling it multiplied the traced program (compile time) by ``iters``.
    """
    def body(_, xyz):
        r = jnp.einsum("...ct,...t->...c", C, _mono20(xyz))       # (..., 10)
        J = jnp.einsum("...ct,...ti->...ci", C, _mono20_jac(xyz))  # (..., 10, 3)
        JtJ = jnp.einsum("...ci,...cj->...ij", J, J)
        Jtr = jnp.einsum("...ci,...c->...i", J, r)
        # Closed-form 3x3 solve with Levenberg damping.
        lam = 1e-8 * jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None, None]
        H = JtJ + lam * jnp.eye(3)
        det = jnp.linalg.det(H)
        adj = _adj3(H)
        step = jnp.einsum("...ij,...j->...i", adj, Jtr) / jnp.where(
            jnp.abs(det) > 1e-30, det, 1.0)[..., None]
        # Trust-region clip: near-coincident solutions make JtJ almost
        # singular and the raw GN step explodes out of the basin; capping
        # the step keeps the iteration inside it (measured: rescues the
        # marginal ~10% of minimal problems where the f32 RREF start is
        # poor).
        sn = jnp.linalg.norm(step, axis=-1, keepdims=True)
        step = step * (2.0 / jnp.maximum(sn, 2.0))
        return xyz - step

    return jax.lax.fori_loop(0, iters, body, xyz)


def _adj3(M):
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
    ], axis=-2)


def five_point_essential(x1: jnp.ndarray, x2: jnp.ndarray):
    """Essential matrices from exactly 5 normalized correspondences.

    x1, x2: (..., 5, 2). Returns (Es (..., 32, 3, 3), valid (..., 32)) —
    16 det-B bracket slots plus 16 auxiliary polish starts per sample (10
    true solutions of the minimal problem at most; spurious det-B roots
    and non-converged starts are masked by the constraint-residual gate).
    Invalid slots contain garbage; callers must honor ``valid``.
    Duplicate recoveries of the same solution across slots are expected
    and harmless (RANSAC scores candidates independently).
    """
    h1 = _homog(x1)
    h2 = _homog(x2)
    A = (h2[..., :, None] * h1[..., None, :]).reshape(*x1.shape[:-2], 5, 9)
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    N = smallest_eigvecs(ATA, k=4)  # (..., 9, 4)
    Ebasis = jnp.moveaxis(N, -1, -2).reshape(*x1.shape[:-2], 4, 3, 3)
    # Order so E = x E1 + y E2 + z E3 + 1 * E4.
    C = _constraint_matrix(Ebasis)
    M = _gauss_jordan(C)
    a, b, c = _poly_rows(M)
    Bc = _b_matrix_coeffs(a, b, c)
    # Per-row positive normalization: scaling row r of B(z) by c_r > 0
    # multiplies det B by c_0 c_1 c_2 > 0 — every root and every sign are
    # preserved — but bounds the detB dynamic range (measured spans of
    # ~1e11 made the f32 sign-change products overflow and seeded spurious
    # crossings that crowded true roots out of the bracket slots).
    Bc = Bc / jnp.maximum(
        jnp.max(jnp.abs(Bc), axis=(-2, -1), keepdims=True), 1e-30)

    # --- root scan over z = tan(theta): brackets from sign changes.
    theta = jnp.linspace(-np.pi / 2 + 2e-2, np.pi / 2 - 2e-2, _GRID)
    zg = jnp.tan(theta)
    d = _detB(Bc, jnp.broadcast_to(zg, Bc.shape[:-3] + (_GRID,)))
    # Sign-based crossing test (no d*d product: overflow-safe in f32).
    sc = jnp.sign(d[..., :-1]) * jnp.sign(d[..., 1:]) < 0  # (..., G-1)
    # First _N_ROOTS bracket indices (top_k on flag*(G - position)).
    rank = sc * (jnp.arange(_GRID - 1, 0, -1))
    val, bi = jax.lax.top_k(rank, _N_ROOTS)
    has_root = val > 0

    lo = theta[bi]
    hi = theta[jnp.minimum(bi + 1, _GRID - 1)]
    dlo = jnp.take_along_axis(d, bi, axis=-1)

    # --- fixed-count bisection in theta space (fori_loop: compiles once).
    def _bis(_, state):
        lo, hi, dlo = state
        mid = 0.5 * (lo + hi)
        dm = _detB(Bc, jnp.tan(mid))
        left = (dlo * dm) <= 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                jnp.where(left, dlo, dm))

    lo, hi, dlo = jax.lax.fori_loop(0, 40, _bis, (lo, hi, dlo))
    z = jnp.tan(0.5 * (lo + hi))  # (..., _N_ROOTS)

    # --- auxiliary polish starts (jit-robustness, measured 2026-08-17):
    # the bracket scan runs through an f32 RREF whose discrete branches
    # (pivot argmax, top_k, bisection sides) sit on rounding knife-edges —
    # under jit, fusion-level reduction-order changes flipped them and lost
    # true roots that the SAME code found eagerly (~8% of random minimal
    # problems; see docs/PERFORMANCE.md). The Gauss-Newton polish converges
    # to variety points from generic starts, so a fixed z-spread of extra
    # starts recovers scan-lost roots — including even-multiplicity detB
    # touches that produce no sign change at all. Non-converged starts are
    # killed by the constraint-residual gate below.
    theta_aux = jnp.linspace(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, _N_AUX)
    z_aux = jnp.broadcast_to(jnp.tan(theta_aux), z.shape[:-1] + (_N_AUX,))
    z = jnp.concatenate([z, z_aux], axis=-1)          # (..., _N_ROOTS+_N_AUX)
    has_root = jnp.concatenate(
        [has_root, jnp.ones(has_root.shape[:-1] + (_N_AUX,), bool)], axis=-1)

    # --- (x, y) via least squares on B(z*) [x, y, 1] = 0.
    vals = _polyval(Bc[..., None, :, :, :], z[..., :, None, None])  # (...,R,3,3)
    A2 = vals[..., :, :2]  # (..., 12, 3, 2)
    g2 = -vals[..., :, 2]  # (..., 12, 3)
    AtA = jnp.einsum("...ri,...rj->...ij", A2, A2)
    Atg = jnp.einsum("...ri,...r->...i", A2, g2)
    det2 = AtA[..., 0, 0] * AtA[..., 1, 1] - AtA[..., 0, 1] * AtA[..., 1, 0]
    det2s = jnp.where(jnp.abs(det2) > 1e-20, det2, 1.0)
    xs = (AtA[..., 1, 1] * Atg[..., 0] - AtA[..., 0, 1] * Atg[..., 1]) / det2s
    ys = (AtA[..., 0, 0] * Atg[..., 1] - AtA[..., 1, 0] * Atg[..., 0]) / det2s

    # Polish each approximate root on the true constraint variety — the
    # det-B scan is only accurate to f32-through-RREF (~1e-1 in xyz).
    xyz = _newton_polish(C[..., None, :, :], jnp.stack([xs, ys, z], axis=-1))
    xs, ys, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    E = (xs[..., None, None] * Ebasis[..., None, 0, :, :]
         + ys[..., None, None] * Ebasis[..., None, 1, :, :]
         + z[..., None, None] * Ebasis[..., None, 2, :, :]
         + Ebasis[..., None, 3, :, :])
    nrm = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / jnp.maximum(nrm, 1e-20)

    # --- validate against the original cubics on the normalized E.
    detE = jnp.linalg.det(E)
    EEt = E @ jnp.swapaxes(E, -2, -1)
    tr = jnp.trace(EEt, axis1=-2, axis2=-1)[..., None, None]
    resid = 2.0 * (EEt @ E) - tr * E
    rmax = jnp.max(jnp.abs(resid), axis=(-2, -1))
    valid = has_root & (jnp.abs(detE) < 1e-3) & (rmax < 1e-2)

    # Dead slots carry NaN garbage; make them inert.
    finite = jnp.all(jnp.isfinite(E), axis=(-2, -1))
    valid = valid & finite
    E = jnp.where(finite[..., None, None], E, jnp.eye(3, dtype=E.dtype))
    # NOTE: no svd3 manifold projection here — the validation gate already
    # bounds |det E| and the trace-identity residual (the candidates are on
    # the essential manifold to ~1e-3 of unit Frobenius norm), Sampson
    # scoring does not need an exact (1,1,0) spectrum, and RANSAC's final
    # weighted 8-point refit re-projects anyway. (Also pragmatic: a
    # trailing batched svd3+matmul at this exact point produced
    # liveness-dependent corruption in this container's patched CPU
    # runtime; removing a redundant step beats fighting it.)
    return E, valid
