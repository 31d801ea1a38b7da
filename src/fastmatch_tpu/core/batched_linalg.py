"""Fixed-iteration batched small-matrix factorizations for TPU.

XLA's iterative `eigh`/`svd` converge DATA-DEPENDENTLY: on the
ill-conditioned DLT normal matrices this package feeds them (spectra
spanning ~6 orders), a (2048, 9, 9) eigh measured 27.6 ms on v5e where the
same shape with random entries takes 0.02 ms — a ~1000x swing that made the
whole RANSAC stack solver-bound (docs/PERFORMANCE.md "Two-view geometry").
Everything here runs a FIXED op count instead:

- ``smallest_eigvecs``: Cholesky-based inverse subspace iteration with a
  closed-form 2x2 Rayleigh-Ritz rotation — the null-vector extractor every
  DLT solve needs (8-pt/7-pt/4-pt/PnP/triangulation). 3.3 ms for the case
  above, ~8x over eigh.
- ``svd3``: one-sided Jacobi SVD for 3x3 blocks (fixed sweeps, unrolled —
  ~12 plane rotations of elementwise math, quadratically convergent). The
  iterative `jnp.linalg.svd` cost 10.3 ms on (2048, 3, 3) essential-matrix
  projections; this is pure VPU work fused into the surrounding kernel.
- ``polar3``: nearest rotation (det +1), via svd3.

All functions are shape-static, batched over leading axes, and safe under
jit/vmap/shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

# Deterministic start subspace for the inverse iteration (seeded once at
# import; any fixed full-rank slab works — it only needs a nonzero
# component along the target eigenvectors).
_INIT = np.random.default_rng(12345).standard_normal((32, 3)).astype(np.float32)


def smallest_eigvecs(M: jnp.ndarray, k: int = 1, iters: int = 6,
                     shift_rel: float = 1e-6) -> jnp.ndarray:
    """Approximate eigenvectors of the ``k`` smallest eigenvalues of a
    batched symmetric PSD matrix M (..., n, n). Returns (..., n, k),
    columns orthonormal, ordered by ascending Rayleigh quotient.

    Inverse subspace iteration on (M + eps*I) with eps = shift_rel *
    trace/n: each step is two triangular solves against one Cholesky
    factor (computed once), then Gram-Schmidt. Convergence per step is
    (lam_min + eps)/(lam_next + eps) — for DLT null vectors lam_min ~ 0, so
    one step is already ~1e-4; the extra steps buy noisy/near-degenerate
    samples. A final closed-form 2x2 Rayleigh-Ritz rotation separates
    near-tied pairs (k = 1 iterates a 2-column subspace for exactly this).

    Batches whose Cholesky fails (indefinite after rounding) return
    identity-basis columns — downstream RANSAC scoring rejects those
    hypotheses naturally; callers that need a hard guarantee should gate on
    the residual.
    """
    n = M.shape[-1]
    ks = min(max(k + 1, 2), n)  # iterate one extra column for Ritz separation
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    eps = shift_rel * tr / n
    L = jnp.linalg.cholesky(M + eps * jnp.eye(n, dtype=M.dtype))
    bad = ~jnp.all(jnp.isfinite(L), axis=(-2, -1))
    L = jnp.where(bad[..., None, None], jnp.eye(n, dtype=M.dtype), L)

    V = jnp.broadcast_to(jnp.asarray(_INIT[:n, :ks], M.dtype), M.shape[:-2] + (n, ks))

    def _orthonormalize(V):
        # Modified Gram-Schmidt over ks columns (unrolled, shape-static).
        cols = []
        for j in range(ks):
            v = V[..., :, j]
            for u in cols:
                v = v - jnp.sum(v * u, -1, keepdims=True) * u
            nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
            cols.append(v / jnp.maximum(nv, 1e-20))
        return jnp.stack(cols, axis=-1)

    for _ in range(iters):
        Y = jsl.solve_triangular(L, V, lower=True)
        V = jsl.solve_triangular(jnp.swapaxes(L, -2, -1), Y, lower=False)
        V = _orthonormalize(V)

    # Rayleigh-Ritz on the iterated subspace: H = V^T M V, rotate V by H's
    # eigenvectors so columns align with (and are ordered by) the true
    # small eigenvalues even when the subspace converged but the individual
    # columns did not (near-tied spectrum).
    H = jnp.swapaxes(V, -2, -1) @ (M @ V)  # (..., ks, ks)
    if ks == 2:
        h11 = H[..., 0, 0]
        h22 = H[..., 1, 1]
        h12 = H[..., 0, 1]
        theta = 0.5 * jnp.arctan2(2.0 * h12, h11 - h22)
        c, s = jnp.cos(theta), jnp.sin(theta)
        # Eigenvalues along the rotated axes; order ascending.
        e1 = c * c * h11 + 2 * c * s * h12 + s * s * h22
        e2 = s * s * h11 - 2 * c * s * h12 + c * c * h22
        v1 = c[..., None] * V[..., :, 0] + s[..., None] * V[..., :, 1]
        v2 = -s[..., None] * V[..., :, 0] + c[..., None] * V[..., :, 1]
        first = e1 <= e2
        Vout = jnp.stack(
            [jnp.where(first[..., None], v1, v2),
             jnp.where(first[..., None], v2, v1)], axis=-1)
    else:
        # ks = 3 (k = 2): Jacobi-diagonalize the 3x3 H with two unrolled
        # sweeps of the same closed-form rotation, then sort columns.
        Q = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), H.shape)
        for _ in range(3):
            for (p, q) in ((0, 1), (0, 2), (1, 2)):
                hpp = H[..., p, p]
                hqq = H[..., q, q]
                hpq = H[..., p, q]
                th = 0.5 * jnp.arctan2(2.0 * hpq, hpp - hqq)
                c, s = jnp.cos(th)[..., None], jnp.sin(th)[..., None]
                # Apply Givens on the right: columns p, q.
                Hp = c * H[..., :, p] + s * H[..., :, q]
                Hq = -s * H[..., :, p] + c * H[..., :, q]
                H = H.at[..., :, p].set(Hp).at[..., :, q].set(Hq)
                # ...and on the left (rows), keeping H symmetric.
                Hp = c * H[..., p, :] + s * H[..., q, :]
                Hq = -s * H[..., p, :] + c * H[..., q, :]
                H = H.at[..., p, :].set(Hp).at[..., q, :].set(Hq)
                Qp = c * Q[..., :, p] + s * Q[..., :, q]
                Qq = -s * Q[..., :, p] + c * Q[..., :, q]
                Q = Q.at[..., :, p].set(Qp).at[..., :, q].set(Qq)
        Vr = V @ Q
        ev = jnp.stack([H[..., i, i] for i in range(3)], axis=-1)
        # Sorting network over 3 (value, column) pairs, ascending.
        def swap(ev, Vr, i, j):
            do = ev[..., i] > ev[..., j]
            ei = jnp.where(do, ev[..., j], ev[..., i])
            ej = jnp.where(do, ev[..., i], ev[..., j])
            ev = ev.at[..., i].set(ei).at[..., j].set(ej)
            ci = jnp.where(do[..., None], Vr[..., :, j], Vr[..., :, i])
            cj = jnp.where(do[..., None], Vr[..., :, i], Vr[..., :, j])
            Vr = Vr.at[..., :, i].set(ci).at[..., :, j].set(cj)
            return ev, Vr
        for (i, j) in ((0, 1), (1, 2), (0, 1)):
            ev, Vr = swap(ev, Vr, i, j)
        Vout = Vr
    return Vout[..., :, :k]


def _orth_complement(u: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit u (..., 3), branchless."""
    a = jnp.cross(u, jnp.asarray([1.0, 0.0, 0.0], u.dtype) * jnp.ones_like(u))
    b = jnp.cross(u, jnp.asarray([0.0, 1.0, 0.0], u.dtype) * jnp.ones_like(u))
    na = jnp.linalg.norm(a, axis=-1, keepdims=True)
    nb = jnp.linalg.norm(b, axis=-1, keepdims=True)
    v = jnp.where(na > nb, a, b)
    return v / jnp.maximum(jnp.maximum(na, nb), 1e-20)


def svd3(M: jnp.ndarray, sweeps: int = 4):
    """Batched 3x3 SVD by one-sided Jacobi: M = U diag(S) V^T.

    U, V orthogonal (not necessarily rotations — fix dets downstream if
    needed), S >= 0 descending. ``sweeps`` unrolled cyclic sweeps (3 plane
    rotations each); 4 reaches f32 roundoff for any 3x3. Rank-deficient
    inputs get U completed by cross products, so U is always a full
    orthogonal basis (the property essential/homography decompositions
    rely on).
    """
    B = M
    V = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).astype(M.dtype)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            bp = B[..., :, p]
            bq = B[..., :, q]
            app = jnp.sum(bp * bp, -1)
            aqq = jnp.sum(bq * bq, -1)
            apq = jnp.sum(bp * bq, -1)
            theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
            c = jnp.cos(theta)[..., None]
            s = jnp.sin(theta)[..., None]
            B = B.at[..., :, p].set(c * bp + s * bq)
            B = B.at[..., :, q].set(-s * bp + c * bq)
            vp = V[..., :, p]
            vq = V[..., :, q]
            V = V.at[..., :, p].set(c * vp + s * vq)
            V = V.at[..., :, q].set(-s * vp + c * vq)
    S = jnp.linalg.norm(B, axis=-2)  # (..., 3) column norms

    # Descending sort (3-element network), columns of B and V follow.
    def swap(S, B, V, i, j):
        do = S[..., i] < S[..., j]
        si = jnp.where(do, S[..., j], S[..., i])
        sj = jnp.where(do, S[..., i], S[..., j])
        S = S.at[..., i].set(si).at[..., j].set(sj)
        bi = jnp.where(do[..., None], B[..., :, j], B[..., :, i])
        bj = jnp.where(do[..., None], B[..., :, i], B[..., :, j])
        B = B.at[..., :, i].set(bi).at[..., :, j].set(bj)
        vi = jnp.where(do[..., None], V[..., :, j], V[..., :, i])
        vj = jnp.where(do[..., None], V[..., :, i], V[..., :, j])
        V = V.at[..., :, i].set(vi).at[..., :, j].set(vj)
        return S, B, V

    for (i, j) in ((0, 1), (1, 2), (0, 1)):
        S, B, V = swap(S, B, V, i, j)

    eps = 1e-12 + 1e-6 * S[..., 0:1]
    u0 = B[..., :, 0] / jnp.maximum(S[..., 0:1], 1e-20)
    # Degenerate-rank completion: a column with sigma ~ 0 has no direction
    # in B; rebuild it orthogonal to the preceding ones.
    u0 = jnp.where(S[..., 0:1] > 1e-20, u0,
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], M.dtype),
                                    u0.shape))
    u1 = B[..., :, 1] / jnp.maximum(S[..., 1:2], 1e-20)
    u1 = jnp.where(S[..., 1:2] > eps, u1, _orth_complement(u0))
    u2 = B[..., :, 2] / jnp.maximum(S[..., 2:3], 1e-20)
    c01 = jnp.cross(u0, u1)
    u2 = jnp.where(S[..., 2:3] > eps, u2, c01)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -2, -1)


def polar3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation (Frobenius) to a batched 3x3: R = U diag(1,1,det) V^T."""
    U, _, Vt = svd3(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return U @ (D[..., :, None] * Vt)
