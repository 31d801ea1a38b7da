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
_INIT = np.random.default_rng(12345).standard_normal((32, 8)).astype(np.float32)


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
        # ks >= 3: Jacobi-diagonalize the small ks x ks H with unrolled
        # cyclic sweeps, then sort columns. Rotations are applied as Givens
        # MATRIX MULTIPLIES, never .at[] column writes — eager-mode .at[]
        # update chains have produced buffer-aliasing corruption on the CPU
        # backend (found via the 5-point solver; see geometry/five_point.py).
        Q = jnp.broadcast_to(jnp.eye(ks, dtype=M.dtype), H.shape)
        pairs = [(p, q) for p in range(ks) for q in range(p + 1, ks)]
        for _ in range(3):
            for (p, q) in pairs:
                hpp = H[..., p, p]
                hqq = H[..., q, q]
                hpq = H[..., p, q]
                th = 0.5 * jnp.arctan2(2.0 * hpq, hpp - hqq)
                G = _givens(ks, p, q, jnp.cos(th), jnp.sin(th), M.dtype)
                H = jnp.swapaxes(G, -2, -1) @ H @ G
                Q = Q @ G
        Vr = V @ Q
        ev = jnp.stack([H[..., i, i] for i in range(ks)], axis=-1)
        order = jnp.argsort(ev, axis=-1)  # ascending
        Vout = jnp.take_along_axis(Vr, order[..., None, :], axis=-1)
    return Vout[..., :, :k]


def _givens(n, p, q, c, s, dtype):
    """Batched (..., n, n) Givens rotation: identity except
    [p,p]=[q,q]=c, [p,q]=-s, [q,p]=s. Built from one-hot constants — no
    .at[] scatter (see aliasing note in smallest_eigvecs)."""
    ep = np.zeros((n,), np.float32)
    eq = np.zeros((n,), np.float32)
    ep[p] = 1.0
    eq[q] = 1.0
    Epp = jnp.asarray(np.outer(ep, ep), dtype)
    Eqq = jnp.asarray(np.outer(eq, eq), dtype)
    Epq = jnp.asarray(np.outer(ep, eq), dtype)
    Eqp = jnp.asarray(np.outer(eq, ep), dtype)
    eye = jnp.asarray(np.eye(n), dtype)
    c1 = (c - 1.0)[..., None, None]
    sb = s[..., None, None]
    return eye + c1 * (Epp + Eqq) - sb * Epq + sb * Eqp


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
    # Rotations as Givens matrix multiplies and the sort as a gather —
    # NO .at[] updates: eager-mode .at[] chains have produced
    # buffer-aliasing corruption on the CPU backend (see smallest_eigvecs).
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
            G = _givens(3, p, q, jnp.cos(theta), jnp.sin(theta), M.dtype)
            B = B @ G
            V = V @ G
    S = jnp.linalg.norm(B, axis=-2)  # (..., 3) column norms

    # Descending order; columns of B and V follow.
    order = jnp.argsort(-S, axis=-1)
    S = jnp.take_along_axis(S, order, axis=-1)
    B = jnp.take_along_axis(B, order[..., None, :], axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

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
