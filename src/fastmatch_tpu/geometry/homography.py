"""Planar homography: normalized DLT, transfer error, batched RANSAC,
and decomposition into (R, t, n) pose candidates.

Completes SURVEY.md §2.2 L4's "essential/homography" model pair. The
essential-matrix path (epipolar.py / ransac.py) is degenerate exactly where
the homography is well-posed — planar scenes and (near-)pure rotations — so
two-view bootstrap selects between the two models by inlier support
(``select_two_view_model``). The reference repo has no geometric estimation
at all (it is a matching-research codebase, SURVEY.md §3.1); this belongs to
the SfM extension mandated by BASELINE.json:5.

TPU-first shape discipline, same as ransac.py: K minimal 4-point hypotheses
are solved and scored fully batched (eigh of the 9x9 normal matrix, no
per-hypothesis SVDs of tall systems), winner by masked inlier count, then a
weighted refit on the winning inlier set. No data-dependent control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.batched_linalg import smallest_eigvecs, svd3
from fastmatch_tpu.geometry.epipolar import _homog, triangulate_midpoint


def _normalize_points(x: jnp.ndarray, w: jnp.ndarray | None = None):
    """Hartley normalization: similarity T with (weighted) centroid at the
    origin and mean distance sqrt(2). x: (..., P, 2). Returns (xn, T) with
    T (..., 3, 3) mapping raw homogeneous points to normalized ones.

    Conditioning of the DLT normal matrix is what makes the minimal 4-point
    solve usable in f32 on the MXU — without it, coordinate magnitudes ~1e0
    vs the implicit 1s in the homogeneous rows already cost digits.
    """
    if w is None:
        mean = jnp.mean(x, axis=-2)
        d = jnp.linalg.norm(x - mean[..., None, :], axis=-1)
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.mean(d, axis=-1), 1e-12)
    else:
        wsum = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
        mean = jnp.sum(x * w[..., None], axis=-2) / wsum[..., None]
        d = jnp.linalg.norm(x - mean[..., None, :], axis=-1)
        scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w, axis=-1) / wsum, 1e-12)
    xn = (x - mean[..., None, :]) * scale[..., None, None]
    z = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    T = jnp.stack(
        [
            jnp.stack([scale, z, -scale * mean[..., 0]], axis=-1),
            jnp.stack([z, scale, -scale * mean[..., 1]], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def _adjugate3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 adjugate: adj(M) = det(M) M^-1 without the division —
    exactly the scale-free inverse a projective transform wants, and ~5x
    cheaper than LU on TPU for small batched blocks (docs/PERFORMANCE.md)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    cof = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof


def dlt_homography(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray | None = None):
    """Homography from >=4 correspondences (x2 ~ H x1), least squares.

    x1, x2: (..., P, 2); w: optional (..., P) weights (e.g. inlier mask) —
    zero rows drop out of the fit. Returns (..., 3, 3) H scaled to unit
    Frobenius norm with H[2,2] >= 0.
    """
    x1n, T1 = _normalize_points(x1, w)
    x2n, T2 = _normalize_points(x2, w)
    h1 = _homog(x1n)  # (..., P, 3)
    u = x2n[..., 0]
    v = x2n[..., 1]
    zero3 = jnp.zeros_like(h1)
    # Two DLT rows per correspondence, stacked along the point axis.
    r1 = jnp.concatenate([zero3, -h1, v[..., None] * h1], axis=-1)  # (..., P, 9)
    r2 = jnp.concatenate([h1, zero3, -u[..., None] * h1], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2P, 9)
    if w is not None:
        ww = jnp.concatenate([w, w], axis=-1)
        A = A * ww[..., None]
    ATA = jnp.einsum("...pi,...pj->...ij", A, A)
    # Fixed-iteration null-vector extraction (batched_linalg.py) — XLA eigh
    # is data-dependently slow on DLT spectra.
    hvec = smallest_eigvecs(ATA)[..., :, 0]
    Hn = hvec.reshape(*hvec.shape[:-1], 3, 3)
    # Denormalize: H = T2^-1 Hn T1 (adjugate: scale-free inverse).
    H = _adjugate3(T2) @ Hn @ T1
    nrm = jnp.linalg.norm(H, axis=(-2, -1), keepdims=True)
    H = H / jnp.maximum(nrm, 1e-12)
    return H * jnp.where(H[..., 2:3, 2:3] < 0, -1.0, 1.0)


def symmetric_transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """d(x2, H x1)^2 + d(x1, H^-1 x2)^2 per point, (..., P).

    The backward map uses the adjugate (projectively identical to H^-1, no
    division); points whose transfer lands near the plane at infinity get a
    huge, not NaN, error.
    """
    h1 = _homog(x1)
    h2 = _homog(x2)
    f = jnp.einsum("...ij,...pj->...pi", H, h1)
    b = jnp.einsum("...ij,...pj->...pi", _adjugate3(H), h2)
    fz = f[..., 2]
    bz = b[..., 2]
    big = jnp.float32(1e12)
    ef = jnp.where(
        jnp.abs(fz) > 1e-12,
        jnp.sum((f[..., :2] / jnp.where(jnp.abs(fz) > 1e-12, fz, 1.0)[..., None]
                 - x2) ** 2, axis=-1),
        big,
    )
    eb = jnp.where(
        jnp.abs(bz) > 1e-12,
        jnp.sum((b[..., :2] / jnp.where(jnp.abs(bz) > 1e-12, bz, 1.0)[..., None]
                 - x1) ** 2, axis=-1),
        big,
    )
    return ef + eb


class HomographyResult(NamedTuple):
    H: jnp.ndarray          # (3, 3) refined homography (x2 ~ H x1)
    inliers: jnp.ndarray    # (P,) bool
    n_inliers: jnp.ndarray  # scalar int
    score: jnp.ndarray      # scalar float — robust truncated-error support
    ok: jnp.ndarray         # scalar bool


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_homography(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    thr: float = 2e-4,
    n_hyp: int = 512,
    min_inliers: int = 12,
) -> HomographyResult:
    """Robust homography from normalized correspondences.

    x1, x2: (P, 2) normalized coords; mask: (P,) validity. ``thr`` is the
    symmetric-transfer threshold in squared normalized units (twice the
    single-direction tolerance of ransac_essential's Sampson ``thr``, since
    two transfers are summed). Same fixed-K batched-hypothesis structure as
    ransac_essential (SURVEY.md §8.2).
    """
    from fastmatch_tpu.geometry.ransac import _sample_minimal_sets

    p_count = mask.shape[0]
    if p_count < 4:
        return HomographyResult(
            H=jnp.eye(3), inliers=jnp.zeros(p_count, bool),
            n_inliers=jnp.int32(0), score=jnp.float32(0.0), ok=jnp.bool_(False),
        )
    idx = _sample_minimal_sets(key, mask, n_hyp, 4)  # (K, 4)
    Hs = dlt_homography(x1[idx], x2[idx])  # (K, 3, 3)
    errs = symmetric_transfer_error(Hs, x1[None], x2[None])  # (K, P)
    inl = (errs < thr) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    H0 = Hs[best]
    inl0 = inl[best]

    # Iterated weighted refit (see ransac.py: one refit leaves sample-draw
    # luck in the estimate; three rounds converge to the inlier LSQ fit).
    H, inliers = H0, inl0
    err = symmetric_transfer_error(H0, x1, x2)
    for _ in range(3):
        H1 = dlt_homography(x1, x2, w=inliers.astype(jnp.float32))
        err1 = symmetric_transfer_error(H1, x1, x2)
        inl1 = (err1 < thr) & mask
        better = jnp.sum(inl1) >= jnp.sum(inliers)
        H = jnp.where(better, H1, H)
        inliers = jnp.where(better, inl1, inliers)
        err = jnp.where(better, err1, err)

    n_in = jnp.sum(inliers)
    # Robust support score: truncated quadratic, comparable across models
    # (used by select_two_view_model's H-vs-E decision).
    score = jnp.sum(jnp.where(inliers, thr - jnp.minimum(err, thr), 0.0))
    return HomographyResult(
        H=H, inliers=inliers, n_inliers=n_in, score=score,
        ok=n_in >= min_inliers,
    )


def fix_homography_sign(H, x1, x2, inliers):
    """Scale-sign gauge fix before decomposition: for a physical
    correspondence both projective scales are positive, so h2^T H h1 > 0.
    DLT only fixes H up to sign; decompose_homography assumes the positive
    gauge (H ~ +(R + t n^T / d))."""
    h1 = _homog(x1)
    h2 = _homog(x2)
    dots = jnp.einsum("...pi,...ij,...pj->...p", h2, H, h1)
    vote = jnp.sum(jnp.where(inliers, jnp.sign(dots), 0.0), axis=-1)
    return H * jnp.where(vote < 0, -1.0, 1.0)[..., None, None]


def decompose_homography(H: jnp.ndarray):
    """H -> eight (R, t, n) candidates (Faugeras–Lustman SVD construction).

    For a calibrated homography H ~ R + t n^T / d (plane n . X = d > 0 in
    cam1, x2 ~ H x1), returns (Rs (8, 3, 3), ts (8, 3), ns (8, 3)) with
    |t| = d' (scale-free: t is recovered up to the plane distance, like the
    essential path's unit t). The first four candidates are the d' > 0
    family (cameras on the same side of the plane), the last four d' < 0.
    Pick with ``cheirality_vote`` — physically valid solutions have positive
    depths and n pointing toward cam1 (n_z > 0 for a plane in front).

    Near-pure-rotation inputs (all singular values equal) collapse every
    candidate to t ~ 0, R = H up to scale — still correct, just plane-normal
    ambiguous.
    """
    U, S, Vt = svd3(H)
    # Work in the frame where H^T H is diagonal; fold reflections into s.
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    s1 = S[..., 0] / S[..., 1]
    s3 = S[..., 2] / S[..., 1]
    # x1, x3 >= 0; denominators vanish only when s1 = s3 (pure rotation).
    den = jnp.maximum(s1**2 - s3**2, 1e-12)
    a = jnp.sqrt(jnp.maximum(s1**2 - 1.0, 0.0) / den)   # |n'_1|
    b = jnp.sqrt(jnp.maximum(1.0 - s3**2, 0.0) / den)   # |n'_3|

    def family(sign_d):
        # sign_d = +1: d' = +1 branch; -1: cameras straddle the plane.
        if sign_d > 0:
            sin_t = (s1 - s3) * a * b
            cos_t = (s1 * b**2 + s3 * a**2)
            t_par = (s1 - s3)
        else:
            sin_t = (s1 + s3) * a * b
            cos_t = (s3 * a**2 - s1 * b**2)
            t_par = (s1 + s3)
        Rs, ts, ns = [], [], []
        for e1 in (1.0, -1.0):
            st = e1 * sin_t
            n_p = jnp.stack([e1 * a, jnp.zeros_like(a), b], axis=-1)
            if sign_d > 0:
                Rp = jnp.stack(
                    [
                        jnp.stack([cos_t, jnp.zeros_like(st), -st], axis=-1),
                        jnp.stack([jnp.zeros_like(st), jnp.ones_like(st),
                                   jnp.zeros_like(st)], axis=-1),
                        jnp.stack([st, jnp.zeros_like(st), cos_t], axis=-1),
                    ],
                    axis=-2,
                )
                tp = t_par[..., None] * jnp.stack(
                    [e1 * a, jnp.zeros_like(a), -b], axis=-1)
            else:
                # d' < 0: R' is a rotation composed with diag(1, -1, -1).
                Rp = jnp.stack(
                    [
                        jnp.stack([cos_t, jnp.zeros_like(st), st], axis=-1),
                        jnp.stack([jnp.zeros_like(st), -jnp.ones_like(st),
                                   jnp.zeros_like(st)], axis=-1),
                        jnp.stack([st, jnp.zeros_like(st), -cos_t], axis=-1),
                    ],
                    axis=-2,
                )
                tp = t_par[..., None] * jnp.stack(
                    [e1 * a, jnp.zeros_like(a), b], axis=-1)
            for flip in (1.0, -1.0):
                # (R, t, n) and (R, -t, -n) describe the same H; emit both so
                # cheirality can pick the physical one.
                R = s[..., None, None] * (U @ Rp @ Vt)
                t = jnp.einsum("...ij,...j->...i", U, flip * tp)
                n = jnp.einsum("...ji,...j->...i", Vt, flip * n_p)
                Rs.append(R)
                ts.append(t)
                ns.append(n)
        return Rs, ts, ns

    Rp, tp, npos = family(+1)
    Rn, tn, nneg = family(-1)
    Rs = jnp.stack(Rp + Rn, axis=-3)
    ts = jnp.stack(tp + tn, axis=-2)
    ns = jnp.stack(npos + nneg, axis=-2)

    # (Near-)pure rotation: s1 ~ s3 makes a, b -> 0/0 and the trig formulas
    # collapse to a spurious 90-degree rotation. The exact solution there is
    # H/s2 itself, orthogonalized: R = s U V^T, t = 0 (plane normal is
    # unobservable; keep the formula's n). Bootstrap still (correctly)
    # rejects these poses — zero parallax triangulates nothing.
    deg = (s1 - s3) < 1e-6
    R_polar = s[..., None, None] * (U @ Vt)
    Rs = jnp.where(deg[..., None, None, None], R_polar[..., None, :, :], Rs)
    ts = jnp.where(deg[..., None, None], jnp.zeros_like(ts), ts)
    return Rs, ts, ns


def cheirality_vote(Rs, ts, ns, x1, x2, inliers):
    """Pick the (R, t, n) candidate with the most inlier points at positive
    depth in both cameras AND in front of the plane (n . h(x1) > 0).

    Returns (best_index, votes (C,)).
    """
    d1, d2 = jax.vmap(lambda R, t: triangulate_midpoint(R, t, x1, x2))(Rs, ts)
    h1 = _homog(x1)  # (P, 3)
    front = jnp.einsum("cpj,cj->cp", jnp.broadcast_to(h1[None], (ns.shape[0],) + h1.shape), ns) > 0
    votes = jnp.sum((d1 > 0) & (d2 > 0) & front & inliers[None, :], axis=1)
    return jnp.argmax(votes), votes


class TwoViewModel(NamedTuple):
    R: jnp.ndarray          # (3, 3) winning relative rotation
    t: jnp.ndarray          # (3,) translation (unit for E, |t|=d' scale for H)
    inliers: jnp.ndarray    # (P,) bool of the winning model
    n_inliers: jnp.ndarray  # scalar int
    used_homography: jnp.ndarray  # scalar bool
    ok: jnp.ndarray         # scalar bool
    # Planar two-fold ambiguity (homography only): two views of a plane admit
    # TWO fully-consistent (R, t, n) interpretations — no amount of 2-view
    # data separates them; a third view does. When ``ambiguous``, (R_alt,
    # t_alt) is the runner-up interpretation and the caller should
    # disambiguate against another frame (pipeline/reconstruct.py does).
    R_alt: jnp.ndarray      # (3, 3)
    t_alt: jnp.ndarray      # (3,)
    ambiguous: jnp.ndarray  # scalar bool


@partial(jax.jit, static_argnames=("n_hyp",))
def select_two_view_model(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    thr: float = 1e-4,
    n_hyp: int = 512,
    min_inliers: int = 15,
    h_bias: float = 0.82,
) -> TwoViewModel:
    """Two-view bootstrap with H-vs-E model selection.

    Runs ransac_essential and ransac_homography on the same correspondences
    and picks the homography pose when its inlier support reaches ``h_bias``
    of the essential's — the regime where the scene is planar or the motion
    near-rotational, and the essential solve is degenerate even though its
    Sampson inlier count stays high (every point on a plane satisfies many
    E's). Mirrors the classic SH/(SH+SF) heuristic with inlier counts as the
    robust score.
    """
    from fastmatch_tpu.geometry.ransac import ransac_essential

    ke, kh = jax.random.split(key)
    re_ = ransac_essential(ke, x1, x2, mask, thr=thr, n_hyp=n_hyp,
                           min_inliers=min_inliers)
    rh = ransac_homography(kh, x1, x2, mask, thr=2.0 * thr, n_hyp=n_hyp,
                           min_inliers=min_inliers)

    Hfix = fix_homography_sign(rh.H, x1, x2, rh.inliers)
    Rs, ts, ns = decompose_homography(Hfix)
    bi, votes = cheirality_vote(Rs, ts, ns, x1, x2, rh.inliers)
    h_pose_ok = votes[bi] > 0.6 * jnp.maximum(rh.n_inliers, 1)
    tH = ts[bi]
    tH_n = tH / jnp.maximum(jnp.linalg.norm(tH), 1e-12)

    # Runner-up with a DIFFERENT rotation: the (R, -t, -n) twin of the winner
    # shares its R (and is killed by the plane-visibility vote anyway), so
    # mask out candidates rotationally identical to the winner before taking
    # the second-best. Near-equal votes = the planar two-fold ambiguity.
    same_R = jnp.max(jnp.abs(Rs - Rs[bi][None]), axis=(-2, -1)) < 1e-3
    votes_alt = jnp.where(same_R, -1, votes)
    ai = jnp.argmax(votes_alt)
    tA = ts[ai]
    tA_n = tA / jnp.maximum(jnp.linalg.norm(tA), 1e-12)
    ambiguous = votes_alt[ai] >= 0.75 * jnp.maximum(votes[bi], 1)

    use_h = rh.ok & h_pose_ok & (
        (~re_.ok) | (rh.n_inliers >= h_bias * re_.n_inliers)
    )
    return TwoViewModel(
        R=jnp.where(use_h, Rs[bi], re_.R),
        t=jnp.where(use_h, tH_n, re_.t),
        inliers=jnp.where(use_h, rh.inliers, re_.inliers),
        n_inliers=jnp.where(use_h, rh.n_inliers, re_.n_inliers),
        used_homography=use_h,
        ok=jnp.where(use_h, rh.ok, re_.ok),
        R_alt=Rs[ai],
        t_alt=tA_n,
        ambiguous=use_h & ambiguous,
    )


def homography_from_pose(R, t, n, d):
    """H ~ R + t n^T / d for plane n . X = d in cam1 (test oracle)."""
    return R + jnp.einsum("...i,...j->...ij", t, n) / d
