"""Batched-hypothesis RANSAC for the essential matrix (component T10).

TPU-first RANSAC (SURVEY.md §8.2 "RANSAC without data-dependent control
flow"): K hypotheses are sampled, solved, and scored **in parallel** with
``vmap`` — no early exit; K is chosen for the worst-case inlier ratio (a
FLOP trade, not a correctness one). Winner by masked inlier count, then pose
recovery with cheirality voting, then a final weighted 8-point refit on the
winning inlier set.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.geometry.epipolar import (
    decompose_essential,
    eight_point_essential,
    sampson_error,
    triangulate_midpoint,
)


class RansacResult(NamedTuple):
    R: jnp.ndarray          # (3, 3) relative rotation (x2 = R x1 + t)
    t: jnp.ndarray          # (3,) unit translation
    E: jnp.ndarray          # (3, 3) refined essential
    inliers: jnp.ndarray    # (P,) bool
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray         # scalar bool — enough inliers to trust the pose


def _sample_minimal_sets(key, mask, n_hyp, sample_size):
    """(n_hyp, sample_size) indices drawn from valid entries.

    Gumbel-top-k per hypothesis: add iid Gumbel noise to the (masked) scores
    and take top-k — samples without replacement, no dynamic shapes.
    """
    p = mask.shape[0]
    g = jax.random.gumbel(key, (n_hyp, p))
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


@partial(jax.jit, static_argnames=("n_hyp", "solver"))
def ransac_essential(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    thr: float = 1e-4,
    n_hyp: int = 512,
    min_inliers: int = 15,
    solver: str = "8pt",
) -> RansacResult:
    """Estimate relative pose from normalized correspondences.

    x1, x2: (P, 2) normalized coords; mask: (P,) validity. ``thr`` is the
    squared Sampson-error threshold in normalized units ((px_err/f)^2-ish).
    Fewer candidates than the minimal sample returns ok=False instead of
    crashing (tracking code treats that as "estimation failed").

    ``solver``: "8pt" (default) or "5pt" (geometry/five_point.py — the true
    minimal sample: K samples each yield up to 16 candidate E's, scored as
    one 16K batch; use it when the inlier ratio is low, since K for a
    target confidence scales like w^-5 instead of w^-8).
    """
    p_count = mask.shape[0]
    min_sample = 5 if solver == "5pt" else 8
    if p_count < min_sample:
        return RansacResult(
            R=jnp.eye(3), t=jnp.zeros(3), E=jnp.zeros((3, 3)),
            inliers=jnp.zeros(p_count, bool), n_inliers=jnp.int32(0),
            ok=jnp.bool_(False),
        )
    if solver == "5pt":
        from fastmatch_tpu.geometry.five_point import five_point_essential

        idx = _sample_minimal_sets(key, mask, n_hyp, 5)  # (K, 5)
        Es, cand_ok = five_point_essential(x1[idx], x2[idx])  # (K, 16, 3, 3)
        Es = Es.reshape(-1, 3, 3)
        cand_ok = cand_ok.reshape(-1)
        errs = sampson_error(Es, x1[None], x2[None])  # (16K, P)
        inl = (errs < thr) & mask[None, :] & cand_ok[:, None]
    else:
        idx = _sample_minimal_sets(key, mask, n_hyp, 8)  # (K, 8)
        Es = eight_point_essential(x1[idx], x2[idx])  # (K, 3, 3)
        errs = sampson_error(Es, x1[None], x2[None])  # (K, P)
        inl = (errs < thr) & mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E0 = Es[best]
    inl0 = inl[best]

    # Iterated refit on the winning inlier set (weighted 8-point), keeping
    # each round only if it doesn't lose support. One linear refit leaves
    # the pose at the mercy of the minimal-sample draw (~6x spread in
    # rotation error measured on identical inputs across RNG streams);
    # three refit/rescore rounds converge to the inlier-set least-squares
    # fit regardless of which sample won.
    E, inliers = E0, inl0
    for _ in range(3):
        E1 = eight_point_essential(x1, x2, w=inliers.astype(jnp.float32))
        err1 = sampson_error(E1, x1, x2)
        inl1 = (err1 < thr) & mask
        better = jnp.sum(inl1) >= jnp.sum(inliers)
        E = jnp.where(better, E1, E)
        inliers = jnp.where(better, inl1, inliers)

    # Pose recovery: 4 candidates, cheirality vote over inliers.
    Rs, ts = decompose_essential(E)  # (4, 3, 3), (4, 3)
    d1, d2 = jax.vmap(lambda R, t: triangulate_midpoint(R, t, x1, x2))(Rs, ts)
    votes = jnp.sum((d1 > 0) & (d2 > 0) & inliers[None, :], axis=1)  # (4,)
    b = jnp.argmax(votes)
    n_in = jnp.sum(inliers)
    return RansacResult(
        R=Rs[b],
        t=ts[b],
        E=E,
        inliers=inliers,
        n_inliers=n_in,
        ok=(n_in >= min_inliers) & (votes[b] > 0.6 * jnp.maximum(n_in, 1)),
    )
