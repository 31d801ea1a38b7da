"""Geometric verification of putative matches.

The matcher (ratio + cross-check) is appearance-only; this filter keeps only
the matches consistent with a single two-view geometric model, fitted
robustly. This is the standard post-match precision boost the reference's
evaluation layer scores (SURVEY.md §3.1 — matches vs ground-truth
correspondences), implemented here the framework way: one batched RANSAC
over the padded match arrays, no dynamic shapes.

Models:
- "fundamental" — uncalibrated pairs (pixel coords straight in). Default.
- "homography" — planar scenes / pure rotation.
- "essential" — calibrated pairs; requires focal + principal point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Keypoints, Matches


class VerifyResult(NamedTuple):
    matches: Matches        # input matches with valid &= model inliers
    model: jnp.ndarray      # (3, 3) fitted F / H / E
    n_inliers: jnp.ndarray  # scalar int
    ok: jnp.ndarray         # scalar bool — model is trustworthy; if False,
    #                         ``matches`` passes through UNFILTERED


def verify_matches(
    key: jax.Array,
    kp_a: Keypoints,
    kp_b: Keypoints,
    matches: Matches,
    model: str = "fundamental",
    thr_px: float = 3.0,
    n_hyp: int = 512,
    min_inliers: int = 15,
    focal: float | None = None,
    pp: tuple[float, float] = (0.0, 0.0),
) -> VerifyResult:
    """Keep matches consistent with one robustly-fitted two-view model.

    The paired coordinates (xy_a[i], xy_b[matches.idx[i]]) for valid slots
    feed a fixed-K RANSAC; invalid slots are masked, never gathered into
    minimal samples. When the model cannot be trusted (ok=False — e.g. too
    few matches, degenerate scene) the original matches pass through
    unfiltered rather than silently dropping everything.
    """
    xa = kp_a.xy
    xb = kp_b.xy[matches.idx]  # padded gather; masked below
    valid = matches.valid & kp_a.mask

    if model == "fundamental":
        from fastmatch_tpu.geometry.fundamental import ransac_fundamental

        res = ransac_fundamental(key, xa, xb, valid, thr=thr_px**2,
                                 n_hyp=n_hyp, min_inliers=min_inliers)
        M, inl = res.F, res.inliers
    elif model == "homography":
        from fastmatch_tpu.geometry.homography import ransac_homography

        res = ransac_homography(key, xa, xb, valid, thr=2.0 * thr_px**2,
                                n_hyp=n_hyp, min_inliers=min_inliers)
        M, inl = res.H, res.inliers
    elif model == "essential":
        if focal is None:
            raise ValueError("model='essential' requires focal")
        from fastmatch_tpu.geometry.ransac import ransac_essential

        c = jnp.asarray(pp, jnp.float32)
        res = ransac_essential(key, (xa - c) / focal, (xb - c) / focal,
                               valid, thr=(thr_px / focal) ** 2,
                               n_hyp=n_hyp, min_inliers=min_inliers)
        M, inl = res.E, res.inliers
    else:
        raise ValueError(f"unknown verification model {model!r}")

    keep = jnp.where(res.ok, valid & inl, valid)
    out = Matches(
        idx=matches.idx,
        dist=jnp.where(keep, matches.dist, jnp.float32(jnp.inf)),
        valid=keep,
    )
    return VerifyResult(matches=out, model=M,
                        n_inliers=res.n_inliers, ok=res.ok)
