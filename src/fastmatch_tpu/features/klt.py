"""Pyramidal Lucas-Kanade (KLT) feature tracking as XLA ops.

Third front-end family next to SIFT (features/sift.py) and ORB
(features/orb.py): instead of detect-describe-match, consecutive frames
are related by DIRECT photometric tracking — the classical SLAM/odometry
front-end for video-rate sequences, where descriptor matching is
overkill (the reference genre matches wide-baseline pairs; tracking is
the complementary small-baseline capability a SLAM product needs). No
reference counterpart file:line exists — the mount is empty
(SURVEY.md §0); spec is BASELINE.json:5's frames/s/chip matching axis.

TPU-first mapping of the classical algorithm:

- **No per-sample gathers.** The textbook inner loop bilinearly samples
  the target window at a fresh fractional offset every iteration — a
  scalar-gather storm that runs at the measured ~300-500 MB/s TPU
  random-access floor (docs/PERFORMANCE.md). Here each point fetches TWO
  integer-aligned patches per pyramid level (template + an enlarged
  target patch covering the search margin) through the same path as the
  SIFT stages — `features.sift._extract_patches`, i.e. the Pallas
  VMEM-resident gather on TPU — and every subsequent resample is a pair
  of per-axis hat-function weight matmuls against those patches (the
  sift.py descriptor idiom: bilinear interpolation at coordinate c
  equals sum_p relu(1 - |c - p|) * patch[p]). The LK iterations touch
  HBM zero times.
- **Fixed iteration counts everywhere** (`lax.fori_loop` per level,
  static level loop): no data-dependent convergence tests, one compiled
  program per (capacity, image shape).
- **Batched 2x2 solves in closed form**: the spatial-gradient matrix G
  is inverted per point with the cofactor formula; degenerate windows
  (min-eigenvalue gate, the Shi-Tomasi "goodness" measure) zero their
  update and are flagged invalid rather than branching.
- **Detection**: `shi_tomasi` scores min-eig(G) over the whole image
  with separable box sums (pure conv/VPU work), 3x3 reduce_window NMS,
  masked top_k — the orb.py/sift.py selection idiom at fixed capacity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fastmatch_tpu.core.containers import Keypoints
from fastmatch_tpu.features.sift import _blur, _extract_patches


class KLTConfig(NamedTuple):
    levels: int = 3            # pyramid levels (coarsest tracks 4x-downscaled)
    win: int = 11              # odd tracking window side, pixels
    iters: int = 8             # LK iterations per level (fixed count)
    margin: int = 6            # target-patch slack around the estimate, px/level
    min_eig: float = 1e-4      # Shi-Tomasi gate on G's min eigenvalue (per px;
                               # cv2 minEigThreshold default)
    max_residual: float = 0.06 # mean |T - J| on [0,1] images for a live track
    blur_sigma: float = 1.0    # pre-downsample anti-alias blur


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_pyramid(img: jnp.ndarray, cfg: KLTConfig = KLTConfig()):
    """(H, W) [0,1] grayscale -> list of ``cfg.levels`` images, coarse last.

    Level l is blurred with ``blur_sigma`` then 2x-subsampled from level
    l-1 (the cv2 buildOpticalFlowPyramid convention, minus the border
    replication — patch clamping handles borders here). Jitted with the
    config static: the eager version dispatched every shift-add of the
    blur separately through the TPU relay — a measured 135 ms/frame of
    pure dispatch overhead for ~1 ms of device work."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(1, cfg.levels):
        img = _blur(img, cfg.blur_sigma)[::2, ::2]
        pyr.append(img)
    return pyr


def _hat(c: jnp.ndarray, size: int) -> jnp.ndarray:
    """(S,) coords -> (S, size) bilinear weight rows: relu(1 - |c - p|)."""
    p = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - p[None, :]))


def _round8(v: int) -> int:
    return v + (-v) % 8


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_pyramids(prev_pyr, next_pyr, pts: jnp.ndarray, mask: jnp.ndarray,
                   cfg: KLTConfig = KLTConfig()):
    """Track ``pts`` (C, 2) xy pixels from prev to next.

    Returns (new_pts (C, 2), status (C,) bool, err (C,) f32): ``status``
    is mask AND textured-window AND converged-in-bounds AND photometric
    residual under ``cfg.max_residual``; ``err`` is the final mean
    absolute residual (BIG-free: invalid rows report their raw value).
    """
    win = cfg.win
    K = pts.shape[0]
    # Centered sample offsets: template grid carries a +-1 gradient margin.
    ut = jnp.arange(win + 2, dtype=jnp.float32) - (win + 1) / 2.0
    uw = jnp.arange(win, dtype=jnp.float32) - (win - 1) / 2.0
    PT = _round8(win + 4)                      # template patch side
    PB = _round8(win + 2 * cfg.margin + 2)     # target patch side

    flow = jnp.zeros_like(pts)
    ok_eig = jnp.ones((K,), bool)
    err = jnp.zeros((K,), jnp.float32)

    for l in range(cfg.levels - 1, -1, -1):
        prev_l, next_l = prev_pyr[l], next_pyr[l]
        H, W = prev_l.shape
        # Tiny coarse levels: patches cannot exceed the image (round down
        # to the sublane multiple; 8 px still fits a shrunk window).
        PT_l = min(PT, (min(H, W) // 8) * 8)
        PB_l = min(PB, (min(H, W) // 8) * 8)
        ptl = pts * (0.5 ** l)

        # --- template: one aligned patch per point, then hat-matmul grids
        cx = jnp.clip(jnp.round(ptl[:, 0]).astype(jnp.int32) - PT_l // 2, 0,
                      max(W - PT_l, 0))
        cy = jnp.clip(jnp.round(ptl[:, 1]).astype(jnp.int32) - PT_l // 2, 0,
                      max(H - PT_l, 0))
        tp = _extract_patches(prev_l[None], jnp.zeros((K,), jnp.int32), cy, cx,
                              PT_l)

        qx = jnp.clip(jnp.round(ptl[:, 0] + flow[:, 0]).astype(jnp.int32)
                      - PB_l // 2, 0, max(W - PB_l, 0))
        qy = jnp.clip(jnp.round(ptl[:, 1] + flow[:, 1]).astype(jnp.int32)
                      - PB_l // 2, 0, max(H - PB_l, 0))
        tq = _extract_patches(next_l[None], jnp.zeros((K,), jnp.int32), qy, qx,
                              PB_l)

        def one(p, g, patch_t, patch_q, ox, oy, qox, qoy, PT=PT_l, PB=PB_l):
            rx = jnp.clip(p[0] - ox, 0.5, PT - 1.5)
            ry = jnp.clip(p[1] - oy, 0.5, PT - 1.5)
            ty2 = _hat(jnp.clip(ry + ut, 0.5, PT - 1.5), PT) @ patch_t
            t2 = ty2 @ _hat(jnp.clip(rx + ut, 0.5, PT - 1.5), PT).T
            T = t2[1:-1, 1:-1]                       # (win, win)
            Ix = 0.5 * (t2[1:-1, 2:] - t2[1:-1, :-2])
            Iy = 0.5 * (t2[2:, 1:-1] - t2[:-2, 1:-1])
            gxx = jnp.sum(Ix * Ix)
            gxy = jnp.sum(Ix * Iy)
            gyy = jnp.sum(Iy * Iy)
            mineig = 0.5 * (gxx + gyy
                            - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy))
            det = gxx * gyy - gxy * gxy
            good = (mineig / (win * win)) > cfg.min_eig
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

            def sample_j(d):
                jx = jnp.clip(p[0] + d[0] - qox + uw, 0.5, PB - 1.5)
                jy = jnp.clip(p[1] + d[1] - qoy + uw, 0.5, PB - 1.5)
                return _hat(jy, PB) @ patch_q @ _hat(jx, PB).T

            def body(_, d):
                r = T - sample_j(d)
                bx = jnp.sum(r * Ix)
                by = jnp.sum(r * Iy)
                dx = inv_det * (gyy * bx - gxy * by)
                dy = inv_det * (gxx * by - gxy * bx)
                # Clamp per-iteration steps: a divergent window must not
                # fling the estimate outside the gathered target patch.
                # Degenerate windows have inv_det == 0 and step 0 — the
                # min-eig gate is a QUALITY flag (applied at the finest
                # level), not an update freeze: a blurred coarse level
                # below the texture threshold must still contribute its
                # motion prior or large displacements never converge.
                step = jnp.clip(jnp.stack([dx, dy]), -cfg.margin, cfg.margin)
                # ... and the TOTAL drift from the level's prior stays
                # within the patch: beyond it samples clamp to the border
                # and updates are noise — let the residual gate flag it
                # instead of letting the estimate run away unbounded.
                return g + jnp.clip(d + step - g, -(cfg.margin + 1.0),
                                    cfg.margin + 1.0)

            d = jax.lax.fori_loop(0, cfg.iters, body, g)
            resid = jnp.mean(jnp.abs(T - sample_j(d)))
            return d, good, resid

        flow, good_l, err = jax.vmap(one)(
            ptl, flow, tp, tq, cx.astype(jnp.float32), cy.astype(jnp.float32),
            qx.astype(jnp.float32), qy.astype(jnp.float32))
        if l == 0:
            # Only the finest level's texture gate is fatal: a blurred
            # coarse window just freezes its update (good=False above),
            # which the finer levels then refine from a zero prior —
            # matching cv2's behavior of filtering on the final level.
            ok_eig = ok_eig & good_l
        if l > 0:
            flow = flow * 2.0

    new_pts = pts + flow
    H0, W0 = prev_pyr[0].shape
    b = win / 2.0 + 1.0
    in_bounds = ((new_pts[:, 0] >= b) & (new_pts[:, 0] <= W0 - 1 - b)
                 & (new_pts[:, 1] >= b) & (new_pts[:, 1] <= H0 - 1 - b))
    status = mask & ok_eig & in_bounds & (err < cfg.max_residual)
    return new_pts, status, err


def track(prev_img: jnp.ndarray, next_img: jnp.ndarray, pts: jnp.ndarray,
          mask: jnp.ndarray, cfg: KLTConfig = KLTConfig()):
    """Convenience wrapper: build both pyramids and track (see
    ``track_pyramids``; reuse pyramids across a sequence when tracking
    frame t -> t+1 -> t+2 ...)."""
    return track_pyramids(build_pyramid(prev_img, cfg),
                          build_pyramid(next_img, cfg), pts, mask, cfg)


@functools.partial(jax.jit, static_argnames=("capacity", "win", "min_dist"))
def shi_tomasi(img: jnp.ndarray, capacity: int = 1024, win: int = 5,
               min_dist: int = 3) -> Keypoints:
    """Good-features-to-track: min-eig of the structure tensor, NMS, top-k.

    (H, W) [0,1] grayscale -> Keypoints at ``capacity`` (score = min-eig
    response per pixel; masked rows zero). ``win``: box window for the
    gradient sums; ``min_dist``: NMS suppression radius in pixels.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape
    gx = 0.5 * (jnp.pad(img, ((0, 0), (0, 1)), mode="edge")[:, 1:]
                - jnp.pad(img, ((0, 0), (1, 0)), mode="edge")[:, :-1])
    gy = 0.5 * (jnp.pad(img, ((0, 1), (0, 0)), mode="edge")[1:, :]
                - jnp.pad(img, ((1, 0), (0, 0)), mode="edge")[:-1, :])

    def box(x):
        # Separable win x win box sum via two cumsum differences.
        for axis in (0, 1):
            pad = [(0, 0), (0, 0)]
            pad[axis] = (win // 2 + 1, win // 2)
            c = jnp.cumsum(jnp.pad(x, pad), axis=axis)
            x = (jax.lax.slice_in_dim(c, win, c.shape[axis], axis=axis)
                 - jax.lax.slice_in_dim(c, 0, c.shape[axis] - win, axis=axis))
        return x

    gxx, gxy, gyy = box(gx * gx), box(gx * gy), box(gy * gy)
    score = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy))
    # Kill the border band where windows hang off the image.
    r = win // 2 + 1
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    interior = ((yy >= r) & (yy < H - r) & (xx >= r) & (xx < W - r))
    score = jnp.where(interior, score, 0.0)
    k = 2 * min_dist + 1
    pooled = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (k, k),
                                   (1, 1), "SAME")
    flat = jnp.where((score >= pooled) & (score > 0), score, 0.0).reshape(-1)
    vals, idx = jax.lax.top_k(flat, capacity)
    m = vals > 0
    xy = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], axis=1)
    return Keypoints(xy=jnp.where(m[:, None], xy, 0.0),
                     scale=jnp.full((capacity,), float(win), jnp.float32),
                     angle=jnp.zeros((capacity,), jnp.float32),
                     score=jnp.where(m, vals, 0.0), mask=m)


def track_pair(img0: jnp.ndarray, img1: jnp.ndarray,
               cfg: KLTConfig = KLTConfig(), capacity: int = 1024):
    """Detect Shi-Tomasi corners on img0 and KLT-track them into img1.

    Returns (pts0 (C, 2), pts1 (C, 2), status (C,), err (C,)) — the
    flow-based analog of detect+match, directly consumable by
    geometry.ransac_essential / homography as correspondences.
    """
    kps = shi_tomasi(jnp.asarray(img0), capacity=capacity)
    pts1, status, err = track(jnp.asarray(img0), jnp.asarray(img1),
                              kps.xy, kps.mask, cfg)
    return kps.xy, pts1, status, err
