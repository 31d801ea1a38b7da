"""Dense rectified-stereo depth as XLA ops: cost-volume block matching.

Dense reconstruction layer over the sparse SLAM/SfM engine: keyframe
pairs (or a calibrated stereo rig) -> per-pixel disparity/depth ->
dense colored point clouds through utils/export.save_ply. No reference
counterpart exists — the mount is empty (SURVEY.md §0); this extends the
engine along BASELINE.json:5's "map blocks" axis with dense geometry.

TPU-first design — the cost volume never gathers:

- **Disparity hypotheses are lane rolls.** For rectified pairs,
  correspondence search is 1-D along scan lines, so warping the right
  image by disparity d is ``jnp.roll(right, d, axis=1)`` — a register
  shuffle, not a gather. The D-deep cost volume is D shifted elementwise
  ops, pure VPU work on (H, W) planes (the classic plane-sweep becomes a
  shift-sweep; compare features/klt.py where 2-D warps need patches).
- **Window aggregation by prefix sums.** ZNCC/SSD over a (w, w) window
  is separable box filtering: two cumsum-difference passes per plane
  (the features/klt.py shi_tomasi idiom), O(1) per pixel regardless of
  window size.
- **ZNCC cost** (zero-mean normalized cross-correlation): illumination-
  invariant, bounded [-1, 1]; built from 5 box-filtered moment planes.
- **Winner-take-all + quadratic subpixel** on the cost parabola through
  the best disparity's neighbors (the sift.py extrema-refinement trick).
- **Left-right consistency by roll-back**: the right image's disparity
  map is computed from the SAME cost volume (cost[d] rolled by d is the
  right-referenced cost at d), so occlusion checking costs one extra
  argmin, not a second sweep.
- Everything static-shape; `lax.fori_loop` over the disparity axis keeps
  the compiled program small (an unrolled Python loop multiplied compile
  time at D=128 with no runtime win).

``rectify_pair`` brings an arbitrary calibrated two-view pair into this
scan-line geometry (Fusiello-style rectification; its one bilinear
resample per image is the module's only gather, coherent and one-time).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StereoConfig(NamedTuple):
    max_disp: int = 64         # disparity hypotheses [0, max_disp)
    win: int = 9               # odd aggregation window side
    lr_tol: float = 1.25       # left-right consistency tolerance, px
    min_zncc: float = 0.5      # cost gate: best ZNCC must exceed this
    min_std: float = 0.01      # window contrast gate: textureless windows
                               # give 0/0 ZNCC noise, not low scores
    uniq: float = 1.02         # uniqueness: 2nd best cost >= uniq * best
                               # (2nd best taken outside +-1 of the winner)


def _box(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(..., H, W) -> same-shape (win, win) box SUM (edge-truncated)."""
    for axis in (-2, -1):
        n = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (win // 2 + 1, win // 2)
        c = jnp.cumsum(jnp.pad(x, pad), axis=axis)
        x = (jax.lax.slice_in_dim(c, win, c.shape[axis], axis=axis)
             - jax.lax.slice_in_dim(c, 0, c.shape[axis] - win, axis=axis))
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_disparity(left: jnp.ndarray, right: jnp.ndarray,
                     cfg: StereoConfig = StereoConfig()):
    """(H, W) rectified grayscale pair -> (disp (H, W) f32, valid (H, W)).

    Disparity convention: left pixel (y, x) matches right pixel
    (y, x - d), d in [0, cfg.max_disp). Invalid pixels (failed
    cost/uniqueness/LR gates, d-range leaving the image) report disp 0.
    """
    L = left.astype(jnp.float32)
    R = right.astype(jnp.float32)
    H, W = L.shape
    win, D = cfg.win, cfg.max_disp
    n = float(win * win)

    # Left-image moments (shared across hypotheses), and the right
    # image's moments computed ONCE: box(roll(R, d)) == roll(box(R), d)
    # exactly wherever the window doesn't straddle the wrap seam or the
    # image border — and every such column is already masked (left side
    # by the xs >= d + win//2 range gate; the rolled-in right-border
    # truncated sums land at x < d and are gated too). Hoisting sR/sRR
    # removes 2 of the 3 box filters from the D-deep sweep.
    sL = _box(L, win)
    sLL = _box(L * L, win)
    varL = jnp.maximum(sLL - sL * sL / n, 1e-8)
    sR0 = _box(R, win)
    varR0 = jnp.maximum(_box(R * R, win) - sR0 * sR0 / n, 1e-8)

    xs = jnp.arange(W)

    def cost_at(d):
        """ZNCC of L vs right-shifted-by-d, plus in-range mask."""
        Rd = jnp.roll(R, d, axis=1)
        sR = jnp.roll(sR0, d, axis=1)
        varR = jnp.roll(varR0, d, axis=1)
        sLR = _box(L * Rd, win)
        cov = sLR - sL * sR / n
        zncc = cov * jax.lax.rsqrt(varL * varR)
        return jnp.where(xs[None, :] >= d + win // 2, zncc, -2.0)

    # Streamed winner-take-all: running best/second/neighbor costs instead
    # of a materialized (D, H, W) volume (at 640x480xD=128 the volume is
    # 157 MB — HBM-bound for no reason; the stream keeps 8 (H, W) planes
    # live and the compiled loop is D VPU sweeps).
    def body(d, c):
        (b1, d1, b2, prevc, at_m1, at_p1) = c
        z = cost_at(d)
        better = z > b1
        # Second best EXCLUDING the winner's +-1 neighborhood (those form
        # the subpixel parabola, not a competing hypothesis).
        far = jnp.abs(d - d1) > 1
        b2 = jnp.where(better, jnp.where(jnp.abs(d1 - d) > 1, b1, b2),
                       jnp.where((z > b2) & far, z, b2))
        # Parabola neighbors: cost at d1-1 (the plane before the winner)
        # and d1+1 (the plane right after; captured when d == d1 + 1).
        at_m1 = jnp.where(better, prevc, at_m1)
        at_p1 = jnp.where(d == d1 + 1, z, at_p1)
        b1 = jnp.where(better, z, b1)
        d1 = jnp.where(better, d, d1)
        return (b1, d1, b2, z, at_m1, at_p1)

    neg = jnp.full((H, W), -2.0)
    b1, d1, b2, _, cm1, cp1 = jax.lax.fori_loop(
        0, D, body, (neg, jnp.zeros((H, W), jnp.int32), neg, neg, neg, neg))

    # Subpixel: parabola through (cm1, b1, cp1); clamp at the range ends.
    denom = cm1 - 2.0 * b1 + cp1
    off = jnp.where(jnp.abs(denom) > 1e-9,
                    0.5 * (cm1 - cp1) / jnp.where(jnp.abs(denom) > 1e-9,
                                                  denom, 1.0), 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    interior = (d1 > 0) & (d1 < D - 1)
    disp = d1.astype(jnp.float32) + jnp.where(interior, off, 0.0)

    # Right-referenced disparity from the same winners, by scatter-free
    # voting: right pixel x matches left pixel x + d; rolling the LEFT
    # winner plane by -d aligns its claims onto right coordinates.
    def rbody(d, c):
        rb1, rd1 = c
        claims = jnp.roll(jnp.where(d1 == d, b1, -2.0), -d, axis=1)
        claims = jnp.where(xs[None, :] < W - d, claims, -2.0)
        better = claims > rb1
        return jnp.where(better, claims, rb1), jnp.where(better, d, rd1)

    _, rd1 = jax.lax.fori_loop(
        0, D, rbody, (neg, jnp.zeros((H, W), jnp.int32)))
    # LR check: left (y, x) with disparity d must be the pixel that right
    # (y, x - d) claims. Gather-free: roll rd1 back by +d per hypothesis
    # is equivalent to comparing d1 against rd1 sampled at x - d1; use a
    # one-hot select over the D-loop instead.
    def lrbody(d, acc):
        rhs = jnp.roll(rd1, d, axis=1)          # rd1[y, x - d]
        return jnp.where(d1 == d, rhs, acc)

    rd_at = jax.lax.fori_loop(0, D, lrbody, jnp.zeros((H, W), jnp.int32))
    lr_ok = jnp.abs(rd_at - d1) <= cfg.lr_tol

    valid = (b1 > cfg.min_zncc) & ((b2 < -1.5) | (b2 <= b1 / cfg.uniq))
    valid = valid & (varL / n > cfg.min_std ** 2)
    valid = valid & lr_ok & (xs[None, :] >= disp + win // 2)
    border = win // 2
    yy = jnp.arange(H)[:, None]
    valid = valid & (yy >= border) & (yy < H - border) \
        & (xs[None, :] < W - border)
    return jnp.where(valid, disp, 0.0), valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_batch(left: jnp.ndarray, right: jnp.ndarray,
                 cfg: StereoConfig = StereoConfig()):
    """Batched sweep: (B, H, W) pairs -> ((B, H, W) disp, (B, H, W) valid).

    vmap of ``stereo_disparity`` — data-parallel over pairs. Multi-chip:
    shard the batch axis (``dist.mesh.batch_sharding``) and jit
    partitions it with zero collectives (each pair's sweep is
    self-contained); tested on the 8-device CPU mesh in test_stereo.
    """
    return jax.vmap(lambda l, r: stereo_disparity(l, r, cfg))(left, right)


def depth_from_disparity(disp: jnp.ndarray, valid: jnp.ndarray, fx: float,
                         baseline: float):
    """disp (H, W) px -> depth (H, W) along the rectified z axis."""
    return jnp.where(valid & (disp > 1e-3),
                     fx * baseline / jnp.maximum(disp, 1e-3), 0.0)


def disparity_to_points(disp, valid, K: np.ndarray, baseline: float,
                        image: np.ndarray | None = None,
                        stride: int = 2, max_depth: float = np.inf):
    """Disparity map -> (N, 3) points (+ (N,) intensities) in the rectified
    left-camera frame, subsampled by ``stride`` (host-side packaging for
    utils/export.save_ply)."""
    disp = np.asarray(disp)[::stride, ::stride]
    valid = np.asarray(valid)[::stride, ::stride]
    H, W = disp.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = np.where(valid & (disp > 1e-3), fx * baseline
                 / np.maximum(disp, 1e-3), 0.0)
    keep = valid & (z > 0) & (z < max_depth)
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs * stride
    ys = ys * stride
    pts = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z], -1)[keep]
    if image is None:
        return pts, None
    inten = np.asarray(image)[::stride, ::stride][keep]
    return pts, inten


def rectify_pair(img_a: jnp.ndarray, img_b: jnp.ndarray, K: np.ndarray,
                 R_ab: np.ndarray, t_ab: np.ndarray):
    """Calibrated two-view pair -> rectified pair + rectification metadata.

    (R_ab, t_ab): pose of camera b relative to a (x_b = R_ab x_a + t_ab).
    Returns (rect_a, rect_b, info) with info = dict(K_rect, R_rect_a,
    baseline): both images resampled so epipolar lines are horizontal
    scan lines and ``stereo_disparity(rect_a, rect_b)`` applies. The new
    x axis points along the baseline (Fusiello's method: one shared
    rotation per camera, no shear). The bilinear resample is this
    module's single gather — coherent, one-time, outside the sweep.

    Raises ValueError when the baseline is (near-)parallel to camera a's
    optical axis: forward motion puts the epipole inside the image, no
    rectifying rotation exists (the warp would swing the view ~90 deg off
    axis), and the old fixed-ez cross product emitted NaN. densify()
    treats ValueError as "skip this pair".
    """
    K = np.asarray(K, np.float64)
    R_ab = np.asarray(R_ab, np.float64)
    t_ab = np.asarray(t_ab, np.float64)
    # Camera centers in a's frame: a at 0, b at -R_ab^T t_ab.
    c_b = -R_ab.T @ t_ab
    baseline = float(np.linalg.norm(c_b))
    if baseline < 1e-9:
        raise ValueError("rectification needs a nonzero baseline")
    # New axes (in a's frame): x along the baseline TOWARD camera b —
    # that (and only that) makes a the LEFT camera with positive
    # disparities, regardless of how the pair is oriented in the world.
    ex = c_b / baseline
    ez0 = np.array([0.0, 0.0, 1.0])
    if abs(float(ex @ ez0)) > 0.99:
        raise ValueError(
            "rectification is degenerate: baseline is (near-)parallel to "
            f"the optical axis (|ex.ez| = {abs(float(ex @ ez0)):.3f} > 0.99); "
            "forward-motion pairs cannot be rectified into a horizontal-"
            "disparity stereo pair")
    ey = np.cross(ez0, ex)
    ey /= np.linalg.norm(ey)
    ez = np.cross(ex, ey)
    R_rect = np.stack([ex, ey, ez])          # world(a) -> rectified
    Ha = K @ R_rect @ np.linalg.inv(K)
    Hb = K @ R_rect @ R_ab.T @ np.linalg.inv(K)

    def warp(img, Hmat):
        img = jnp.asarray(img, jnp.float32)
        H_, W_ = img.shape
        yy, xx = jnp.mgrid[0:H_, 0:W_]
        Hinv = jnp.asarray(np.linalg.inv(Hmat), jnp.float32)
        ones = jnp.ones_like(xx, jnp.float32)
        src = jnp.einsum("ij,jhw->ihw", Hinv,
                         jnp.stack([xx.astype(jnp.float32),
                                    yy.astype(jnp.float32), ones]))
        sx = src[0] / src[2]
        sy = src[1] / src[2]
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W_ - 2)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H_ - 2)
        fx_ = jnp.clip(sx - x0, 0.0, 1.0)
        fy_ = jnp.clip(sy - y0, 0.0, 1.0)
        g = lambda yo, xo: img[y0 + yo, x0 + xo]
        out = ((1 - fy_) * ((1 - fx_) * g(0, 0) + fx_ * g(0, 1))
               + fy_ * ((1 - fx_) * g(1, 0) + fx_ * g(1, 1)))
        inside = (sx >= 0) & (sx <= W_ - 1) & (sy >= 0) & (sy <= H_ - 1)
        return jnp.where(inside, out, 0.0)

    rect_a = warp(img_a, Ha)
    rect_b = warp(img_b, Hb)
    info = dict(K_rect=K, R_rect_a=R_rect, baseline=baseline)
    return rect_a, rect_b, info
