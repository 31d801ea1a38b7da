"""ORB-style binary features as XLA ops: FAST corners + oriented BRIEF.

A second descriptor family beyond SIFT (features/sift.py), targeting the
reference genre's "fast matching" axis (SURVEY.md §1.1; the reference
mount is empty — SURVEY.md §0 — so the spec is BASELINE.json:5's
approximate/fast matching clause, not a file:line). Descriptors are
256-bit packed words matched in Hamming space via matching/hamming.py —
which on TPU runs on the MXU, exactly (see that module's docstring).

TPU-first mapping of the classical pipeline:

- **FAST-9 detection**: the 16-pixel Bresenham circle becomes 16 shifted
  views of the image; the ""9 contiguous brighter/darker"" test is a
  static stack of 16 windowed ANDs over a circularly extended (24, H, W)
  bool array — pure VPU elementwise work, no data-dependent control flow,
  every pixel scored. Non-max suppression is a 3x3 ``reduce_window`` max,
  selection a masked ``top_k`` (the sift.py idiom).
- **Orientation**: intensity centroid (Rosin moments) over a disk,
  computed on the per-keypoint patch already fetched for BRIEF — two
  masked reductions, no whole-image moment convolutions.
- **rBRIEF**: the 256 test pairs are compile-time constants (seeded
  Gaussian pattern); per keypoint the rotated test coordinates become
  per-axis hat-function weight vectors, so all 512 bilinear samples are
  two small MXU matmuls against the patch (the sift.py descriptor trick)
  — no scalar gathers.
- **Packing**: 256 comparison bits -> (8,) uint32 via a shift-and-sum
  (core/containers.pack_bits), giving 16 bytes/descriptor in HBM (32x
  smaller than SIFT's 512 f32 bytes).

The BRIEF pattern is a seeded random Gaussian pattern (classical BRIEF),
not cv2's learned rBRIEF table — bitwise cv2 parity is a non-goal; the
contract is downstream match quality on ground-truth warps
(tests/test_orb.py), mirroring the SIFT module's contract.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fastmatch_tpu.core.containers import (BinaryDescriptors, Keypoints,
                                           pack_bits)
from fastmatch_tpu.features.sift import _blur, _extract_patches


class ORBConfig(NamedTuple):
    capacity: int = 2048
    n_levels: int = 4                # image pyramid levels
    scale_step: float = 1.25         # per-level downscale factor
    fast_threshold: float = 0.08     # on [0,1] images (~cv2's 20/255)
    fast_arc: int = 9                # contiguous circle pixels (FAST-9)
    blur_sigma: float = 2.0          # pre-BRIEF smoothing
    n_bits: int = 256
    pattern_radius: float = 12.0     # BRIEF test offsets clipped to this
    pattern_seed: int = 20140901
    centroid_radius: int = 15        # orientation moment disk
    patch: int = 40                  # per-keypoint patch (covers rotation)


# Radius-3 Bresenham circle, 16 (dy, dx) offsets, clockwise from 12 o'clock.
_CIRCLE = [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
           (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2),
           (-3, -1)]


@functools.lru_cache(maxsize=None)
def _brief_pattern(n_bits: int, radius: float, seed: int) -> np.ndarray:
    """(n_bits, 4) float32 test-pair offsets (y1, x1, y2, x2), Gaussian with
    sigma = radius/2 clipped to the disk of ``radius`` (classical BRIEF-II)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, radius / 2.0, size=(n_bits, 4))
    pts = np.clip(pts, -radius, radius)
    # Reject near-degenerate pairs (both ends ~the same pixel carry no
    # signal): nudge them apart deterministically.
    d = np.hypot(pts[:, 0] - pts[:, 2], pts[:, 1] - pts[:, 3])
    bad = d < 1.0
    pts[bad, 2:] = np.clip(pts[bad, 2:] + 2.0, -radius, radius)
    return pts.astype(np.float32)


def _detect_level(img: jnp.ndarray, cfg: ORBConfig, k_level: int):
    """FAST-9 corners on one pyramid level.

    Returns (xy (K, 2) f32 level coords, score (K,), mask (K,), yy, xx).
    """
    h, w = img.shape
    t = cfg.fast_threshold
    p = jnp.pad(img, ((3, 3), (3, 3)), mode="edge")
    circ = jnp.stack([p[3 + dy:3 + dy + h, 3 + dx:3 + dx + w]
                      for dy, dx in _CIRCLE])            # (16, H, W)
    bright = circ > img[None] + t
    dark = circ < img[None] - t

    def arc_any(flags):
        ext = jnp.concatenate([flags, flags[:cfg.fast_arc - 1]], axis=0)
        runs = [jnp.all(ext[s:s + cfg.fast_arc], axis=0) for s in range(16)]
        return jnp.any(jnp.stack(runs), axis=0)

    corner = arc_any(bright) | arc_any(dark)
    # FAST score: total clamped margin of the stronger polarity.
    sb = jnp.sum(jnp.maximum(circ - img[None] - t, 0.0), axis=0)
    sd = jnp.sum(jnp.maximum(img[None] - circ - t, 0.0), axis=0)
    score = jnp.where(corner, jnp.maximum(sb, sd), 0.0)

    # Keep patches interior: zero the border band (patch/2 pixels).
    b = cfg.patch // 2
    yi = jnp.arange(h)[:, None]
    xi = jnp.arange(w)[None, :]
    interior = (yi >= b) & (yi < h - b) & (xi >= b) & (xi < w - b)
    score = jnp.where(interior, score, 0.0)

    # 3x3 non-max suppression; ties keep both (top_k dedups by score order).
    pooled = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (3, 3),
                                   (1, 1), "SAME")
    score = jnp.where(score >= pooled, score, 0.0)

    flat = score.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k_level)
    yy = (idx // w).astype(jnp.int32)
    xx = (idx % w).astype(jnp.int32)
    mask = vals > 0.0
    xy = jnp.stack([xx.astype(jnp.float32), yy.astype(jnp.float32)], axis=-1)
    return xy, vals, mask, yy, xx


def _orient_and_describe(blurred: jnp.ndarray, yy, xx, cfg: ORBConfig):
    """Per-keypoint orientation (intensity centroid) + rotated BRIEF bits.

    blurred: (H, W) smoothed level image; yy/xx integer keypoint pixels.
    Returns (angle (K,), bits (K, n_bits) bool).
    """
    P = cfg.patch
    half = P // 2
    h, w = blurred.shape
    padded = jnp.pad(blurred, ((half, half), (half, half)), mode="edge")
    starts_y = yy  # + half (pad) - half (center) == yy
    starts_x = xx
    patches = _extract_patches(padded[None], jnp.zeros_like(yy), starts_y,
                               starts_x, P)  # (K, P, P), center at (half, half)

    # --- orientation: Rosin intensity centroid over a disk ---
    off = np.arange(P, dtype=np.float32) - half
    oy, ox = np.meshgrid(off, off, indexing="ij")
    disk = ((oy**2 + ox**2) <= cfg.centroid_radius**2).astype(np.float32)
    wy = jnp.asarray(oy * disk)
    wx = jnp.asarray(ox * disk)
    m01 = jnp.einsum("kpq,pq->k", patches, wy)
    m10 = jnp.einsum("kpq,pq->k", patches, wx)
    angle = jnp.arctan2(m01, m10)

    # --- rBRIEF: rotated pattern sampled via hat-weight matmuls ---
    pat = _brief_pattern(cfg.n_bits, cfg.pattern_radius, cfg.pattern_seed)
    py = jnp.asarray(np.concatenate([pat[:, 0], pat[:, 2]]))  # (2*n_bits,)
    px = jnp.asarray(np.concatenate([pat[:, 1], pat[:, 3]]))
    pr = jnp.arange(P, dtype=jnp.float32)

    def one(patch, th):
        ct, st = jnp.cos(th), jnp.sin(th)
        sx = jnp.clip(ct * px - st * py + half, 0.0, P - 1.0)
        sy = jnp.clip(st * px + ct * py + half, 0.0, P - 1.0)
        # Bilinear sample s = sum_pq hat(sy-p) hat(sx-q) patch[p, q]:
        # (S, P) @ (P, P) then a row-wise weighted sum — MXU, no gathers.
        wyv = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - pr[None, :]))
        wxv = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - pr[None, :]))
        vals = jnp.sum((wyv @ patch) * wxv, axis=-1)      # (2*n_bits,)
        return vals[:cfg.n_bits] < vals[cfg.n_bits:]

    bits = jax.vmap(one)(patches, angle)
    return angle, bits


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe_orb(img: jnp.ndarray, cfg: ORBConfig = ORBConfig()):
    """(H, W) [0,1] grayscale -> (Keypoints, BinaryDescriptors) at capacity.

    Fully jittable; vmap over a leading batch axis for multi-frame ingest.
    Keypoint xy are level-0 pixel coordinates; ``scale`` carries the pyramid
    level's scale factor.
    """
    img = img.astype(jnp.float32)
    levels = [img]
    for l in range(1, cfg.n_levels):
        sh = (int(round(img.shape[0] / cfg.scale_step**l)),
              int(round(img.shape[1] / cfg.scale_step**l)))
        levels.append(jax.image.resize(img, sh, "linear"))

    outs = []
    for l, lv in enumerate(levels):
        k_level = max(cfg.capacity // (2 ** l), 128)
        xy, vals, mask, yy, xx = _detect_level(lv, cfg, k_level)
        blurred = _blur(lv, cfg.blur_sigma)
        angle, bits = _orient_and_describe(blurred, yy, xx, cfg)
        mult = float(cfg.scale_step ** l)
        outs.append(dict(
            xy=xy * mult,
            scale=jnp.full(xy.shape[:1], mult, jnp.float32),
            angle=angle,
            score=jnp.where(mask, vals, 0.0),
            mask=mask,
            bits=bits,
        ))
    xy = jnp.concatenate([o["xy"] for o in outs])
    scale = jnp.concatenate([o["scale"] for o in outs])
    angle = jnp.concatenate([o["angle"] for o in outs])
    score = jnp.concatenate([o["score"] for o in outs])
    mask = jnp.concatenate([o["mask"] for o in outs])
    bits = jnp.concatenate([o["bits"] for o in outs])

    sel = jnp.where(mask, score, -1.0)
    _, pick = jax.lax.top_k(sel, cfg.capacity)
    mask_f = mask[pick] & (sel[pick] > 0)
    kps = Keypoints(xy=xy[pick], scale=scale[pick], angle=angle[pick],
                    score=score[pick], mask=mask_f)
    packed = pack_bits(bits[pick] & mask_f[:, None])
    return kps, BinaryDescriptors(packed=packed, mask=mask_f)
