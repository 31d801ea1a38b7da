"""SIFT detection + description as XLA ops (components T8/T9).

TPU-first re-design of the classical DoG/SIFT pipeline (the reference's
feature extraction is OpenCV's C++ SIFT; this is a from-scratch XLA
implementation — BASELINE.json config 3, SURVEY.md §3.2 T8/T9):

- Gaussian pyramid via separable depthwise convolutions (MXU/VPU friendly;
  kernels precomputed at trace time from the static config).
- DoG extrema: 3x3x3 neighborhood max/min via ``lax.reduce_window`` — no
  data-dependent loops; every pixel is scored, masks encode validity.
- Subpixel refinement: one quadratic (Newton) step from image-wide central
  differences; closed-form 3x3 solve, fully vectorized.
- Fixed-capacity selection: per-octave ``top_k`` on masked scores (static
  shapes; padded slots carry mask=False).
- Orientation: 36-bin gradient histogram over a fixed patch, circularly
  smoothed, parabolic peak interpolation — gathered per keypoint with
  ``dynamic_slice`` (vmapped), never ragged.
- Descriptor: 16x16 samples on the rotated grid; *static* trilinear spatial
  weights (the rotated sample grid is fixed in cell coordinates, so the
  16->4 cell weights are compile-time numpy constants) — the histogram is an
  einsum over (sample-row-weights, sample-col-weights, per-sample orientation
  soft-binning), no scatter ops anywhere.

Exact OpenCV equreement is not targeted (different sampling); the contract is
downstream *match* agreement on warped pairs (SURVEY.md §8.2), validated in
tests/test_features.py against synthetic ground-truth homographies.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fastmatch_tpu.core.containers import Descriptors, Keypoints


class SIFTConfig(NamedTuple):
    n_octaves: int = 4
    scales_per_octave: int = 3       # s: DoG levels carrying extrema
    sigma0: float = 1.6              # base blur of octave level 0
    init_sigma: float = 0.5          # assumed blur of the input image
    contrast_thr: float = 0.04       # on [0,1] images (cv2 convention / 255)
    edge_thr: float = 10.0
    capacity: int = 2048             # total keypoint capacity
    ori_radius: int = 8              # orientation patch radius (pixels)
    ori_bins: int = 36
    desc_width: int = 4              # 4x4 spatial cells
    desc_bins: int = 8               # orientation bins per cell
    desc_samples: int = 16           # 16x16 sample grid


def _gauss_kernel1d(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of (H, W) image; SAME edges (replicate-ish via
    reflect padding keeps border energy sane for gradients).

    Shift-and-add instead of conv_general_dilated: a single-channel NCHW
    conv runs on the MXU in bf16 (0.3% error on [0,1] images) and slower
    than the VPU for a dozen taps — static slices + weighted adds are both
    exact f32 and ~1.5x faster on v5e (the kernel taps are compile-time
    constants, XLA fuses the whole sum into one pass).
    """
    if sigma <= 0:
        return img
    kv = _gauss_kernel1d(sigma)
    r = (len(kv) - 1) // 2
    h, w = img.shape
    p = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    img = sum(float(kv[i]) * p[i:i + h, :] for i in range(len(kv)))
    p = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    return sum(float(kv[i]) * p[:, i:i + w] for i in range(len(kv)))


def _gaussian_pyramid(img: jnp.ndarray, cfg: SIFTConfig):
    """List (octaves) of stacked (L, H_o, W_o) Gaussian images, L = s + 3."""
    s = cfg.scales_per_octave
    n_levels = s + 3
    k = 2.0 ** (1.0 / s)
    sigmas = [cfg.sigma0 * (k ** l) for l in range(n_levels)]
    # Incremental blurs within an octave.
    inc = [math.sqrt(max(sigmas[l] ** 2 - sigmas[l - 1] ** 2, 1e-8)) for l in range(1, n_levels)]
    base = _blur(img, math.sqrt(max(cfg.sigma0 ** 2 - cfg.init_sigma ** 2, 0.01)))
    octaves = []
    cur = base
    for o in range(cfg.n_octaves):
        levels = [cur]
        for l in range(1, n_levels):
            levels.append(_blur(levels[-1], inc[l - 1]))
        octaves.append(jnp.stack(levels))
        # Next octave seeds from the level with blur 2*sigma0 (index s).
        cur = levels[s][::2, ::2]
    return octaves, sigmas


def _solve3x3(H: jnp.ndarray, g: jnp.ndarray):
    """Batched closed-form solve H x = -g for 3x3 H (adjugate; det-guarded)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g2, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g2 - d * i
    E = a * i - c * g2
    F = c * d - a * f
    G = d * h - e * g2
    Hh = b * g2 - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    x = -(A * g[..., 0] + B * g[..., 1] + C * g[..., 2]) / det_safe
    y = -(D * g[..., 0] + E * g[..., 1] + F * g[..., 2]) / det_safe
    z = -(G * g[..., 0] + Hh * g[..., 1] + I * g[..., 2]) / det_safe
    bad = jnp.abs(det) < 1e-12
    return jnp.stack([x, y, z], axis=-1), bad


def _detect_octave(dog: jnp.ndarray, cfg: SIFTConfig, k_oct: int):
    """Extrema + refinement for one octave's (L-1, H, W) DoG stack.

    Returns flat top-k candidates: xy (k,2 octave coords), level (k,), offset
    (k,3: dx,dy,ds), score (k,), mask (k,).
    """
    Lm1, H, W = dog.shape
    s = cfg.scales_per_octave
    # 3x3 spatial max/min per DoG level.
    mx = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (1, 3, 3), (1, 1, 1), "SAME")
    levels = []
    for l in range(1, 1 + s):  # interior levels
        v = dog[l]
        is_max = (v >= mx[l - 1]) & (v >= mx[l + 1]) & (v == mx[l])
        is_min = (v <= mn[l - 1]) & (v <= mn[l + 1]) & (v == mn[l])
        prelim = (jnp.abs(v) > 0.5 * cfg.contrast_thr / s) & (is_max | is_min)
        # Central differences (image-wide; cheap next to the convs).
        dx = 0.5 * (jnp.roll(dog[l], -1, 1) - jnp.roll(dog[l], 1, 1))
        dy = 0.5 * (jnp.roll(dog[l], -1, 0) - jnp.roll(dog[l], 1, 0))
        ds = 0.5 * (dog[l + 1] - dog[l - 1])
        dxx = jnp.roll(dog[l], -1, 1) + jnp.roll(dog[l], 1, 1) - 2 * v
        dyy = jnp.roll(dog[l], -1, 0) + jnp.roll(dog[l], 1, 0) - 2 * v
        dss = dog[l + 1] + dog[l - 1] - 2 * v
        dxy = 0.25 * (
            jnp.roll(jnp.roll(dog[l], -1, 0), -1, 1)
            - jnp.roll(jnp.roll(dog[l], -1, 0), 1, 1)
            - jnp.roll(jnp.roll(dog[l], 1, 0), -1, 1)
            + jnp.roll(jnp.roll(dog[l], 1, 0), 1, 1)
        )
        dxs = 0.25 * (
            jnp.roll(dog[l + 1], -1, 1) - jnp.roll(dog[l + 1], 1, 1)
            - jnp.roll(dog[l - 1], -1, 1) + jnp.roll(dog[l - 1], 1, 1)
        )
        dys = 0.25 * (
            jnp.roll(dog[l + 1], -1, 0) - jnp.roll(dog[l + 1], 1, 0)
            - jnp.roll(dog[l - 1], -1, 0) + jnp.roll(dog[l - 1], 1, 0)
        )
        Hm = jnp.stack(
            [
                jnp.stack([dxx, dxy, dxs], -1),
                jnp.stack([dxy, dyy, dys], -1),
                jnp.stack([dxs, dys, dss], -1),
            ],
            -2,
        )
        grad = jnp.stack([dx, dy, ds], -1)
        off, bad = _solve3x3(Hm, grad)
        refined = v + 0.5 * jnp.sum(grad * off, -1)
        # Rejections: weak contrast after refinement, divergent offset, edges.
        tr = dxx + dyy
        det2 = dxx * dyy - dxy * dxy
        r = cfg.edge_thr
        edge_ok = (det2 > 0) & (tr * tr * r < (r + 1) ** 2 * det2)
        off_ok = jnp.all(jnp.abs(off) < 1.5, -1)
        ok = (
            prelim
            & edge_ok
            & off_ok
            & ~bad
            & (jnp.abs(refined) * s > cfg.contrast_thr)
        )
        # Kill the border (rolls wrap; patches later need margins anyway).
        border = 5
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        ok &= (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
        levels.append((jnp.where(ok, jnp.abs(refined), -1.0), off, refined))
    score = jnp.stack([l[0] for l in levels])     # (s, H, W)
    offs = jnp.stack([l[1] for l in levels])      # (s, H, W, 3)
    vals = jnp.stack([l[2] for l in levels])      # (s, H, W)
    flat_score = score.reshape(-1)
    top, idx = jax.lax.top_k(flat_score, k_oct)
    lvl = idx // (H * W)
    rem = idx % (H * W)
    yy = rem // W
    xx = rem % W
    off_sel = offs.reshape(-1, 3)[idx]
    val_sel = vals.reshape(-1)[idx]
    mask = top > 0.0
    xy = jnp.stack(
        [xx.astype(jnp.float32) + off_sel[:, 0], yy.astype(jnp.float32) + off_sel[:, 1]],
        -1,
    )
    return xy, (lvl + 1).astype(jnp.int32), off_sel, val_sel, mask, (yy, xx)


def _extract_patches(stack, l, y, x, patch: int):
    """(K,) level/row/col starts -> (K, patch, patch) patches.

    On TPU this routes through the Pallas VMEM-resident gather
    (kernels/patch_gather.py): the vmapped ``dynamic_slice`` lowers to an
    XLA HBM gather at the measured ~500 MB/s random-access floor and was
    the single largest cost of detect_and_describe (5.6 ms of the 17.5 ms
    frame for orientation alone). Elsewhere (CPU tests) the dynamic_slice
    path is used directly — both clamp starts identically.
    """
    K = l.shape[0]
    L, H, W = stack.shape
    use_kernel = (
        jax.default_backend() == "tpu"
        and K % 128 == 0
        and patch <= 128
        and patch + 16 <= H  # aligned slab must fit the stack height
        and L <= 8 and H <= 8192 and W <= 4096
    )
    if use_kernel:
        from fastmatch_tpu.kernels.patch_gather import gather_patches

        return gather_patches(stack, jnp.stack([l, y, x], axis=1), patch)

    def one(li, yi, xi):
        return jax.lax.dynamic_slice(stack, (li, yi, xi), (1, patch, patch))[0]

    return jax.vmap(one)(l, y, x)


def _orientation(gauss: jnp.ndarray, yx, lvl, sigma_rel, cfg: SIFTConfig):
    """Dominant orientation per keypoint from a (2R+1)^2 patch.

    gauss: (L, H, W) octave stack; yx: integer (y, x); lvl: level index;
    sigma_rel: keypoint sigma in octave pixels.
    """
    R = cfg.ori_radius
    P = 2 * R + 1
    L, H, W = gauss.shape
    padded = jnp.pad(gauss, ((0, 0), (R + 1, R + 1), (R + 1, R + 1)), mode="edge")

    dy, dx = jnp.arange(-R, R + 1), jnp.arange(-R, R + 1)
    oy, ox = jnp.meshgrid(dy, dx, indexing="ij")

    patches = _extract_patches(padded, lvl, yx[0] + 1, yx[1] + 1, P + 2)

    def one(img, sig):
        # img: (P+2, P+2) with +1 margin for central differences
        gx = 0.5 * (img[1:-1, 2:] - img[1:-1, :-2])
        gy = 0.5 * (img[2:, 1:-1] - img[:-2, 1:-1])
        mag = jnp.sqrt(gx * gx + gy * gy)
        ang = jnp.arctan2(gy, gx)  # [-pi, pi]
        w_sig = 1.5 * sig
        w = jnp.exp(-(ox**2 + oy**2) / (2.0 * w_sig * w_sig))
        binf = (ang + jnp.pi) / (2 * jnp.pi) * cfg.ori_bins
        b0 = jnp.clip(binf.astype(jnp.int32), 0, cfg.ori_bins - 1)
        # Histogram as a one-hot contraction instead of a scatter-add:
        # vmapped scatters serialize on TPU, the (P^2, bins) matmul doesn't.
        hist = (w * mag).reshape(-1) @ jax.nn.one_hot(
            b0.reshape(-1), cfg.ori_bins, dtype=jnp.float32
        )
        # Circular smoothing ([1,4,6,4,1]/16 twice, as cv2 does).
        for _ in range(2):
            hist = (
                6 * hist
                + 4 * (jnp.roll(hist, 1) + jnp.roll(hist, -1))
                + (jnp.roll(hist, 2) + jnp.roll(hist, -2))
            ) / 16.0
        pk = jnp.argmax(hist)
        l_, c_, r_ = hist[(pk - 1) % cfg.ori_bins], hist[pk], hist[(pk + 1) % cfg.ori_bins]
        denom = l_ - 2 * c_ + r_
        interp = jnp.where(jnp.abs(denom) < 1e-9, 0.0, 0.5 * (l_ - r_) / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom))
        bin_pos = (pk.astype(jnp.float32) + interp) % cfg.ori_bins
        return bin_pos / cfg.ori_bins * 2 * jnp.pi - jnp.pi

    return jax.vmap(one)(patches, sigma_rel)


def _descriptor_weights(cfg: SIFTConfig) -> np.ndarray:
    """Static 16->4 trilinear cell weights per sample index (numpy, traced as
    constants). Sample i sits at cell coordinate (i + .5)/4 - .5 in [0-.375,
    3.375]; weight to cell c is max(0, 1 - |coord - c|)."""
    n, d = cfg.desc_samples, cfg.desc_width
    coords = (np.arange(n) + 0.5) * d / n - 0.5
    w = np.maximum(0.0, 1.0 - np.abs(coords[:, None] - np.arange(d)[None, :]))
    return w.astype(np.float32)  # (16, 4)


def _descriptors(gauss, xy, lvl, angle, sigma_rel, cfg: SIFTConfig):
    """128-d descriptors; xy in octave pixel coords (subpixel).

    TPU-first sampling: per-keypoint scalar gathers are the classic SIFT
    hot spot and run at ~300 MB/s on TPU (measured: 97 ms/octave). Instead,
    each keypoint extracts ONE contiguous patch (dynamic_slice) sized to the
    maximum descriptor support, and every bilinear sample becomes a pair of
    per-axis hat-function weight vectors — the (samples, P) x (P, P) x
    (P, samples) contraction runs on the MXU. Bilinear interpolation at
    coordinate c equals sum_p relu(1 - |c - p|) * img[p], so results are
    bit-comparable to the gather formulation. Measured on v5e, 1024
    keypoints on a 480x640 octave: 97 -> 8.6 ms; whole detect_and_describe
    355 -> 44 ms/frame.
    """
    L, H, W = gauss.shape
    n = cfg.desc_samples
    pad = 2
    padded = jnp.pad(gauss, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    Hp, Wp = H + 2 * pad, W + 2 * pad

    # Static rotated-frame sample offsets in "cell units" (d cells wide).
    u = (np.arange(n) + 0.5) * cfg.desc_width / n - cfg.desc_width / 2  # [-2, 2)
    uu, vv = np.meshgrid(u, u, indexing="ij")  # (16, 16) rows=y', cols=x'
    uu = jnp.asarray(uu.astype(np.float32))
    vv = jnp.asarray(vv.astype(np.float32))
    # Gaussian window over the descriptor (sigma = half width, cell units).
    wgauss = jnp.exp(-(uu**2 + vv**2) / (2 * (0.5 * cfg.desc_width) ** 2))
    w_spatial = jnp.asarray(_descriptor_weights(cfg))  # (16, 4)

    # Patch size covering the worst-case support: detection returns
    # lvl in [1, s] with scale offset |off_s| < 1.5 (sift._detect_octave),
    # so sigma_rel <= sigma0 * 2^((s + 1.5)/s); samples reach
    # hw * (d/2) * sqrt(2) from the center (+0.5 gradient offset,
    # +1 bilinear, + rounding). An undersized patch silently clamps the
    # outer descriptor cells of the largest-scale keypoints to the border.
    smax = cfg.sigma0 * 2.0 ** ((cfg.scales_per_octave + 1.5) / cfg.scales_per_octave)
    support = 3.0 * smax * (cfg.desc_width / 2.0) * math.sqrt(2.0) + 2.0
    P = int(math.ceil(2.0 * support)) + 4
    P = min(P + (-P) % 8, Hp, Wp)  # lane-friendly; tiny octaves cap at image
    pr = jnp.arange(P, dtype=jnp.float32)

    oxs = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) + pad - P // 2,
                   0, Wp - P)
    oys = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) + pad - P // 2,
                   0, Hp - P)
    patches = _extract_patches(padded, lvl, oys, oxs, P)

    def one(xy1, th, sig, patch, ox, oy):
        # hist_width: pixels per cell (cv2's 3*sigma).
        hw = 3.0 * sig
        ct, st = jnp.cos(th), jnp.sin(th)
        # Rotated sample positions in octave pixels.
        sx = xy1[0] + (ct * vv - st * uu) * hw
        sy = xy1[1] + (st * vv + ct * uu) * hw
        sxc = jnp.clip(sx, 0.0, W - 1.0) + pad
        syc = jnp.clip(sy, 0.0, H - 1.0) + pad
        sxr = jnp.clip((sxc - ox).reshape(-1), 0.5, P - 1.5)  # (n*n,)
        syr = jnp.clip((syc - oy).reshape(-1), 0.5, P - 1.5)

        def wmat(c):
            # (n*n, P) hat weights == bilinear interpolation row at coord c
            return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] - pr[None, :]))

        ty = wmat(syr) @ patch                      # (n*n, P): interp rows
        gx = jnp.sum(ty * (wmat(sxr + 0.5) - wmat(sxr - 0.5)), -1)
        tdy = (wmat(syr + 0.5) - wmat(syr - 0.5)) @ patch
        gy = jnp.sum(tdy * wmat(sxr), -1)
        gx = gx.reshape(n, n)
        gy = gy.reshape(n, n)
        mag = jnp.sqrt(gx * gx + gy * gy) * wgauss
        ang = jnp.arctan2(gy, gx) - th  # rotate into keypoint frame
        binf = (ang / (2 * jnp.pi)) * cfg.desc_bins
        binf = jnp.mod(binf, cfg.desc_bins)
        b0 = jnp.floor(binf).astype(jnp.int32) % cfg.desc_bins
        fb = binf - jnp.floor(binf)
        ob = (
            jax.nn.one_hot(b0, cfg.desc_bins) * (1 - fb)[..., None]
            + jax.nn.one_hot((b0 + 1) % cfg.desc_bins, cfg.desc_bins) * fb[..., None]
        )  # (16, 16, 8)
        contrib = mag[..., None] * ob
        desc = jnp.einsum("ic,jd,ijb->cdb", w_spatial, w_spatial, contrib)
        v = desc.reshape(-1)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        v = jnp.minimum(v, 0.2)
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        return v

    return jax.vmap(one)(xy, angle, sigma_rel, patches, oxs, oys)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe(img: jnp.ndarray, cfg: SIFTConfig = SIFTConfig()):
    """(H, W) [0,1] grayscale -> (Keypoints, Descriptors) at cfg.capacity.

    Fully jittable; vmap over a leading batch axis for multi-frame detection
    (pipeline ingest, BASELINE.json config 3).
    """
    img = img.astype(jnp.float32)
    octaves, sigmas = _gaussian_pyramid(img, cfg)
    s = cfg.scales_per_octave
    k_per = [max(cfg.capacity // (2**o), 128) for o in range(cfg.n_octaves)]
    outs = []
    for o, gauss in enumerate(octaves):
        dog = gauss[1:] - gauss[:-1]
        k_oct = k_per[o]
        xy, lvl, off, val, mask, (yy, xx) = _detect_octave(dog, cfg, k_oct)
        sigma_rel = jnp.asarray(cfg.sigma0) * jnp.exp2((lvl.astype(jnp.float32) + off[:, 2]) / s)
        angle = _orientation(gauss, (yy, xx), lvl, sigma_rel, cfg)
        desc = _descriptors(gauss, xy, lvl, angle, sigma_rel, cfg)
        scale_mult = float(2**o)
        outs.append(
            dict(
                xy=xy * scale_mult,
                scale=sigma_rel * scale_mult,
                angle=angle,
                score=jnp.where(mask, val, 0.0),
                mask=mask,
                desc=desc,
            )
        )
    xy = jnp.concatenate([o["xy"] for o in outs])
    scale = jnp.concatenate([o["scale"] for o in outs])
    angle = jnp.concatenate([o["angle"] for o in outs])
    score = jnp.concatenate([o["score"] for o in outs])
    mask = jnp.concatenate([o["mask"] for o in outs])
    desc = jnp.concatenate([o["desc"] for o in outs])
    # Global top-capacity by |score| (masked-out slots score -1).
    sel_score = jnp.where(mask, jnp.abs(score), -1.0)
    _, pick = jax.lax.top_k(sel_score, cfg.capacity)
    mask_f = mask[pick] & (sel_score[pick] > 0)
    kps = Keypoints(
        xy=xy[pick],
        scale=scale[pick],
        angle=angle[pick],
        score=score[pick],
        mask=mask_f,
    )
    descs = Descriptors(data=jnp.where(mask_f[:, None], desc[pick], 0.0), mask=mask_f)
    return kps, descs
