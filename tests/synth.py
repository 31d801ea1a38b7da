"""Synthetic-scene testkit (component T25, SURVEY.md §3.2).

Pure-numpy generators, independent of the product code:

- random SIFT-like descriptor sets (unit-norm, clustered so matching is
  non-trivial);
- synthetic 3D scenes: random landmarks + camera trajectory with known poses,
  exact projections -> ground truth for RANSAC / triangulation / BA / ATE;
- homography-warped image pairs for detector repeatability tests.
"""

from __future__ import annotations

import numpy as np


def random_descriptors(rng, n: int, dim: int = 128) -> np.ndarray:
    """Unit-norm non-negative descriptors resembling SIFT statistics."""
    d = np.abs(rng.standard_normal((n, dim))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return d


def corresponding_descriptors(rng, n: int, noise: float = 0.05, n_distract: int = 0):
    """Two descriptor sets with known 1:1 correspondence plus distractors.

    Returns (desc_a, desc_b, gt): desc_a[i] corresponds to desc_b[gt[i]];
    desc_b additionally contains ``n_distract`` unrelated rows and is
    shuffled.
    """
    base = random_descriptors(rng, n)
    noisy = base + noise * rng.standard_normal(base.shape).astype(np.float32)
    noisy = np.abs(noisy)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True) + 1e-12
    distract = random_descriptors(rng, n_distract) if n_distract else np.zeros((0, base.shape[1]), np.float32)
    all_b = np.concatenate([noisy, distract], axis=0)
    perm = rng.permutation(all_b.shape[0])
    inv = np.argsort(perm)
    return base, all_b[perm], inv[:n]


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)):
    """World-from-camera rotation R and translation t with camera at ``eye``
    looking at ``target`` (OpenCV convention: +z forward, +y down).

    Returns (R_cw, t_cw) mapping world points to camera: x_cam = R @ x_w + t.
    """
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # camera axes in world coords
    R_cw = R_wc.T
    t_cw = -R_cw @ eye
    return R_cw, t_cw


class SyntheticScene:
    """Random landmarks observed by a smooth camera trajectory.

    Attributes:
      points:    (P, 3) world landmarks
      R, t:      (F, 3, 3), (F, 3) world->camera per frame
      K:         (3, 3) shared intrinsics
      pixels:    (F, P, 2) exact projections
      visible:   (F, P) bool — in front of camera and inside the image
    """

    def __init__(
        self,
        rng,
        n_points: int = 200,
        n_frames: int = 10,
        image_size=(640, 480),
        noise_px: float = 0.0,
        orbit_radius: float = 6.0,
        span: float = 0.6,
    ):
        w, h = image_size
        self.K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1.0]])
        self.points = rng.uniform(-2.0, 2.0, size=(n_points, 3))
        Rs, ts = [], []
        for f in range(n_frames):
            ang = span * f / max(n_frames - 1, 1) - span / 2
            eye = np.array(
                [orbit_radius * np.sin(ang), 0.5 * np.sin(2 * ang), -orbit_radius * np.cos(ang)]
            )
            R, t = look_at(eye, np.zeros(3))
            Rs.append(R)
            ts.append(t)
        self.R = np.stack(Rs)
        self.t = np.stack(ts)
        cam = np.einsum("fij,pj->fpi", self.R, self.points) + self.t[:, None, :]
        z = cam[..., 2]
        uv = (cam[..., :2] / np.clip(z[..., None], 1e-9, None)) @ np.diag(
            [self.K[0, 0], self.K[1, 1]]
        ) + self.K[:2, 2]
        if noise_px > 0:
            uv = uv + noise_px * rng.standard_normal(uv.shape)
        self.pixels = uv.astype(np.float64)
        self.visible = (
            (z > 0.1) & (uv[..., 0] >= 0) & (uv[..., 0] < w) & (uv[..., 1] >= 0) & (uv[..., 1] < h)
        )


def render_blob_image(rng, image_size=(256, 256), n_blobs: int = 40):
    """Grayscale float image of Gaussian blobs — texture for detector tests."""
    h, w = image_size
    img = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cx, cy = rng.uniform(20, w - 20), rng.uniform(20, h - 20)
        s = rng.uniform(1.5, 6.0)
        a = rng.uniform(0.3, 1.0) * rng.choice([-1.0, 1.0])
        img += a * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * s * s))
    img -= img.min()
    img /= img.max() + 1e-9
    return img


def render_scene_views(scene: "SyntheticScene", rng, image_size=(640, 480),
                       frames=None, n_satellites=4):
    """Render the SyntheticScene's landmarks as Gaussian-blob constellations
    from each camera: real 3D parallax in real images (the full-front-end
    oracle — detect/describe/match/pose/BA can all run on these).

    Identical isolated blobs would all share one descriptor and die in the
    ratio test, so each landmark carries a random constellation of satellite
    blobs at small fixed 3D offsets — projected per view, the local patch is
    distinctive AND geometrically consistent across views.
    """
    w, h = image_size
    P = scene.points.shape[0]
    amps = rng.uniform(0.35, 0.9, P)
    sigs = rng.uniform(1.6, 3.0, P)
    sat_off = rng.uniform(-0.2, 0.2, (P, n_satellites, 3))
    sat_amp = rng.uniform(0.2, 0.7, (P, n_satellites)) * np.sign(
        rng.standard_normal((P, n_satellites))
    )
    fx, fy = scene.K[0, 0], scene.K[1, 1]
    cx, cy = scene.K[0, 2], scene.K[1, 2]
    out = []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frame_ids = range(scene.R.shape[0]) if frames is None else frames

    def splat(img, u, v, s, a):
        r = int(3 * s) + 1
        x0, x1 = max(int(u) - r, 0), min(int(u) + r + 1, w)
        y0, y1 = max(int(v) - r, 0), min(int(v) + r + 1, h)
        if x0 >= x1 or y0 >= y1:
            return
        d2 = (xx[y0:y1, x0:x1] - u) ** 2 + (yy[y0:y1, x0:x1] - v) ** 2
        img[y0:y1, x0:x1] += a * np.exp(-d2 / (2 * s * s))

    for f in frame_ids:
        img = np.full((h, w), 0.35, np.float32)
        cam = scene.points @ scene.R[f].T + scene.t[f]
        depth = cam[:, 2]
        for p in range(P):
            if not scene.visible[f, p]:
                continue
            u, v = scene.pixels[f, p]
            s = sigs[p] * 10.0 / max(depth[p], 0.5)
            splat(img, u, v, s, amps[p])
            sat_cam = (scene.points[p] + sat_off[p]) @ scene.R[f].T + scene.t[f]
            for k in range(n_satellites):
                z = sat_cam[k, 2]
                if z < 0.1:
                    continue
                su = fx * sat_cam[k, 0] / z + cx
                sv = fy * sat_cam[k, 1] / z + cy
                splat(img, su, sv, 0.6 * s, sat_amp[p, k])
        out.append(np.clip(img, 0, 1).astype(np.float32))
    return out
