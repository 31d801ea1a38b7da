"""Camera-model suite (component T1, round 3): full Brown-Conrady and
equidistant fisheye — roundtrips, host/device normalization parity, and
end-to-end tracking through distorted lenses (the whole pipeline works in
normalized coordinates, so distortion must be absorbed entirely by the
normalization layer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.camera import (
    Fisheye,
    Pinhole,
    normalize_np,
    normalize_pixels,
)

RADTAN = dict(k1=-0.28, k2=0.07, k3=-0.01, p1=0.0005, p2=-0.0008)
FISH = dict(k1=-0.05, k2=0.008, k3=-0.002, k4=0.0003)


def _cam_points(rng, n=300, max_tan=0.6):
    """Camera-frame points spanning a moderate cone (tan up to 0.6 per
    axis, r up to ~0.85 — inside the contractive range of the fixed-point
    undistortion for a strong k1 = -0.28 lens; beyond its calibrated field
    any polynomial model extrapolates meaninglessly)."""
    xn = rng.uniform(-max_tan, max_tan, (n, 2))
    z = rng.uniform(1.0, 6.0, (n, 1))
    return np.concatenate([xn * z, z], axis=1).astype(np.float32)


class TestRoundtrips:
    def test_radtan_project_unproject(self, rng):
        cam = Pinhole(fx=500.0, fy=480.0, cx=320.0, cy=240.0, **RADTAN)
        pts = _cam_points(rng)
        pix = cam.project(jnp.asarray(pts))
        rays = np.asarray(cam.unproject(pix))
        xn_gt = pts[:, :2] / pts[:, 2:3]
        assert np.abs(rays[:, :2] - xn_gt).max() < 1e-5

    def test_fisheye_project_unproject(self, rng):
        cam = Fisheye(fx=400.0, fy=400.0, cx=320.0, cy=240.0, **FISH)
        # Fisheye handles very wide angles: tan up to 3.7 (~75 degrees).
        pts = _cam_points(rng, max_tan=3.7)
        pix = cam.project(jnp.asarray(pts))
        rays = np.asarray(cam.unproject(pix))
        xn_gt = pts[:, :2] / pts[:, 2:3]
        assert np.abs(rays[:, :2] - xn_gt).max() < 1e-4

    def test_fisheye_zero_coeffs_is_pure_equidistant(self):
        """With all k zero, r_pix = f * theta — NOT the pinhole f * tan:
        the model itself differs from Pinhole even undistorted."""
        cam = Fisheye(fx=400.0, fy=400.0, cx=0.0, cy=0.0)
        pts = jnp.asarray([[1.0, 0.0, 1.0]], jnp.float32)  # 45 degrees
        pix = np.asarray(cam.project(pts))
        assert abs(pix[0, 0] - 400.0 * np.pi / 4) < 1e-3
        rays = np.asarray(cam.unproject(jnp.asarray(pix)))
        assert abs(rays[0, 0] - 1.0) < 1e-5

    def test_fisheye_center_pixel_is_finite(self):
        cam = Fisheye(fx=400.0, fy=400.0, cx=320.0, cy=240.0, **FISH)
        rays = np.asarray(cam.unproject(jnp.asarray([[320.0, 240.0]])))
        assert np.isfinite(rays).all() and abs(rays[0, 0]) < 1e-6


class TestNormalizationParity:
    """Host (numpy) and device (jnp) normalization must agree — the
    host-driven (reconstruct/slam) and device-resident (tracker) engines
    share trajectories only if their normalized coords match."""

    @pytest.mark.parametrize("model", ["pinhole", "fisheye"])
    def test_np_vs_jnp(self, rng, model):
        if model == "pinhole":
            cam = Pinhole(fx=500.0, fy=480.0, cx=320.0, cy=240.0, **RADTAN)
        else:
            cam = Fisheye(fx=400.0, fy=400.0, cx=320.0, cy=240.0, **FISH)
        pix = np.stack([rng.uniform(0, 640, 200),
                        rng.uniform(0, 480, 200)], axis=1).astype(np.float32)
        xn_host = normalize_np(pix, cam)
        xn_dev = np.asarray(normalize_pixels(
            jnp.asarray(pix), jnp.asarray(cam.intrinsics_vector()), model))
        # Host path iterates in f64, device in f32: agreement to f32 eps.
        np.testing.assert_allclose(xn_host, xn_dev, atol=2e-5)

    def test_pinhole_k1k2_matches_legacy_tracker_bits(self, rng):
        """The (9,)-vector path with k3 = p1 = p2 = 0 must be bit-identical
        to the pre-round-3 (6,)-vector tracker normalization (adding exact
        zeros changes no finite f32 bits) — engine parity across rounds."""
        import jax
        vec9 = jnp.asarray([500.0, 480.0, 320.0, 240.0, -0.25, 0.08,
                            0.0, 0.0, 0.0], jnp.float32)
        pix = jnp.asarray(rng.uniform(0, 640, (64, 2)).astype(np.float32))

        def legacy(xy, cam):
            f, c, k1, k2 = cam[:2], cam[2:4], cam[4], cam[5]
            xd = (xy - c) / f

            def body(_, xn):
                r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
                return xd / (1.0 + k1 * r2 + k2 * r2 * r2)

            return jax.lax.fori_loop(0, 10, body, xd)

        new = np.asarray(normalize_pixels(pix, vec9, "pinhole"))
        old = np.asarray(legacy(pix, vec9))
        assert np.array_equal(new, old)


class TestEndToEndDistorted:
    """A synthetic scene rendered THROUGH a distorted lens, tracked by the
    scan engine: the trajectory must match ground truth, proving the
    normalization layer absorbs the model end-to-end."""

    def _features_through(self, rng, scene, cam, cap=512):
        from synth import random_descriptors

        n_pts = scene.points.shape[0]
        base_desc = random_descriptors(rng, n_pts)
        pts_cam = (np.einsum("fij,pj->fpi", scene.R, scene.points)
                   + scene.t[:, None, :])
        pix = np.asarray(cam.project(jnp.asarray(pts_cam, jnp.float32)))
        z = pts_cam[..., 2]
        w, h = 640, 480
        vis = ((z > 0.1) & (pix[..., 0] >= 0) & (pix[..., 0] < w)
               & (pix[..., 1] >= 0) & (pix[..., 1] < h))
        feats = []
        for f in range(scene.R.shape[0]):
            sel = np.where(vis[f])[0]
            xy = pix[f, sel] + 0.2 * rng.standard_normal((len(sel), 2))
            d = base_desc[sel] + 0.05 * rng.standard_normal(
                (len(sel), 128)).astype(np.float32)
            d = np.abs(d)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            xy_p = np.zeros((cap, 2), np.float32)
            d_p = np.zeros((cap, 128), np.float32)
            m_p = np.zeros(cap, bool)
            xy_p[: len(sel)] = xy
            d_p[: len(sel)] = d
            m_p[: len(sel)] = True
            feats.append((xy_p, d_p, m_p))
        return feats

    @pytest.mark.parametrize("model", ["radtan", "fisheye"])
    def test_scan_slam_through_distorted_lens(self, rng, model):
        from synth import SyntheticScene
        from fastmatch_tpu.pipeline.config import (
            BAConfig, MapConfig, PipelineConfig)
        from fastmatch_tpu.pipeline.slam import SlamConfig
        from fastmatch_tpu.pipeline.slam_scan import slam_scan
        from fastmatch_tpu.utils.evaluation import ate_rmse

        n = 10
        scene = SyntheticScene(rng, n_points=300, n_frames=n)
        if model == "radtan":
            cam = Pinhole(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                          k1=-0.2, k2=0.05, k3=0.0, p1=0.0004, p2=-0.0006)
        else:
            cam = Fisheye(fx=420.0, fy=420.0, cx=320.0, cy=240.0, **FISH)
        feats = self._features_through(rng, scene, cam)
        cfg = PipelineConfig(
            ba=BAConfig(interval=4, max_iters=10, pcg_iters=30),
            map=MapConfig(max_frames=16, max_points=2048, max_obs=16384))
        scfg = SlamConfig(window=10**6, loop_gap=10**6, loop_min_votes=10**9)
        out = slam_scan(feats, cam, cfg, scfg)
        rec = out.rec
        est = np.stack([-rec.R[f].T @ rec.t[f] for f in range(n)])
        gt = np.einsum("fji,fj->fi", scene.R[:n], -scene.t[:n])
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.05, f"{model}: ATE {ate}"
