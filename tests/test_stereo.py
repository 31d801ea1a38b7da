"""Dense stereo (dense/stereo.py): analytic disparity oracles, occlusion
gating, rectification geometry, point-cloud packaging, cv2 StereoBM
cross-check."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.dense.stereo import (StereoConfig, depth_from_disparity,
                                        disparity_to_points, rectify_pair,
                                        stereo_disparity)


def wave_texture(rng, h, w, n_waves=32, fmax=0.18):
    """Band-limited wave-sum texture, evaluable at ARBITRARY per-pixel
    sample coordinates — exact subpixel/warped renders for oracles."""
    freq = rng.uniform(0.02, fmax, (n_waves, 2))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves)
    yy0, xx0 = np.mgrid[0:h, 0:w].astype(np.float64)

    def at(xs, ys):
        img = np.zeros_like(xs, np.float64)
        for (fy, fx), p, a in zip(freq, phase, amp):
            img += a * np.cos(2 * np.pi * (fx * xs + fy * ys) + p)
        return img

    base = at(xx0, yy0)
    lo, span = base.min(), base.max() - base.min()

    def render(xs=None, ys=None):
        v = base if xs is None else at(xs, ys)
        return ((v - lo) / span).astype(np.float32)

    return render


def make_rectified_pair(rng, h=120, w=240, disp_fn=None):
    """Left = texture at the pixel grid; right warped so that LEFT pixel
    (y, x) matches right (y, x - d(y, x)) — the module's left-referenced
    disparity convention, exact for fractional and spatially-varying d.

    For varying d the right image samples T(xL) at xR where
    xL - d(y, xL) = xR; solved per pixel by fixed-point iteration
    (converges for |dd/dx| < 1). A naive render(x + d(x)) would bake in a
    RIGHT-referenced disparity — off by d * dd/dx, ~1 px on steep slants.
    """
    render = wave_texture(rng, h, w)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if disp_fn is None:
        disp_fn = lambda yy, xx: np.full_like(xx, 12.0)
    d = disp_fn(yy, xx)
    xL = xx + d
    for _ in range(25):
        xL = xx + disp_fn(yy, xL)
    return render(), render(xL, yy), d


class TestDisparity:
    def test_constant_disparity(self, rng):
        left, right, d_gt = make_rectified_pair(rng)
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        v = np.asarray(valid)
        assert v.mean() > 0.5
        err = np.abs(np.asarray(disp)[v] - d_gt[v])
        assert np.median(err) < 0.25
        assert np.quantile(err, 0.9) < 0.5

    def test_subpixel_constant(self, rng):
        left, right, _ = make_rectified_pair(
            rng, disp_fn=lambda yy, xx: np.full_like(xx, 7.4))
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        v = np.asarray(valid)
        assert v.mean() > 0.5
        err = np.asarray(disp)[v] - 7.4
        # subpixel interpolation: bias well under the integer grid
        assert np.abs(np.median(err)) < 0.15
        assert np.quantile(np.abs(err), 0.9) < 0.4

    def test_slanted_plane(self, rng):
        # fixed denominator: disp_fn is re-evaluated at off-grid x during
        # the oracle's fixed-point warp, so it must be a pure function
        left, right, d_gt = make_rectified_pair(
            rng, disp_fn=lambda yy, xx: 6.0 + 14.0 * xx / 239.0)
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        v = np.asarray(valid)
        assert v.mean() > 0.4
        err = np.abs(np.asarray(disp)[v] - d_gt[v])
        assert np.median(err) < 0.15

    def test_textureless_invalid(self, rng):
        left, right, _ = make_rectified_pair(rng)
        left[:, :80] = 0.5
        right[:, :80] = 0.5
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        v = np.asarray(valid)
        assert v[:, 10:60].mean() < 0.05      # flat region rejected
        assert v[:, 120:].mean() > 0.4        # textured region kept

    def test_depth_and_points(self, rng):
        left, right, _ = make_rectified_pair(rng)
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        fx, baseline = 300.0, 0.1
        depth = depth_from_disparity(disp, valid, fx, baseline)
        v = np.asarray(valid)
        z = np.asarray(depth)[v]
        assert np.allclose(np.median(z), fx * baseline / 12.0, rtol=0.05)
        K = np.array([[fx, 0, 120.0], [0, fx, 60.0], [0, 0, 1.0]])
        pts, inten = disparity_to_points(disp, valid, K, baseline,
                                         image=left, stride=2)
        assert len(pts) > 500 and len(pts) == len(inten)
        assert np.allclose(np.median(pts[:, 2]), fx * baseline / 12.0,
                           rtol=0.05)

    def test_cv2_stereobm_crosscheck(self, rng):
        cv2 = pytest.importorskip("cv2")
        left, right, d_gt = make_rectified_pair(
            rng, disp_fn=lambda yy, xx: 8.0 + 8.0 * yy / 119.0)
        disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right))
        bm = cv2.StereoBM_create(numDisparities=64, blockSize=9)
        cvd = bm.compute((left * 255).astype(np.uint8),
                         (right * 255).astype(np.uint8)).astype(np.float32)
        cvd /= 16.0
        both = np.asarray(valid) & (cvd > 0)
        assert both.mean() > 0.3
        # both engines against ground truth on the common support
        ours = np.abs(np.asarray(disp)[both] - d_gt[both])
        theirs = np.abs(cvd[both] - d_gt[both])
        assert np.median(ours) < max(0.4, 1.1 * np.median(theirs))


class TestShardedStereo:
    def test_batch_sharded_equals_single(self, rng):
        """DP over the 8-device CPU mesh: per-pair results bit-equal to
        the unsharded sweep (each pair's sweep is self-contained)."""
        import jax
        from fastmatch_tpu.dense.stereo import stereo_batch
        from fastmatch_tpu.dist.mesh import batch_sharding, make_mesh

        pairs = [make_rectified_pair(rng, h=48, w=128,
                                     disp_fn=lambda yy, xx, d=3 + k:
                                     np.full_like(xx, float(d)))
                 for k in range(8)]
        L = jnp.asarray(np.stack([p[0] for p in pairs]))
        R = jnp.asarray(np.stack([p[1] for p in pairs]))
        cfg = StereoConfig(max_disp=16)
        mesh = make_mesh(n_data=8, n_bank=1)
        Ls = jax.device_put(L, batch_sharding(mesh))
        Rs = jax.device_put(R, batch_sharding(mesh))
        d_sh, v_sh = stereo_batch(Ls, Rs, cfg)
        d_ref, v_ref = stereo_batch(L, R, cfg)
        assert np.array_equal(np.asarray(d_sh), np.asarray(d_ref))
        assert np.array_equal(np.asarray(v_sh), np.asarray(v_ref))
        # and each pair recovered its own disparity level
        for k in range(8):
            v = np.asarray(v_sh[k])
            assert v.mean() > 0.3
            assert abs(np.median(np.asarray(d_sh[k])[v]) - (3 + k)) < 0.3


class TestCLIStereo:
    def test_stereo_command(self, rng, tmp_path, capsys):
        import json
        from fastmatch_tpu.cli import main
        from fastmatch_tpu.utils.export import load_ply

        left, right, _ = make_rectified_pair(rng)
        for name, img in (("l.pgm", left), ("r.pgm", right)):
            (tmp_path / name).write_bytes(
                b"P5\n240 120\n255\n" + (img * 255).astype(np.uint8).tobytes())
        out = tmp_path / "d.npz"
        ply = tmp_path / "d.ply"
        main(["stereo", str(tmp_path / "l.pgm"), str(tmp_path / "r.pgm"),
              "--baseline", "0.1", "--focal", "300", "--out", str(out),
              "--export-ply", str(ply)])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["valid_frac"] > 0.4
        assert rep["median_depth"] == pytest.approx(300 * 0.1 / 12.0,
                                                    rel=0.08)
        data = np.load(out)
        assert data["disparity"].shape == (120, 240)
        pts, cols = load_ply(str(ply))
        assert len(np.asarray(pts)) == rep["n_points"]
        assert cols is not None


class TestRectify:
    def test_already_rectified_identity(self, rng):
        """Pure-x translation with identity rotation: rectification must
        be (nearly) a no-op and preserve the image."""
        h, w = 120, 240
        left = wave_texture(rng, h, w)()
        R = np.eye(3)
        t = np.array([-0.5, 0.0, 0.0])   # b to the right of a
        ra, rb, info = rectify_pair(jnp.asarray(left), jnp.asarray(left),
                                    np.array([[300.0, 0, 120], [0, 300.0, 60],
                                              [0, 0, 1]]), R, t)
        assert info["baseline"] == pytest.approx(0.5)
        interior = np.s_[10:-10, 10:-10]
        assert np.abs(np.asarray(ra)[interior] - left[interior]).max() < 1e-3

    def test_forward_motion_raises(self, rng):
        """A baseline (near-)parallel to the optical axis cannot be
        rectified; the old code emitted NaN into both warps (ADVICE r4).
        densify() treats the ValueError as 'skip this pair'."""
        K = np.array([[300.0, 0, 120], [0, 300.0, 60], [0, 0, 1]])
        img = jnp.zeros((120, 240))
        with pytest.raises(ValueError, match="parallel to"):
            rectify_pair(img, img, K, np.eye(3),
                         np.array([0.0, 0.0, -0.5]))  # pure forward
        # slightly off-axis but still >0.99 aligned: also degenerate
        t = np.array([0.05, 0.0, -1.0])
        with pytest.raises(ValueError, match="parallel to"):
            rectify_pair(img, img, K, np.eye(3), t)
        # clearly oblique: fine, and NaN-free
        ra, rb, _ = rectify_pair(img + 0.5, img + 0.5, K, np.eye(3),
                                 np.array([-0.4, 0.0, -0.4]))
        assert np.isfinite(np.asarray(ra)).all()
        assert np.isfinite(np.asarray(rb)).all()

    def test_synthetic_scene_epipolar(self, rng):
        """After rectification, true correspondences share a scan line."""
        from synth import SyntheticScene

        scene = SyntheticScene(rng, n_points=200, n_frames=2,
                               image_size=(320, 240))
        K = scene.K
        R_ab = scene.R[1] @ scene.R[0].T
        t_ab = scene.t[1] - R_ab @ scene.t[0]
        _, _, info = rectify_pair(jnp.zeros((240, 320)), jnp.zeros((240, 320)),
                                  K, R_ab, t_ab)
        Rr = info["R_rect_a"]
        vis = scene.visible[0] & scene.visible[1]
        pts = scene.points[vis]
        # project into both rectified cameras
        Xa = pts @ scene.R[0].T + scene.t[0]
        Xb = pts @ scene.R[1].T + scene.t[1]
        Ra = Rr
        Rb = Rr @ R_ab.T
        pa = (Xa @ Ra.T) @ K.T
        pb = (Xb @ Rb.T) @ K.T
        ya = pa[:, 1] / pa[:, 2]
        yb = pb[:, 1] / pb[:, 2]
        assert np.abs(ya - yb).max() < 0.2    # same scan line
        xa = pa[:, 0] / pa[:, 2]
        xb = pb[:, 0] / pb[:, 2]
        d = xa - xb
        assert (d > -0.2).all() or (d < 0.2).all()  # one-signed disparity
