"""KLT pyramidal tracking (features/klt.py): analytic-texture flow
oracles, cv2 calcOpticalFlowPyrLK parity, Shi-Tomasi detection, and a
two-view pose-from-flow integration (the front-end contract)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.features.klt import (KLTConfig, build_pyramid, shi_tomasi,
                                        track, track_pair, track_pyramids)


def cosine_texture(rng, h, w, n_waves=32):
    """Smooth band-limited texture with an ANALYTIC shifted evaluation:
    T(x - dx, y - dy) is exact for any subpixel (dx, dy). Frequencies stay
    under 0.18 cycles/px: bilinear resampling bias grows with frequency
    (an inherent property of forward-additive LK, cv2 included), and many
    incommensurate waves avoid periodic-lattice false locks."""
    freq = rng.uniform(0.02, 0.18, (n_waves, 2))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves)

    def render(dx=0.0, dy=0.0):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        img = np.zeros((h, w))
        for (fy, fx), p, a in zip(freq, phase, amp):
            img += a * np.cos(2 * np.pi * (fx * (xx - dx) + fy * (yy - dy)) + p)
        img -= img.min()
        img /= img.max()
        return img.astype(np.float32)

    return render


def grid_points(h, w, step=24, border=20, cap=128):
    ys, xs = np.mgrid[border:h - border:step, border:w - border:step]
    pts = np.stack([xs.reshape(-1), ys.reshape(-1)], 1).astype(np.float32)
    n = len(pts)
    out = np.zeros((cap, 2), np.float32)
    out[:n] = pts[:cap]
    mask = np.zeros(cap, bool)
    mask[:min(n, cap)] = True
    return jnp.asarray(out), jnp.asarray(mask)


class TestTrack:
    @pytest.mark.parametrize("shift", [(3.0, -2.0), (0.4, 0.7), (6.4, 3.3)])
    def test_pure_translation_subpixel(self, rng, shift):
        render = cosine_texture(rng, 160, 200)
        dx, dy = shift
        img0, img1 = render(), render(dx, dy)
        pts, mask = grid_points(160, 200)
        new_pts, status, err = track(jnp.asarray(img0), jnp.asarray(img1),
                                     pts, mask)
        st = np.asarray(status)
        assert st.sum() >= 0.8 * np.asarray(mask).sum()
        flow = np.asarray(new_pts - pts)[st]
        e = np.hypot(flow[:, 0] - dx, flow[:, 1] - dy)
        assert np.median(e) < 0.1
        assert np.quantile(e, 0.9) < 0.3

    def test_rotation_warp(self, rng):
        """Small rotation about the image center: per-point ground-truth
        displacement varies across the image."""
        h, w = 160, 200
        th = np.deg2rad(2.0)
        c, s = np.cos(th), np.sin(th)
        ctr = np.array([w / 2, h / 2])
        render = cosine_texture(rng, h, w)
        img0 = render()
        # img1(x) = img0(R^-1 (x - ctr) + ctr): evaluate wave-by-wave.
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        X = np.stack([xx - ctr[0], yy - ctr[1]], -1)
        Xr = X @ np.array([[c, -s], [s, c]])  # rows: R^-1 = R(-th)
        # Resample img0 at the rotated coordinates (scipy bicubic keeps
        # this an independent oracle).
        from scipy.ndimage import map_coordinates
        img1 = map_coordinates(img0.astype(np.float64),
                               [Xr[..., 1] + ctr[1], Xr[..., 0] + ctr[0]],
                               order=3, mode="nearest").astype(np.float32)
        pts, mask = grid_points(h, w)
        new_pts, status, _ = track(jnp.asarray(img0), jnp.asarray(img1),
                                   pts, mask)
        st = np.asarray(status)
        P = np.asarray(pts)[st] - ctr
        gt = P @ np.array([[c, s], [-s, c]]) + ctr  # forward map of the point
        assert st.sum() >= 0.7 * np.asarray(mask).sum()
        assert np.linalg.norm(np.asarray(new_pts)[st] - gt, axis=1).max() < 0.3

    def test_textureless_points_flagged(self, rng):
        img0 = np.full((128, 128), 0.5, np.float32)
        img0[:, 64:] = cosine_texture(rng, 128, 64)()
        img1 = img0.copy()
        pts = jnp.asarray(np.array([[20.0, 40.0], [30.0, 80.0],
                                    [100.0, 64.0], [90.0, 30.0]],
                                   np.float32))
        mask = jnp.ones(4, bool)
        _, status, _ = track(jnp.asarray(img0), jnp.asarray(img1), pts, mask)
        st = np.asarray(status)
        assert not st[0] and not st[1]       # flat half: no gradient
        assert st[2]                          # textured half tracks

    def test_large_motion_needs_pyramid(self, rng):
        """A 12 px shift exceeds the single-level search margin; the
        3-level pyramid recovers it, a 1-level config does not."""
        render = cosine_texture(rng, 160, 200, n_waves=40)
        img0, img1 = render(), render(12.0, 0.0)
        pts, mask = grid_points(160, 200)
        ok_pyr = track(jnp.asarray(img0), jnp.asarray(img1), pts, mask,
                       KLTConfig(levels=3))[1]
        ok_flat = track(jnp.asarray(img0), jnp.asarray(img1), pts, mask,
                        KLTConfig(levels=1))[1]
        n_pyr = int(np.asarray(ok_pyr).sum())
        n_flat = int(np.asarray(ok_flat).sum())
        assert n_pyr >= 0.8 * int(np.asarray(mask).sum())
        assert n_pyr > 2 * max(n_flat, 1)

    def test_cv2_oracle(self, rng):
        """Endpoint parity with cv2.calcOpticalFlowPyrLK on a real warp."""
        cv2 = pytest.importorskip("cv2")
        from scipy.ndimage import map_coordinates
        h, w = 192, 256
        img0 = cosine_texture(rng, h, w, n_waves=40)()
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        # Mild affine warp.
        A = np.array([[1.01, 0.004], [-0.003, 0.995]])
        b = np.array([3.2, -1.7])
        Ai = np.linalg.inv(A)
        src = np.stack([xx - b[0], yy - b[1]], -1) @ Ai.T
        img1 = map_coordinates(img0.astype(np.float64),
                               [src[..., 1], src[..., 0]], order=3,
                               mode="nearest").astype(np.float32)
        pts, mask = grid_points(h, w, step=20)
        cfg = KLTConfig(levels=3, win=11, iters=10)
        ours, st, _ = track(jnp.asarray(img0), jnp.asarray(img1), pts, mask,
                            cfg)
        p0 = np.asarray(pts)[np.asarray(mask)].astype(np.float32)
        cvp, cvst, _ = cv2.calcOpticalFlowPyrLK(
            (img0 * 255).astype(np.uint8), (img1 * 255).astype(np.uint8),
            p0.reshape(-1, 1, 2), None, winSize=(11, 11), maxLevel=2,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10,
                      0.01))
        cvp = cvp.reshape(-1, 2)
        both = np.asarray(st)[:len(p0)] & (cvst.reshape(-1) == 1)
        assert both.sum() > 0.7 * len(p0)
        d = np.linalg.norm(np.asarray(ours)[:len(p0)][both] - cvp[both],
                           axis=1)
        assert np.median(d) < 0.3 and d.max() < 1.5

    def test_pyramid_reuse_matches_wrapper(self, rng):
        render = cosine_texture(rng, 128, 160)
        img0, img1 = jnp.asarray(render()), jnp.asarray(render(2.0, 1.0))
        pts, mask = grid_points(128, 160)
        cfg = KLTConfig()
        a = track(img0, img1, pts, mask, cfg)
        b = track_pyramids(build_pyramid(img0, cfg), build_pyramid(img1, cfg),
                           pts, mask, cfg)
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


class TestShiTomasi:
    def test_detects_corners_not_edges(self):
        img = np.full((128, 128), 0.2, np.float32)
        img[40:90, 30:100] = 0.9            # rectangle: 4 corners + edges
        kps = shi_tomasi(jnp.asarray(img), capacity=128)
        m = np.asarray(kps.mask)
        xy = np.asarray(kps.xy)[m]
        corners = np.array([[30, 40], [99, 40], [30, 89], [99, 89]],
                           np.float32)
        # every true corner found within 2 px
        for c in corners:
            assert np.linalg.norm(xy - c, axis=1).min() < 2.0
        # and nothing on the flat interior
        inside = ((xy[:, 0] > 40) & (xy[:, 0] < 90)
                  & (xy[:, 1] > 50) & (xy[:, 1] < 80))
        assert not inside.any()

    def test_min_dist_is_usable(self, rng):
        """min_dist feeds the static NMS window size, so it must be a
        static argname — a non-default value used to raise
        TracerArrayConversionError at trace time (ADVICE r4)."""
        img = cosine_texture(rng, 128, 160)()
        kps = shi_tomasi(jnp.asarray(img), capacity=64, min_dist=5)
        xy = np.asarray(kps.xy)[np.asarray(kps.mask)]
        assert len(xy) > 8
        # NMS with radius 5: detections are strictly separated
        d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 5.0

    def test_cv2_goodfeatures_overlap(self, rng):
        cv2 = pytest.importorskip("cv2")
        from synth import render_blob_image
        img = render_blob_image(rng, (192, 256), n_blobs=60)
        kps = shi_tomasi(jnp.asarray(img), capacity=256)
        ours = np.asarray(kps.xy)[np.asarray(kps.mask)]
        cvp = cv2.goodFeaturesToTrack((img * 255).astype(np.uint8), 100,
                                      0.05, 5)
        cvp = cvp.reshape(-1, 2)
        hit = sum(1 for c in cvp
                  if np.linalg.norm(ours - c, axis=1).min() < 3.0)
        assert hit > 0.7 * len(cvp)


class TestCLIFlow:
    def test_flow_command(self, rng, tmp_path, capsys):
        import json
        from synth import SyntheticScene, render_scene_views
        from fastmatch_tpu.cli import main

        scene = SyntheticScene(rng, n_points=100, n_frames=20,
                               image_size=(320, 240))
        views = render_scene_views(scene, rng, image_size=(320, 240),
                                   frames=[0, 1])
        paths = []
        for i, img in enumerate(views):
            p = tmp_path / f"f{i}.pgm"
            p.write_bytes(b"P5\n320 240\n255\n"
                          + (img * 255).astype(np.uint8).tobytes())
            paths.append(str(p))
        out = tmp_path / "flow.npz"
        main(["flow", paths[0], paths[1], "--capacity", "256",
              "--verify", "fundamental", "--out", str(out)])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_tracked"] > 30
        assert rep["n_final"] > 20
        data = np.load(out)
        assert data["xy_a"].shape == data["xy_b"].shape
        assert len(data["xy_a"]) == rep["n_final"]


class TestTwoViewFromFlow:
    def test_pose_from_tracked_points(self, rng):
        """track_pair correspondences through essential RANSAC recover the
        relative pose between two rendered views — flow as a front-end."""
        import jax
        from synth import SyntheticScene, render_scene_views
        from fastmatch_tpu.geometry.ransac import ransac_essential

        # 20-frame trajectory -> adjacent views a few px apart: the
        # small-baseline regime KLT exists for (wide baselines are the
        # descriptor matchers' job).
        scene = SyntheticScene(rng, n_points=160, n_frames=20,
                               image_size=(320, 240))
        views = render_scene_views(scene, rng, image_size=(320, 240),
                                   frames=[0, 1])
        p0, p1, st, _ = track_pair(views[0], views[1], capacity=512)
        st = np.asarray(st)
        assert st.sum() > 40
        K = scene.K
        x0 = (np.asarray(p0) - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
        x1 = (np.asarray(p1) - K[:2, 2]) / np.array([K[0, 0], K[1, 1]])
        cap = 256
        xa = np.zeros((cap, 2), np.float32)
        xb = np.zeros((cap, 2), np.float32)
        pm = np.zeros(cap, bool)
        sel = np.where(st)[0][:cap]
        xa[:len(sel)], xb[:len(sel)] = x0[sel], x1[sel]
        pm[:len(sel)] = True
        res = ransac_essential(jax.random.PRNGKey(0), jnp.asarray(xa),
                               jnp.asarray(xb), jnp.asarray(pm),
                               thr=(2.0 / K[0, 0]) ** 2, n_hyp=512,
                               min_inliers=16)
        assert bool(res.ok)
        R_gt = scene.R[1] @ scene.R[0].T
        t_gt = scene.t[1] - R_gt @ scene.t[0]
        t_gt = t_gt / np.linalg.norm(t_gt)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(res.R) @ R_gt.T) - 1) / 2, -1, 1)))
        tdot = abs(float(np.asarray(res.t) @ t_gt))
        assert ang < 3.0 and tdot > 0.99
