"""Scan-mode SLAM (pipeline/slam_scan.py): the whole sequence as one
compiled lax.scan — decision parity with the per-frame slam_device driver
on clean sequences, relocalize-next-frame on dropout, and ATE."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.slam import SlamConfig
from fastmatch_tpu.pipeline.slam_device import slam_device
from fastmatch_tpu.pipeline.slam_scan import slam_scan
from fastmatch_tpu.utils.evaluation import ate_rmse
from test_slam import CircleScene, features_of


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    scene = CircleScene(rng, n_points=300, n_frames=20)
    feats = features_of(rng, scene)
    cfg = PipelineConfig(
        ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
    )
    # Loop closure disabled: scan mode's documented scope.
    scfg = SlamConfig(window=6, loop_gap=10 ** 6, loop_min_votes=10 ** 9)
    return scene, feats, cfg, scfg


class TestSlamScan:
    def test_matches_slam_device_bitwise(self, setup):
        """Same bootstrap, keys, matching, PnP, BA cadence => on a clean
        sequence the scan must reproduce the per-frame driver exactly.

        Interval budgets are set to 0 (inherit full max/pcg iters): the
        bitwise guarantee requires the interval solves to run to the
        stagnation guard — the two engines compile ba_solve in different
        XLA contexts (standalone jit vs inside scan/cond), whose fusion
        differences perturb ~1e-5 of mid-flight PCG state. Converged
        solves erase that (stagnation iterations are numeric no-ops);
        budget-capped solves expose it — covered by the tolerance test
        below at the default capped budgets (bisected + ablation-confirmed
        when the 6/16 defaults landed)."""
        import dataclasses
        scene, feats, cfg, scfg = setup
        cfg = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, interval_max_iters=0,
                                        interval_pcg_iters=0))
        cam = Pinhole.from_K(scene.K)
        dev = slam_device(feats, cam, cfg, scfg)
        scn = slam_scan(feats, cam, cfg, scfg)
        assert scn.frame_seq == dev.frame_seq
        np.testing.assert_array_equal(scn.rec.R, dev.rec.R)
        np.testing.assert_array_equal(scn.rec.t, dev.rec.t)
        np.testing.assert_array_equal(scn.rec.points, dev.rec.points)
        np.testing.assert_array_equal(scn.rec.obs_pt, dev.rec.obs_pt)
        assert scn.rec.n_points == dev.rec.n_points
        assert scn.rec.n_obs == dev.rec.n_obs

    def test_matches_slam_device_capped_budgets(self, setup):
        """Default (capped) interval budgets: decisions still identical
        (same frames, keyframes, landmark/obs structure) and states equal
        to the fusion-noise floor — see the bitwise test's docstring."""
        scene, feats, cfg, scfg = setup
        cam = Pinhole.from_K(scene.K)
        dev = slam_device(feats, cam, cfg, scfg)
        scn = slam_scan(feats, cam, cfg, scfg)
        assert scn.frame_seq == dev.frame_seq
        assert scn.rec.n_points == dev.rec.n_points
        assert scn.rec.n_obs == dev.rec.n_obs
        np.testing.assert_array_equal(scn.rec.obs_pt, dev.rec.obs_pt)
        np.testing.assert_allclose(scn.rec.R, dev.rec.R, atol=5e-4)
        np.testing.assert_allclose(scn.rec.t, dev.rec.t, atol=5e-4)
        np.testing.assert_allclose(scn.rec.points, dev.rec.points, atol=5e-3)

    def test_ate(self, setup):
        scene, feats, cfg, scfg = setup
        cam = Pinhole.from_K(scene.K)
        out = slam_scan(feats, cam, cfg, scfg)
        est = out.rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.25, f"scan ATE {ate:.3f}"

    def test_posthoc_loop_closure(self):
        """close_loops=True: the scan's recorded votes yield verified loop
        edges, one PGO + global BA run, and ATE stays bounded on a loopy
        trajectory (same scene/config family as the slam_device loop tests,
        which find closures online)."""
        rng = np.random.default_rng(0)
        scene = CircleScene(rng, n_points=300, n_frames=26)
        feats = features_of(rng, scene)
        cfg = PipelineConfig(
            ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
            map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
        )
        scfg = SlamConfig(window=6, loop_gap=10, loop_min_votes=20)
        cam = Pinhole.from_K(scene.K)
        out = slam_scan(feats, cam, cfg, scfg, close_loops=True)
        assert len(out.loop_edges) >= 1, "no post-hoc loop closures"
        f, c = out.loop_edges[0][0], out.loop_edges[0][1]
        assert f - c >= 10
        assert out.pgo_runs == 1
        est = out.rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        gt = gt[np.asarray(out.frame_seq)]
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.25, f"post-hoc-closure ATE {ate:.3f}"

    @pytest.mark.slow
    def test_images_in_scan(self):
        """slam_scan_images: SIFT + tracking + BA inside ONE scan over raw
        rendered pixels — the full front-end with zero per-frame host
        involvement. ATE bound on a known 3D scene."""
        import dataclasses

        from synth import SyntheticScene, render_scene_views
        from fastmatch_tpu.pipeline.slam_scan import slam_scan_images

        rng = np.random.default_rng(4)
        scene = SyntheticScene(rng, n_points=60, n_frames=6,
                               image_size=(480, 360))
        views = render_scene_views(scene, rng, image_size=(480, 360))
        cfg = PipelineConfig(
            ba=BAConfig(interval=2, max_iters=8, pcg_iters=30),
            map=MapConfig(max_frames=16, max_points=2048, max_obs=16384),
        )
        cfg = dataclasses.replace(
            cfg,
            sift=cfg.sift._replace(capacity=512),  # SIFTConfig is a NamedTuple
            ransac=dataclasses.replace(cfg.ransac, min_inliers=10,
                                       thr_px=3.0),
            matching=dataclasses.replace(cfg.matching, ratio=0.85),
        )
        scfg = SlamConfig(window=8, loop_gap=10 ** 6, loop_min_votes=10 ** 9)
        cam = Pinhole.from_K(scene.K)
        out = slam_scan_images(views, cam, cfg, scfg)
        assert out.rec.n_frames == 6
        est = out.rec.camera_centers()
        gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.35, f"image-scan ATE {ate:.3f}"

    def test_chunked_matches_scan_bitwise(self, setup):
        """Chunked mode = the same compiled scan per K-frame slice with
        the window carried across boundaries; with closures disabled the
        trajectory must be bit-identical to one whole-sequence scan."""
        from fastmatch_tpu.pipeline.slam_scan import slam_chunked

        scene, feats, cfg, scfg = setup
        cam = Pinhole.from_K(scene.K)
        scn = slam_scan(feats, cam, cfg, scfg)
        chk = slam_chunked(feats, cam, cfg, scfg, chunk=7)
        assert chk.frame_seq == scn.frame_seq
        np.testing.assert_array_equal(chk.rec.R, scn.rec.R)
        np.testing.assert_array_equal(chk.rec.t, scn.rec.t)
        np.testing.assert_array_equal(chk.rec.points, scn.rec.points)
        assert chk.rec.n_obs == scn.rec.n_obs

    def test_chunked_closes_loops(self):
        """On a drifting circle with revisits, the chunked driver must
        verify closures between chunks (latency < chunk) and land the
        corrected trajectory near the online driver's quality."""
        from fastmatch_tpu.pipeline.slam_scan import slam_chunked

        rng = np.random.default_rng(1)
        scene = CircleScene(rng, n_points=300, n_frames=26)
        feats = features_of(rng, scene)
        cfg = PipelineConfig(
            ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
            map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
        )
        scfg = SlamConfig(window=6, loop_gap=10, loop_min_votes=20)
        cam = Pinhole.from_K(scene.K)
        out = slam_chunked(feats, cam, cfg, scfg, chunk=6)
        assert len(out.loop_edges) >= 1
        assert out.pgo_runs >= 1
        gt_all = -np.einsum("fji,fj->fi", scene.R, scene.t)
        gt = gt_all[np.asarray(out.frame_seq)]
        est = out.rec.camera_centers()
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.3, f"chunked ATE {ate:.3f}"

    def test_chunked_dropout_across_boundary(self, setup):
        """Failure in the last frame of a chunk: the FULL_WINDOW carry
        must cross the chunk boundary so the next chunk's first frame
        relocalizes."""
        from fastmatch_tpu.pipeline.slam_scan import slam_chunked

        scene, feats, cfg, scfg = setup
        feats = [f for f in feats]
        # chunk=5 starting at frame 2 -> chunks [2..6], [7..11], [12..16],
        # [17..19]; wreck 10 and 11 (end of the second chunk).
        for k in (10, 11):
            xy, d, m = feats[k]
            m2 = m.copy()
            live = np.where(m2)[0]
            m2[live[5:]] = False
            feats[k] = (xy, d, m2)
        cam = Pinhole.from_K(scene.K)
        out = slam_chunked(feats, cam, cfg, scfg, chunk=5)
        assert 10 not in out.frame_seq and 11 not in out.frame_seq
        assert out.frame_seq[-1] == 19
        gt_all = -np.einsum("fji,fj->fi", scene.R, scene.t)
        gt = gt_all[np.asarray(out.frame_seq)]
        est = out.rec.camera_centers()
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.3, f"ATE {ate:.3f} after boundary relocalization"

    def test_dropout_relocalizes_next_frame(self, setup):
        """Wreck two frames: the scan skips them (state unchanged inside
        the step) and the NEXT frame tracks with an unbounded window."""
        scene, feats, cfg, scfg = setup
        feats = [f for f in feats]
        for k in (10, 11):
            xy, d, m = feats[k]
            m2 = m.copy()
            live = np.where(m2)[0]
            m2[live[5:]] = False
            feats[k] = (xy, d, m2)
        cam = Pinhole.from_K(scene.K)
        out = slam_scan(feats, cam, cfg, scfg)
        assert 10 not in out.frame_seq and 11 not in out.frame_seq
        assert out.frame_seq[-1] == 19
        gt_all = -np.einsum("fji,fj->fi", scene.R, scene.t)
        gt = gt_all[np.asarray(out.frame_seq)]
        est = out.rec.camera_centers()
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.3, f"ATE {ate:.3f} after scan relocalization"
