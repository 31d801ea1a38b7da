"""KLT visual odometry (pipeline/vo.py): rendered-pixel sequences with
known trajectories -> ATE; robustness to mid-sequence track loss."""

import numpy as np
import jax.numpy as jnp
import pytest

from synth import SyntheticScene, render_scene_views
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.vo import VOConfig, visual_odometry
from fastmatch_tpu.utils.evaluation import ate_rmse


@pytest.fixture(scope="module")
def vo_scene():
    rng = np.random.default_rng(3)
    scene = SyntheticScene(rng, n_points=220, n_frames=24,
                           image_size=(320, 240))
    views = render_scene_views(scene, rng, image_size=(320, 240))
    return scene, views


def small_cfg():
    return PipelineConfig(
        ba=BAConfig(max_iters=10, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=4096, max_obs=32768))


class TestVisualOdometry:
    def test_sequence_ate(self, vo_scene):
        scene, views = vo_scene
        cam = Pinhole.from_K(scene.K)
        vo = VOConfig(capacity=512, bootstrap_px=8.0, kf_px=6.0,
                      min_parallax_px=4.0)
        rec = visual_odometry(views, cam, small_cfg(), vo)
        F = len(views)
        assert rec.n_frames == F
        assert rec.pose_mask[:F].all()
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        # scene diameter ~8; VO (no loop closure) drifts more than SfM
        assert ate < 0.3
        # never fell back to constant-position
        assert not any(s.get("pnp_failed") for s in rec.frame_stats)
        assert rec.n_points > 100

    def test_cli_vo(self, vo_scene, tmp_path, capsys):
        import json
        from fastmatch_tpu.cli import main

        scene, views = vo_scene
        for i, img in enumerate(views[:12]):
            (tmp_path / f"f{i:03d}.pgm").write_bytes(
                b"P5\n320 240\n255\n" + (img * 255).astype(np.uint8).tobytes())
        out = tmp_path / "vo.npz"
        kitti = tmp_path / "vo.txt"
        main(["--set", "map.max_frames=32",
              "vo", str(tmp_path), "--focal", str(float(scene.K[0, 0])),
              "--bootstrap-px", "8.0", "--kf-px", "6.0",
              "--out", str(out), "--export-kitti", str(kitti)])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_frames"] == 12
        assert rep["n_points"] > 50
        assert np.load(out)["centers"].shape == (12, 3)
        assert len(kitti.read_text().splitlines()) == 12

    def test_retroactive_pnp_failure_falls_back(self, vo_scene, monkeypatch):
        """If PnP fails for a pre-bootstrap frame, it must get the same
        flagged constant-position fallback as the main loop — not a
        silent identity-pose hole (ADVICE r4). Force every PnP to fail;
        every frame must still end up posed and flagged."""
        import types
        import fastmatch_tpu.pipeline.vo as vo_mod

        scene, views = vo_scene
        cam = Pinhole.from_K(scene.K)
        monkeypatch.setattr(
            vo_mod, "ransac_pnp",
            lambda *a, **k: types.SimpleNamespace(ok=False, n_inliers=0))
        vo = VOConfig(capacity=512, bootstrap_px=8.0, kf_px=6.0,
                      min_parallax_px=4.0)
        rec = visual_odometry(views[:10], cam, small_cfg(), vo)
        assert rec.n_frames == 10
        assert rec.pose_mask[:10].all()      # no identity-pose holes
        boot_f = next(s["frame"] for s in rec.frame_stats if s.get("booted"))
        for s in rec.frame_stats:
            if s["frame"] not in (0, boot_f):
                assert s.get("pnp_failed"), s

    def test_recovers_through_brief_occlusion(self, vo_scene):
        """Blank out two frames mid-sequence: tracking dies there, the
        constant-position fallback holds, and later keyframes replenish."""
        scene, views = vo_scene
        cam = Pinhole.from_K(scene.K)
        views2 = [v.copy() for v in views]
        views2[14] = np.full_like(views2[14], 0.35)
        vo = VOConfig(capacity=512, bootstrap_px=8.0, kf_px=6.0,
                      min_parallax_px=4.0)
        rec = visual_odometry(views2, cam, small_cfg(), vo)
        F = len(views2)
        assert rec.n_frames == F and rec.pose_mask[:F].all()
        # the blanked frame fell back...
        assert any(s.get("pnp_failed") for s in rec.frame_stats)
        # ...but the tail of the trajectory still tracks the ground truth
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        keep = np.ones(F, bool)
        keep[13:17] = False
        ate = float(ate_rmse(jnp.asarray(est[keep]), jnp.asarray(gt[keep])))
        assert ate < 0.6
