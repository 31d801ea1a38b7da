"""Scan-mode visual odometry (pipeline/vo_scan.py): equal-quality ATE vs
the host engine on the same rendered oracle, the occlusion-recovery
contract, and the CLI surface."""

import numpy as np
import jax.numpy as jnp
import pytest

from synth import SyntheticScene, render_scene_views
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.vo import VOConfig
from fastmatch_tpu.pipeline.vo_scan import visual_odometry_scan
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


def vo_cfg():
    return VOConfig(capacity=512, bootstrap_px=8.0, kf_px=6.0,
                    min_parallax_px=4.0)


class TestVOScan:
    def test_sequence_ate(self, vo_scene):
        scene, views = vo_scene
        cam = Pinhole.from_K(scene.K)
        rec = visual_odometry_scan(views, cam, small_cfg(), vo_cfg())
        F = len(views)
        assert rec.n_frames == F
        assert rec.pose_mask[:F].all()
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        # same bound as the host engine on this oracle (test_vo)
        assert ate < 0.3
        assert not any(s.get("pnp_failed") for s in rec.frame_stats)
        assert rec.n_points > 100
        # one stat per frame, in order, keyframes present
        assert [s["frame"] for s in rec.frame_stats] == list(range(F))
        assert sum(1 for s in rec.frame_stats if s.get("kf")) >= 3

    def test_occlusion_recovery(self, vo_scene):
        """The host engine's robustness contract holds in scan mode: a
        blanked frame kills tracking, the constant-position fallback keeps
        every frame posed, and replenished keyframes recover the tail."""
        scene, views = vo_scene
        cam = Pinhole.from_K(scene.K)
        views2 = [v.copy() for v in views]
        views2[14] = np.full_like(views2[14], 0.35)
        rec = visual_odometry_scan(views2, cam, small_cfg(), vo_cfg())
        F = len(views2)
        assert rec.n_frames == F and rec.pose_mask[:F].all()
        assert any(s.get("pnp_failed") for s in rec.frame_stats)
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        keep = np.ones(F, bool)
        keep[13:17] = False
        ate = float(ate_rmse(jnp.asarray(est[keep]), jnp.asarray(gt[keep])))
        assert ate < 0.6

    def test_cli_vo_scan(self, vo_scene, tmp_path, capsys):
        import json
        from fastmatch_tpu.cli import main

        scene, views = vo_scene
        for i, img in enumerate(views[:14]):
            (tmp_path / f"f{i:03d}.pgm").write_bytes(
                b"P5\n320 240\n255\n" + (img * 255).astype(np.uint8).tobytes())
        out = tmp_path / "vo.npz"
        main(["--set", "map.max_frames=32",
              "vo", str(tmp_path), "--focal", str(float(scene.K[0, 0])),
              "--bootstrap-px", "8.0", "--kf-px", "6.0",
              "--engine", "scan", "--out", str(out)])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_frames"] == 14
        assert rep["n_points"] > 50
        assert np.load(out)["centers"].shape == (14, 3)
