"""Metric stereo visual odometry (pipeline/stereo_vo.py): rendered
left/right blob sequences with known trajectory -> metric-scale ATE.

The right camera is the left one displaced by the baseline along its own
+x axis (rectified rig); both views render with identical landmark
appearance draws so the stereo correlator sees a true rectified pair."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from synth import SyntheticScene, render_scene_views
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.stereo_vo import StereoVOConfig, stereo_visual_odometry
from fastmatch_tpu.utils.evaluation import align_umeyama

BASELINE = 0.1
SIZE = (320, 240)


def _right_scene(scene, baseline):
    """Same trajectory, camera displaced by ``baseline`` along camera +x:
    x_cam_r = R X + t - [b, 0, 0] (pure horizontal disparity)."""
    w, h = SIZE
    t_r = scene.t - np.array([baseline, 0.0, 0.0])
    cam = np.einsum("fij,pj->fpi", scene.R, scene.points) + t_r[:, None, :]
    z = cam[..., 2]
    uv = (cam[..., :2] / np.clip(z[..., None], 1e-9, None)) @ np.diag(
        [scene.K[0, 0], scene.K[1, 1]]) + scene.K[:2, 2]
    vis = ((z > 0.1) & (uv[..., 0] >= 0) & (uv[..., 0] < w)
           & (uv[..., 1] >= 0) & (uv[..., 1] < h))
    return SimpleNamespace(points=scene.points, R=scene.R, t=t_r,
                           K=scene.K, pixels=uv, visible=vis)


@pytest.fixture(scope="module")
def stereo_seq():
    rng = np.random.default_rng(3)
    # 28 frames over the default arc keeps per-frame flow ~12 px —
    # inside the 4-level KLT basin (same regime as test_vo's oracle).
    scene = SyntheticScene(rng, n_points=220, n_frames=28, image_size=SIZE)
    # Identical rng seed for both renders -> identical per-landmark
    # appearance (amps/sigmas/satellites), true stereo correlation.
    left = render_scene_views(scene, np.random.default_rng(11),
                              image_size=SIZE)
    right = render_scene_views(_right_scene(scene, BASELINE),
                               np.random.default_rng(11), image_size=SIZE)
    return scene, left, right


def small_cfg():
    return PipelineConfig(
        ba=BAConfig(max_iters=10, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=8192, max_obs=32768))


class TestStereoVO:
    def test_metric_trajectory(self, stereo_seq):
        scene, left, right = stereo_seq
        cam = Pinhole.from_K(scene.K)
        from fastmatch_tpu.features.klt import KLTConfig

        rec = stereo_visual_odometry(
            left, right, cam, BASELINE, small_cfg(),
            StereoVOConfig(klt=KLTConfig(levels=4)))
        F = len(left)
        assert rec.n_frames == F and rec.pose_mask[:F].all()
        # Occasional flagged constant-position fallbacks are tolerated
        # (fast apparent motion on this narrow-FOV oracle); the metric
        # assertions below are the contract.
        assert sum(1 for s in rec.frame_stats
                   if s.get("pnp_failed")) <= 3
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        # Scale must come out METRIC: the similarity fit's scale ~ 1.
        s, _, _ = align_umeyama(jnp.asarray(est), jnp.asarray(gt))
        assert abs(float(s) - 1.0) < 0.03, float(s)
        # Rigid-only ATE (no scale correction allowed).
        _, R, t = align_umeyama(jnp.asarray(est), jnp.asarray(gt),
                                with_scale=False)
        aligned = est @ np.asarray(R).T + np.asarray(t)
        ate = float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1))))
        assert ate < 0.15, ate
        assert rec.n_points > 100

    def test_textureless_right_degrades_gracefully(self, stereo_seq):
        """A blank right stream gives no disparity -> frame 0 lifts
        nothing, every later PnP falls back; the engine must not crash
        and must flag the failures."""
        scene, left, _ = stereo_seq
        cam = Pinhole.from_K(scene.K)
        flat = [np.full_like(l, 0.35) for l in left[:6]]
        rec = stereo_visual_odometry(left[:6], flat, cam, BASELINE,
                                     small_cfg(), StereoVOConfig())
        assert rec.n_frames == 6 and rec.pose_mask[:6].all()
        assert any(s.get("pnp_failed") for s in rec.frame_stats)

    def test_cli_stereo_vo(self, stereo_seq, tmp_path, capsys):
        import json

        from fastmatch_tpu.cli import main

        scene, left, right = stereo_seq
        (tmp_path / "L").mkdir()
        (tmp_path / "R").mkdir()
        for i in range(10):
            for d, img in (("L", left[i]), ("R", right[i])):
                (tmp_path / d / f"f{i:03d}.pgm").write_bytes(
                    b"P5\n320 240\n255\n"
                    + (img * 255).astype(np.uint8).tobytes())
        out = tmp_path / "svo.npz"
        rc = main(["--set", "map.max_frames=32",
                   "vo", str(tmp_path / "L"), "--right", str(tmp_path / "R"),
                   "--baseline", str(BASELINE),
                   "--focal", str(float(scene.K[0, 0])),
                   "--out", str(out)])
        assert rc in (0, None)
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_frames"] == 10 and rep["pnp_failures"] == 0
        data = np.load(out)
        assert data["centers"].shape == (10, 3)
