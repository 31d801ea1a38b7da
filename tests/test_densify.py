"""Dense mapping (dense/densify.py): fused stereo clouds against the
synthetic scene's known 3D structure."""

import numpy as np
import jax.numpy as jnp
import pytest

from synth import SyntheticScene, render_scene_views
from fastmatch_tpu.dense.densify import densify, select_pairs
from fastmatch_tpu.dense.stereo import StereoConfig


@pytest.fixture(scope="module")
def posed_scene():
    rng = np.random.default_rng(5)
    scene = SyntheticScene(rng, n_points=200, n_frames=12,
                           image_size=(320, 240))
    views = render_scene_views(scene, rng, image_size=(320, 240))
    return scene, [np.asarray(v, np.float32) for v in views]


class TestSelectPairs:
    def test_ratio_gate(self):
        # cameras along x at spacing 0.1; median depth 2 -> ratio 0.05/step
        F = 6
        R = np.tile(np.eye(3), (F, 1, 1))
        C = np.stack([np.arange(F) * 0.1, np.zeros(F), np.zeros(F)], 1)
        t = -np.einsum("fij,fj->fi", R, C)
        pairs = select_pairs(R, t, median_depth=2.0, min_ratio=0.04)
        assert pairs == [(i, i + 1) for i in range(F - 1)]
        # tighter min ratio: needs a 2-step baseline
        pairs = select_pairs(R, t, median_depth=2.0, min_ratio=0.08)
        assert (0, 2) in pairs and all(j - i >= 2 for i, j in pairs)


class TestDensify:
    def test_cloud_matches_scene_structure(self, posed_scene):
        """Fused stereo points (blob surfaces are where the texture is)
        must lie near the scene's true landmark positions, at the true
        scale — ground-truth poses in, metric structure out."""
        scene, views = posed_scene
        pts, inten, rep = densify(
            views, scene.R, scene.t, scene.K,
            sparse_points=scene.points,
            cfg=StereoConfig(max_disp=64, min_zncc=0.6))
        assert rep["pairs_used"] >= 3
        assert len(pts) > 300
        d = np.linalg.norm(pts[:, None, :] - scene.points[None, :500, :],
                           axis=-1).min(axis=1)
        # scene diameter ~8: most dense points sit on real structure
        assert np.median(d) < 0.25
        assert (d < 0.5).mean() > 0.7

    def test_cli_densify(self, posed_scene, tmp_path, capsys):
        import json
        from fastmatch_tpu.cli import main
        from fastmatch_tpu.utils.export import load_ply

        scene, views = posed_scene
        for i, img in enumerate(views):
            (tmp_path / f"f{i:03d}.pgm").write_bytes(
                b"P5\n320 240\n255\n" + (img * 255).astype(np.uint8).tobytes())
        traj = tmp_path / "traj.npz"
        np.savez(traj, R=scene.R.astype(np.float32),
                 t=scene.t.astype(np.float32),
                 points=scene.points.astype(np.float32))
        ply = tmp_path / "dense.ply"
        main(["densify", str(tmp_path), "--traj", str(traj),
              "--focal", str(float(scene.K[0, 0])),
              "--export-ply", str(ply)])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["pairs_used"] >= 3
        pts, cols = load_ply(str(ply))
        assert len(pts) == rep["n_points"] and cols is not None
