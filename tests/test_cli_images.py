"""End-to-end CLI reconstruct from an image directory: rendered 3D scene ->
native FrameLoader prefetch -> SIFT detect -> match -> RANSAC pose -> BA.
The full front-end on real pixels with known geometry (SURVEY.md §5.2
"Integration")."""

import json

import numpy as np
import pytest

from synth import SyntheticScene, render_scene_views


@pytest.mark.slow
def test_cli_reconstruct_image_dir(tmp_path, capsys):
    rng = np.random.default_rng(4)
    scene = SyntheticScene(rng, n_points=60, n_frames=5, image_size=(480, 360))
    views = render_scene_views(scene, rng, image_size=(480, 360))
    for i, img in enumerate(views):
        with open(tmp_path / f"frame{i:03d}.pgm", "wb") as fh:
            fh.write(b"P5\n480 360\n255\n" + (img * 255).astype(np.uint8).tobytes())

    from fastmatch_tpu.cli import main

    out = tmp_path / "rec.npz"
    main([
        "--set", "sift.capacity=512",
        "--set", "ba.interval=2",
        "--set", "ransac.min_inliers=10",
        "--set", "ransac.thr_px=3.0",
        "--set", "matching.ratio=0.85",
        "reconstruct", str(tmp_path), "--focal", "500.0", "--out", str(out),
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_frames"] == 5
    assert rep["n_points"] > 30

    # Trajectory sanity: ATE after sim(3) alignment well under the orbit
    # radius (cameras span ~3.5 world units here).
    import jax.numpy as jnp
    from fastmatch_tpu.utils.evaluation import ate_rmse

    data = np.load(out)
    est_centers = data["centers"]
    gt_centers = np.einsum("fji,fj->fi", scene.R, -scene.t)
    ate = float(ate_rmse(jnp.asarray(est_centers), jnp.asarray(gt_centers)))
    assert ate < 0.35, ate


@pytest.mark.slow
def test_cli_reconstruct_decode_error_is_loud(tmp_path):
    """A frame the native loader can't decode must abort the run (silently
    skipping would shift every later pose against the file list)."""
    rng = np.random.default_rng(4)
    scene = SyntheticScene(rng, n_points=60, n_frames=3, image_size=(480, 360))
    views = render_scene_views(scene, rng, image_size=(480, 360))
    for i, img in enumerate(views):
        with open(tmp_path / f"frame{i:03d}.pgm", "wb") as fh:
            fh.write(b"P5\n480 360\n255\n" + (img * 255).astype(np.uint8).tobytes())
    (tmp_path / "frame001.pgm").write_bytes(b"truncated junk")

    from fastmatch_tpu.cli import main

    with pytest.raises(IOError, match="frame001"):
        main(["--set", "sift.capacity=256", "reconstruct", str(tmp_path)])
