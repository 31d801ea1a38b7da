"""CLI `slam` subcommand: features .npz -> corrected trajectory with loop
closures, TUM-format trajectory export round-tripped through the dataset
loader, and ATE against the circle ground truth."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from test_slam import CircleScene, features_of
from fastmatch_tpu.datasets import load_tum_trajectory
from fastmatch_tpu.utils.evaluation import ate_rmse


@pytest.mark.slow
def test_cli_slam_npz(tmp_path, capsys, rng):
    scene = CircleScene(rng, n_points=300, n_frames=26)
    feats = features_of(rng, scene)
    npz = {"n_frames": 26, "image_size": np.array([640, 480])}
    for i, (xy, d, m) in enumerate(feats):
        npz[f"xy_{i}"] = xy
        npz[f"desc_{i}"] = d
        npz[f"mask_{i}"] = m
    inp = tmp_path / "feats.npz"
    np.savez(inp, **npz)

    from fastmatch_tpu.cli import main

    traj = tmp_path / "traj.txt"
    out = tmp_path / "map.npz"
    mpath = tmp_path / "metrics.jsonl"
    main([
        "--set", "ba.interval=5", "--set", "ba.max_iters=8",
        "--set", "ba.pcg_iters=30",
        "--set", "map.max_frames=32", "--set", "map.max_points=4096",
        "--set", "map.max_obs=32768",
        "slam", str(inp), "--focal", str(scene.K[0, 0]),
        "--window", "6", "--loop-gap", "10", "--loop-min-votes", "20",
        "--out", str(out), "--trajectory", str(traj),
        "--metrics", str(mpath),
    ])
    events = [json.loads(l) for l in open(mpath)]
    kinds = {e["event"] for e in events}
    assert "track" in kinds and "loop_closure" in kinds
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_frames"] == 26
    assert rep["loop_closures"] >= 1

    ts, centers, quats = load_tum_trajectory(str(traj))
    assert centers.shape == (26, 3)
    assert np.allclose(np.linalg.norm(quats, axis=1), 1.0, atol=1e-4)
    gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
    ate = float(ate_rmse(jnp.asarray(centers), jnp.asarray(gt)))
    assert ate < 0.3, ate
    # npz map output matches the TUM export
    data = np.load(out)
    np.testing.assert_allclose(data["centers"], centers, atol=1e-4)
