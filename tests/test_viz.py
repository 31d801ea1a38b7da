"""Visualization smoke tests (utils/viz.py — the reference's evaluation
harness plots its results; ours renders match figures, trajectory plots,
and precision/recall summaries, host-side matplotlib only)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.utils.viz import (
    draw_matches, plot_match_stats, plot_trajectory)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_draw_matches_with_gt_coloring(rng, tmp_path):
    h, w, n = 120, 160, 40
    img_a = rng.random((h, w)).astype(np.float32)
    img_b = rng.random((h, w)).astype(np.float32)
    xy_a = rng.uniform([0, 0], [w - 1, h - 1], (n, 2)).astype(np.float32)
    H = np.array([[1.0, 0, 5.0], [0, 1.0, -3.0], [0, 0, 1.0]])
    xy_b = xy_a + [5.0, -3.0]
    idx = np.arange(n)
    valid = np.ones(n, bool)
    valid[::5] = False
    # Corrupt some matches: they must color incorrect.
    idx[1] = 2
    idx[2] = 1
    path = str(tmp_path / "m.png")
    n_drawn, n_correct = draw_matches(img_a, xy_a, img_b, xy_b, idx, valid,
                                      path, H_ab=H, tol=2.0)
    assert os.path.getsize(path) > 2000
    assert n_drawn == int(valid.sum())
    assert 0 < n_correct < n_drawn  # the two swapped matches are wrong

    # Without GT: still renders.
    path2 = str(tmp_path / "m2.png")
    n2, nc2 = draw_matches(img_a, xy_a, img_b, xy_b, idx, valid, path2)
    assert os.path.getsize(path2) > 2000 and nc2 is None


def test_plot_trajectory_reports_ate(rng, tmp_path):
    t = np.linspace(0, 2 * np.pi, 30)
    gt = np.stack([np.cos(t), 0.1 * t, np.sin(t)], 1)
    # A rotated/scaled/noisy copy: alignment must mostly remove the error.
    ang = 0.7
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    est = 2.0 * gt @ R.T + [1.0, -2.0, 3.0] + 0.01 * rng.standard_normal(
        gt.shape)
    path = str(tmp_path / "traj.png")
    ate = plot_trajectory(est, path, gt_centers=gt)
    assert os.path.getsize(path) > 2000
    assert ate < 0.05, f"aligned ATE {ate}"
    # Estimate-only plot.
    assert plot_trajectory(est, str(tmp_path / "t2.png")) is None


def test_evaluate_pairs_plot_dir(tmp_path):
    from fastmatch_tpu.datasets import evaluate_pairs, synthesize_warped_pair
    from fastmatch_tpu.features.sift import SIFTConfig

    pairs = [synthesize_warped_pair(0, h=160, w=160)]
    results, agg = evaluate_pairs(
        pairs, sift_cfg=SIFTConfig(capacity=256), plot_dir=str(tmp_path))
    files = sorted(os.listdir(tmp_path))
    assert "summary.png" in files
    assert any(f.endswith(".png") and f != "summary.png" for f in files)
    plot_match_stats(results, str(tmp_path / "again.png"))
    assert os.path.getsize(tmp_path / "again.png") > 2000
