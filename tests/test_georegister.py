"""Georegistration (pipeline/georegister.py): sim(3) + GPS-anchored PGO +
anchored BA pin a monocular-gauge map to absolute coordinates."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from synth import SyntheticScene
from fastmatch_tpu.core.camera import Pinhole, normalize_pixels
from fastmatch_tpu.pipeline.config import MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.georegister import apply_sim3, georegister
from fastmatch_tpu.pipeline.reconstruct import Reconstruction


def _consistent_rec(rng, n_frames=12):
    scene = SyntheticScene(rng, n_points=150, n_frames=n_frames, span=1.0)
    cam = Pinhole.from_K(scene.K)
    cfg = PipelineConfig(map=MapConfig(max_frames=16, max_points=256,
                                       max_obs=4096))
    rec = Reconstruction(cfg=cfg, camera=cam)
    F = scene.R.shape[0]
    rec.R[:F] = scene.R
    rec.t[:F] = scene.t
    rec.pose_mask[:F] = True
    rec.n_frames = F
    vis = scene.visible.any(axis=0)
    ids = rec.add_points(scene.points[vis].astype(np.float32),
                         np.zeros((int(vis.sum()), 128), np.float32))
    remap = -np.ones(scene.points.shape[0], np.int64)
    remap[np.nonzero(vis)[0]] = ids
    vec = jnp.asarray(cam.intrinsics_vector())
    for f in range(F):
        p = np.nonzero(scene.visible[f])[0]
        uv_n = normalize_pixels(
            jnp.asarray(scene.pixels[f, p], jnp.float32), vec, "pinhole")
        rec.add_observations(f, remap[p].astype(np.int32), np.asarray(uv_n))
    return rec, cam, scene, cfg


def _centers(rec):
    live = rec.pose_mask
    return -np.einsum("fji,fj->fi", rec.R[live], rec.t[live])


def _rand_rot(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_apply_sim3_consistency():
    """Transforming the map leaves reprojections rescaled-consistent:
    x_cam' = s x_cam, so normalized image coords are unchanged."""
    rng = np.random.default_rng(0)
    rec, cam, scene, cfg = _consistent_rec(rng)
    f, p = int(rec.obs_cam[10]), int(rec.obs_pt[10])
    before = rec.R[f] @ rec.points[p] + rec.t[f]
    s, R, t = 2.3, _rand_rot(rng), np.array([4.0, -1.0, 7.0])
    apply_sim3(rec, s, R, t)
    after = rec.R[f] @ rec.points[p] + rec.t[f]
    np.testing.assert_allclose(after, s * before, rtol=1e-4, atol=1e-5)


def test_georegister_recovers_absolute_frame():
    rng = np.random.default_rng(1)
    rec, cam, scene, cfg = _consistent_rec(rng)
    gt = _centers(rec).copy()
    # Knock the map into an arbitrary monocular gauge.
    apply_sim3(rec, 0.37, _rand_rot(rng), np.array([5.0, 2.0, -3.0]))
    assert np.sqrt(np.mean(np.sum((_centers(rec) - gt) ** 2, -1))) > 1.0
    idx = np.arange(0, rec.n_frames, 3)
    gps = gt[idx] + 0.002 * rng.standard_normal((len(idx), 3))
    summary = georegister(rec, idx, gps, cfg)
    err = np.sqrt(np.mean(np.sum((_centers(rec) - gt) ** 2, -1)))
    assert err < 0.02, (err, summary)
    assert summary["rmse_final"] < 0.02
    assert abs(summary["scale"] - 1 / 0.37) < 0.05


def test_georegister_robust_to_outlier_fix():
    rng = np.random.default_rng(2)
    rec, cam, scene, cfg = _consistent_rec(rng)
    gt = _centers(rec).copy()
    apply_sim3(rec, 0.8, _rand_rot(rng), np.array([1.0, 0.0, 2.0]))
    idx = np.arange(0, rec.n_frames, 2)
    gps = gt[idx].astype(np.float64)
    gps[2] += [4.0, -4.0, 3.0]  # gross outlier
    # Outlier-robust run: alignment uses all fixes (Umeyama is L2), but
    # the PGO's redescending prior kernel must keep the outlier from
    # bending the trajectory.
    summary = georegister(rec, idx, gps, cfg, prior_delta=0.25)
    mask = np.ones(rec.n_frames, bool)
    mask[idx[2]] = False  # judge everywhere except the lied-about frame
    err = np.sqrt(np.mean(np.sum(
        (_centers(rec)[mask] - gt[mask]) ** 2, -1)))
    assert err < 0.25, (err, summary)


def test_georegister_needs_three_fixes():
    rng = np.random.default_rng(3)
    rec, cam, scene, cfg = _consistent_rec(rng)
    with pytest.raises(ValueError, match=">= 3 GPS"):
        georegister(rec, [0, 5], _centers(rec)[[0, 5]], cfg)


@pytest.mark.slow
def test_cli_slam_gps(tmp_path, capsys):
    from test_slam import CircleScene, features_of
    from fastmatch_tpu.cli import main

    rng = np.random.default_rng(4)
    scene = CircleScene(rng, n_points=300, n_frames=26)
    feats = features_of(rng, scene)
    npz = {"n_frames": 26, "image_size": np.array([640, 480])}
    for i, (xy, d, m) in enumerate(feats):
        npz[f"xy_{i}"], npz[f"desc_{i}"], npz[f"mask_{i}"] = xy, d, m
    inp = tmp_path / "feats.npz"
    np.savez(inp, **npz)
    gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
    idx = np.arange(0, 26, 4)
    gpsf = tmp_path / "gps.npz"
    np.savez(gpsf, frames=idx, xyz=gt[idx])
    out = tmp_path / "map.npz"
    main([
        "--set", "ba.interval=5", "--set", "ba.max_iters=8",
        "--set", "ba.pcg_iters=30",
        "--set", "map.max_frames=32", "--set", "map.max_points=4096",
        "--set", "map.max_obs=32768",
        "slam", str(inp), "--focal", str(scene.K[0, 0]),
        "--window", "6", "--loop-gap", "10", "--loop-min-votes", "20",
        "--gps", str(gpsf), "--out", str(out),
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["gps"]["n_gps"] == len(idx)
    assert rep["gps"]["rmse_final"] < 0.15, rep["gps"]
    # The exported map is now in ABSOLUTE coordinates (no alignment).
    data = np.load(out)
    centers = data["centers"]
    fs = np.array([fi for fi in ([0, 1] + list(range(2, 26)))
                   if fi < 26])[: centers.shape[0]]
    err = np.sqrt(np.mean(np.sum((centers - gt[: centers.shape[0]]) ** 2,
                                 -1)))
    assert err < 0.3, err
