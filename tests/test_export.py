"""Map export (utils/export.py): PLY round-trip and COLMAP text model
consistency checks over an exactly-consistent synthetic map."""

import os

import numpy as np
import jax.numpy as jnp

from synth import SyntheticScene
from fastmatch_tpu.core.camera import Pinhole, normalize_pixels
from fastmatch_tpu.pipeline.config import MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import Reconstruction
from fastmatch_tpu.utils.export import (
    _rot_to_qvec,
    load_ply,
    save_colmap_text,
    save_ply,
)


def _qvec_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _consistent_rec(rng, dist=()):
    scene = SyntheticScene(rng, n_points=60, n_frames=5, span=0.8)
    cam = Pinhole.from_K(scene.K, dist)
    cfg = PipelineConfig(map=MapConfig(max_frames=8, max_points=128,
                                       max_obs=1024))
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
    pixels = {}
    for f in range(F):
        p = np.nonzero(scene.visible[f])[0]
        uv_n = normalize_pixels(
            jnp.asarray(scene.pixels[f, p], jnp.float32), vec, "pinhole")
        rec.add_observations(f, remap[p].astype(np.int32), np.asarray(uv_n))
        pixels[f] = (remap[p], scene.pixels[f, p])
    return rec, cam, scene, pixels


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((37, 3))
    cols = rng.integers(0, 256, (37, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    save_ply(path, pts, colors=cols)
    back, cback = load_ply(path)
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(cback, cols)


def test_qvec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        A = rng.standard_normal((3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = _rot_to_qvec(Q)
        np.testing.assert_allclose(_qvec_to_rot(q), Q, atol=1e-9)


def test_colmap_model(tmp_path):
    rng = np.random.default_rng(2)
    rec, cam, scene, pixels = _consistent_rec(rng)
    out = str(tmp_path / "colmap")
    save_colmap_text(out, rec, cam, image_size=(640, 480))

    cams = [l for l in open(os.path.join(out, "cameras.txt"))
            if not l.startswith("#")]
    assert len(cams) == 1
    tok = cams[0].split()
    assert tok[1] == "OPENCV" and tok[2] == "640" and tok[3] == "480"
    assert float(tok[4]) == float(cam.fx)

    lines = [l.rstrip("\n") for l in open(os.path.join(out, "images.txt"))
             if not l.startswith("#")]
    assert len(lines) == 2 * rec.n_frames  # header line + points2D line
    obs_of_img = {}
    for i in range(rec.n_frames):
        head = lines[2 * i].split()
        img_id = int(head[0])
        q = np.array([float(v) for v in head[1:5]])
        t = np.array([float(v) for v in head[5:8]])
        R = _qvec_to_rot(q)
        np.testing.assert_allclose(R, rec.R[img_id - 1], atol=1e-5)
        np.testing.assert_allclose(t, rec.t[img_id - 1], atol=1e-5)
        row = lines[2 * i + 1].split()
        assert len(row) % 3 == 0
        pts2d = np.array(row, np.float64).reshape(-1, 3)
        obs_of_img[img_id] = pts2d
        # Denormalized 2D coords match the original pixels (same order as
        # add_observations appended them).
        gt_ids, gt_px = pixels[img_id - 1]
        np.testing.assert_array_equal(pts2d[:, 2].astype(int) - 1, gt_ids)
        np.testing.assert_allclose(pts2d[:, :2], gt_px, atol=1e-2)

    pt_lines = [l for l in open(os.path.join(out, "points3D.txt"))
                if not l.startswith("#")]
    assert len(pt_lines) == int(rec.pt_mask.sum())
    for l in pt_lines[:20]:
        tok = l.split()
        pid = int(tok[0])
        xyz = np.array(tok[1:4], np.float64)
        np.testing.assert_allclose(xyz, rec.points[pid - 1], atol=1e-5)
        err = float(tok[7])
        assert err < 0.05  # exactly-consistent map reprojects cleanly
        track = np.array(tok[8:], np.int64).reshape(-1, 2)
        # Every track entry points back at this point in images.txt.
        for img_id, slot in track:
            assert int(obs_of_img[img_id][slot, 2]) == pid


def test_kitti_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    rec, cam, scene, _ = _consistent_rec(rng)
    path = str(tmp_path / "traj.kitti")
    from fastmatch_tpu.utils.export import (load_kitti_trajectory,
                                            save_kitti_trajectory)

    save_kitti_trajectory(path, rec)
    Rwc, C = load_kitti_trajectory(path)
    assert Rwc.shape[0] == rec.n_frames
    for i, fi in enumerate(np.nonzero(rec.pose_mask)[0]):
        np.testing.assert_allclose(Rwc[i], rec.R[fi].T, atol=1e-7)
        np.testing.assert_allclose(C[i], -rec.R[fi].T @ rec.t[fi],
                                   atol=1e-6)


def test_cli_export(tmp_path, capsys):
    """CLI wiring: reconstruct --export-ply/--export-colmap write files."""
    import json
    from test_pipeline import synthetic_features
    from fastmatch_tpu.cli import main

    rng = np.random.default_rng(3)
    scene = SyntheticScene(rng, n_points=200, n_frames=8, span=0.8)
    feats = synthetic_features(rng, scene)
    npz = {"n_frames": len(feats), "image_size": np.array([640, 480])}
    for i, (xy, d, m) in enumerate(feats):
        npz[f"xy_{i}"], npz[f"desc_{i}"], npz[f"mask_{i}"] = xy, d, m
    inp = tmp_path / "feats.npz"
    np.savez(inp, **npz)
    ply = tmp_path / "map.ply"
    cdir = tmp_path / "colmap"
    main([
        "--set", "ba.interval=4", "--set", "ba.max_iters=6",
        "--set", "ba.pcg_iters=20",
        "--set", "map.max_frames=16", "--set", "map.max_points=4096",
        "--set", "map.max_obs=32768",
        "reconstruct", str(inp), "--focal", str(scene.K[0, 0]),
        "--export-ply", str(ply), "--export-colmap", str(cdir),
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    pts, _ = load_ply(str(ply))
    assert pts.shape[0] == rep["n_points"] > 50
    for name in ("cameras.txt", "images.txt", "points3D.txt"):
        assert os.path.exists(os.path.join(str(cdir), name))
