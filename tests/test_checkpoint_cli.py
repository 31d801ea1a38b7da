"""Checkpoint/resume (T23) and CLI (T22) tests, incl. the fault-injection
resume-equivalence model (SURVEY.md §6.3: checkpoint-restart)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.checkpoint import restore_map, save_map
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import Reconstruction, reconstruct
from synth import SyntheticScene
from test_pipeline import synthetic_features


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        ba=BAConfig(interval=4, max_iters=8),
        map=MapConfig(max_frames=16, max_points=2048, max_obs=16384),
    )


class TestCheckpoint:
    def test_roundtrip(self, rng, cfg, tmp_path):
        scene = SyntheticScene(rng, n_points=200, n_frames=6)
        feats = synthetic_features(rng, scene)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, cfg)
        save_map(rec, str(tmp_path / "ckpt"))
        rec2 = Reconstruction(cfg=cfg, camera=cam)
        restore_map(rec2, str(tmp_path / "ckpt"))
        np.testing.assert_array_equal(rec2.R, rec.R)
        np.testing.assert_array_equal(rec2.points, rec.points)
        assert rec2.n_obs == rec.n_obs and rec2.n_points == rec.n_points

    def test_config_hash_mismatch(self, rng, cfg, tmp_path):
        scene = SyntheticScene(rng, n_points=150, n_frames=6)
        feats = synthetic_features(rng, scene)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, cfg)
        save_map(rec, str(tmp_path / "ckpt2"))
        other = PipelineConfig(
            ba=BAConfig(interval=3),
            map=MapConfig(max_frames=16, max_points=2048, max_obs=16384),
        )
        rec2 = Reconstruction(cfg=other, camera=cam)
        with pytest.raises(ValueError, match="config hash"):
            restore_map(rec2, str(tmp_path / "ckpt2"))

    def test_resume_equivalence_after_kill(self, rng, cfg, tmp_path):
        """Fault-injection model: process dies mid-sequence; a resumed run
        continues BA from the snapshot and still refines (costs decrease)."""
        scene = SyntheticScene(rng, n_points=200, n_frames=8)
        feats = synthetic_features(rng, scene, noise_px=0.4)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, cfg)  # the "pre-crash" full map
        save_map(rec, str(tmp_path / "ckpt3"))
        # "Crash": new process state, restore, run BA again.
        rec2 = Reconstruction(cfg=cfg, camera=cam)
        restore_map(rec2, str(tmp_path / "ckpt3"))
        c0, c1 = rec2.run_ba()
        assert c1 <= c0 * 1.001


class TestCLI:
    def run_cli(self, *args):
        return subprocess.run(
            [sys.executable, "-m", "fastmatch_tpu.cli", *args],
            capture_output=True, text=True, timeout=300,
            env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "src"},
        )

    def test_info(self):
        r = self.run_cli("info")
        assert r.returncode == 0, r.stderr
        assert "devices" in r.stdout

    def test_match_files(self, rng, tmp_path):
        from synth import corresponding_descriptors

        a, b, _ = corresponding_descriptors(rng, 200, noise=0.05, n_distract=56)
        np.save(tmp_path / "a.npy", a)
        np.save(tmp_path / "b.npy", b)
        out = tmp_path / "m.npy"
        r = self.run_cli(
            "match", str(tmp_path / "a.npy"), str(tmp_path / "b.npy"),
            "--out", str(out),
        )
        assert r.returncode == 0, r.stderr
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["n_matches"] > 100
        m = np.load(out)
        assert m.shape[1] == 2

    def test_config_override(self, rng, tmp_path):
        from synth import corresponding_descriptors

        a, b, _ = corresponding_descriptors(rng, 100, noise=0.02)
        np.save(tmp_path / "a.npy", a)
        np.save(tmp_path / "b.npy", b)
        r = self.run_cli(
            "--set", "matching.ratio=0.99", "--set", "matching.cross_check=false",
            "match", str(tmp_path / "a.npy"), str(tmp_path / "b.npy"),
        )
        assert r.returncode == 0, r.stderr


class TestMetricsFlag:
    def test_reconstruct_writes_jsonl(self, rng, tmp_path):
        """--metrics streams per-frame and BA events as JSONL (T24)."""
        import json as _json
        from synth import SyntheticScene
        from test_pipeline import synthetic_features

        scene = SyntheticScene(rng, n_points=150, n_frames=5)
        feats = synthetic_features(rng, scene)
        npz = {"n_frames": 5, "image_size": np.array([640, 480])}
        for i, (xy, d, m) in enumerate(feats):
            npz[f"xy_{i}"] = xy
            npz[f"desc_{i}"] = d
            npz[f"mask_{i}"] = m
        inp = tmp_path / "f.npz"
        np.savez(inp, **npz)
        from fastmatch_tpu.cli import main

        mpath = tmp_path / "metrics.jsonl"
        main(["--set", "ba.interval=3", "reconstruct", str(inp),
              "--focal", "500.0", "--metrics", str(mpath)])
        events = [_json.loads(l) for l in open(mpath)]
        kinds = {e["event"] for e in events}
        assert "frame" in kinds and "ba" in kinds
        frames = [e for e in events if e["event"] == "frame"]
        assert len(frames) == 3  # frames 2..4
        assert all("n_pnp_inliers" in e for e in frames)


class TestMatchImages:
    def test_match_two_images(self, rng, tmp_path, capsys):
        """`match` on two image files: native decode + SIFT + matcher, with
        matched pixel coordinates exported."""
        import json as _json
        from synth import render_blob_image

        img = render_blob_image(rng, (192, 192), n_blobs=60)
        # second view: small translation (crop-shift)
        img2 = np.roll(img, (4, 7), axis=(0, 1))
        for name, im in (("a.pgm", img), ("b.pgm", img2)):
            with open(tmp_path / name, "wb") as fh:
                fh.write(b"P5\n192 192\n255\n" + (im * 255).astype(np.uint8).tobytes())
        from fastmatch_tpu.cli import main

        out = tmp_path / "m.npz"
        main(["--set", "sift.capacity=256", "match",
              str(tmp_path / "a.pgm"), str(tmp_path / "b.pgm"),
              "--out", str(out)])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_matches"] > 10
        data = np.load(out)
        # matched pixel pairs should differ by roughly the roll shift
        d = data["xy_b"] - data["xy_a"]
        med = np.median(d, axis=0)
        assert np.allclose(med, [7, 4], atol=1.5), med
