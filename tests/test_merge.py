"""Multi-session map merging (pipeline/merge.py): cross-localization via
the retrieval stack, trimmed-Umeyama Sim(3) gauge alignment, landmark
dedup, joint BA.

Maps are constructed directly from a synthetic scene (no SLAM run):
map A covers the first part of the trajectory, map B the last, with an
overlap window; B is then pushed into a DIFFERENT Sim(3) gauge (rotated,
translated, scaled) that merge_maps must recover."""

import dataclasses

import numpy as np
import pytest

from synth import SyntheticScene, random_descriptors
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.georegister import apply_sim3
from fastmatch_tpu.pipeline.merge import merge_maps
from fastmatch_tpu.pipeline.reconstruct import Reconstruction


def _rec_from_scene(scene, frames, base_desc, camera, rng,
                    desc_noise=0.03, px_noise=0.3):
    """Reconstruction holding GT poses/points for ``frames`` and the
    landmarks visible in >= 2 of them, with noisy per-map descriptors."""
    vis = scene.visible[frames]
    keep = np.flatnonzero(vis.sum(0) >= 2)
    cfg = PipelineConfig(
        ba=BAConfig(max_iters=8, pcg_iters=30),
        map=MapConfig(max_frames=len(frames) + 64,
                      max_points=keep.size + 4096,
                      max_obs=int(vis[:, keep].sum()) + 8192))
    rec = Reconstruction(cfg=cfg, camera=camera)
    rec.R[: len(frames)] = scene.R[frames].astype(np.float32)
    rec.t[: len(frames)] = scene.t[frames].astype(np.float32)
    rec.pose_mask[: len(frames)] = True
    rec.n_frames = len(frames)
    desc = base_desc[keep] + desc_noise * rng.standard_normal(
        (keep.size, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    rec.add_points(scene.points[keep].astype(np.float32), desc)
    f_px = float(camera.fx)
    cx, cy = float(camera.cx), float(camera.cy)
    for k, f in enumerate(frames):
        pv = np.flatnonzero(scene.visible[f][keep])
        uv_px = scene.pixels[f][keep[pv]].astype(np.float32)
        uv_px = uv_px + px_noise * rng.standard_normal(uv_px.shape).astype(
            np.float32)
        xn = (uv_px - np.array([cx, cy], np.float32)) / f_px
        rec.add_observations(k, pv.astype(np.int32), xn)
    return rec


@pytest.fixture(scope="module")
def two_maps():
    rng = np.random.default_rng(0)
    scene = SyntheticScene(rng, n_points=400, n_frames=24, span=1.2)
    base_desc = random_descriptors(rng, 400)
    cam = Pinhole.from_K(scene.K.astype(np.float32))
    rec_a = _rec_from_scene(scene, np.arange(0, 14), base_desc, cam,
                            np.random.default_rng(1))
    rec_b = _rec_from_scene(scene, np.arange(9, 24), base_desc, cam,
                            np.random.default_rng(2))
    # Push B into its own gauge: rotate 30 deg about y, shift, scale 1.7.
    th = np.radians(30.0)
    R0 = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    t0 = np.array([0.5, -0.2, 0.8], np.float32)
    s0 = 1.7
    apply_sim3(rec_b, s0, R0, t0)
    return scene, cam, rec_a, rec_b, (s0, R0, t0)


class TestMerge:
    def test_merge_recovers_gauge_and_dedups(self, two_maps):
        scene, cam, rec_a, rec_b, (s0, R0, t0) = two_maps
        merged, info = merge_maps(rec_a, rec_b, seed=0)
        # Most of B's frames see enough of A's landmarks to localize.
        assert info["n_localized"] >= 5, info
        # The recovered B->A scale inverts the applied gauge scale.
        assert abs(info["scale"] - 1.0 / s0) < 0.02 * (1.0 / s0), info
        assert info["align_rmse"] < 0.05, info
        # Overlap landmarks merged rather than duplicated.
        assert info["n_dedup"] > 50, info
        assert merged.n_points < rec_a.n_points + rec_b.n_points - 50
        # Merged map lives in A's gauge == the scene's GT gauge: B's
        # frames (appended after A's) must land on their GT poses.
        nB = rec_b.n_frames
        Rm = merged.R[rec_a.n_frames : rec_a.n_frames + nB]
        tm = merged.t[rec_a.n_frames : rec_a.n_frames + nB]
        C_est = -np.einsum("fji,fj->fi", Rm, tm)
        C_gt = -np.einsum("fji,fj->fi", scene.R[9:24],
                          scene.t[9:24]).astype(np.float32)
        err = np.linalg.norm(C_est - C_gt, axis=-1)
        assert float(err.max()) < 0.1, err
        # Joint BA ran and did not blow up the map.
        c0, c1 = info["ba_cost"]
        assert c1 <= c0

    def test_seam_observations_consistent(self, two_maps):
        """Reprojection residuals of B's re-pointed observations against
        A's landmarks stay at noise level — the dedup remap is correct,
        not just counted."""
        scene, cam, rec_a, rec_b, _ = two_maps
        merged, info = merge_maps(rec_a, rec_b, refine=False, seed=0)
        sel = (np.asarray(merged.obs_mask)
               & (merged.obs_cam >= rec_a.n_frames)
               & (merged.obs_pt < rec_a.n_points))  # B obs -> A landmarks
        assert sel.sum() > 100
        f = merged.obs_cam[sel]
        X = merged.points[merged.obs_pt[sel]]
        xc = np.einsum("oij,oj->oi", merged.R[f], X) + merged.t[f]
        pred = xc[:, :2] / xc[:, 2:3]
        res_px = float(cam.fx) * np.linalg.norm(
            pred - merged.obs_uv[sel], axis=-1)
        assert float(np.median(res_px)) < 2.0, np.median(res_px)

    def test_cli_merge(self, two_maps, tmp_path, capsys):
        """`merge A B --out M --export-ply` end-to-end from checkpoints."""
        import json

        from fastmatch_tpu.cli import main
        from fastmatch_tpu.pipeline.checkpoint import save_map

        scene, cam, rec_a, rec_b, (s0, _, _) = two_maps
        save_map(rec_a, str(tmp_path / "a"))
        save_map(rec_b, str(tmp_path / "b"))
        rc = main(["merge", str(tmp_path / "a"), str(tmp_path / "b"),
                   "--out", str(tmp_path / "m"), "--no-refine",
                   "--export-ply", str(tmp_path / "m.ply")])
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["n_localized"] >= 5
        assert abs(info["scale"] - 1.0 / s0) < 0.05
        assert (tmp_path / "m.ply").exists()
        # The merged checkpoint reloads.
        from fastmatch_tpu.pipeline.merge import rec_from_checkpoint

        m = rec_from_checkpoint(str(tmp_path / "m"), cam)
        assert m.n_frames == rec_a.n_frames + rec_b.n_frames
        assert int(m.obs_mask.sum()) > 100

    def test_disjoint_maps_raise(self, two_maps):
        scene, cam, rec_a, _, _ = two_maps
        rng = np.random.default_rng(7)
        other = SyntheticScene(rng, n_points=300, n_frames=10)
        rec_c = _rec_from_scene(other, np.arange(10),
                                random_descriptors(rng, 300), cam,
                                np.random.default_rng(8))
        with pytest.raises(ValueError, match="overlap"):
            merge_maps(rec_a, rec_c, seed=0)
