"""Localization against a prebuilt map (pipeline/localize.py): the
big-bank ANN machinery's product call site (index once, query many), with
the exact matcher below the crossover. Builds a map with the device
tracker, then localizes held-out noisy re-detections of map frames."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.core.lie import SO3
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.localize import build_map_index, localize
from fastmatch_tpu.pipeline.slam import SlamConfig
from fastmatch_tpu.pipeline.slam_device import slam_device
from test_slam import CircleScene, features_of


@pytest.fixture(scope="module")
def built_map():
    from synth import random_descriptors

    rng = np.random.default_rng(0)
    scene = CircleScene(rng, n_points=300, n_frames=26)
    # Per-3D-point descriptor identities, shared between the mapping pass
    # and the query re-detections (same landmarks, fresh observation noise).
    base_desc = random_descriptors(rng, 300)
    feats = features_of(rng, scene, base_desc=base_desc)
    cfg = PipelineConfig(
        ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
    )
    scfg = SlamConfig(window=6, loop_gap=10, loop_min_votes=20)
    out = slam_device(feats, Pinhole.from_K(scene.K), cfg, scfg)
    qfeats = features_of(np.random.default_rng(99), scene,
                         base_desc=base_desc)
    return scene, out.rec, qfeats


def _pose_err(rec, f, R, t):
    """Error vs the MAP's own pose for frame f — the map lives in the
    bootstrap's sim(3) gauge (unit-norm baseline), so scene-GT poses are
    not directly comparable; localization consistency is."""
    cw_est = -np.asarray(R).T @ np.asarray(t)
    cw_map = -rec.R[f].T @ rec.t[f]
    dR = np.asarray(R) @ rec.R[f].T
    ang = np.degrees(np.abs(np.asarray(SO3.log(jnp.asarray(
        dR.astype(np.float32))))).max())
    return float(np.linalg.norm(cw_est - cw_map)), float(ang)


class TestLocalize:
    def test_exact_path(self, built_map):
        scene, rec, qfeats = built_map
        index = build_map_index(rec.points, rec.pt_desc, rec.pt_mask)
        assert index.ivf is None  # 4096 rows < crossover -> exact matcher
        cam = Pinhole.from_K(scene.K)
        xy, d, m = qfeats[13]
        r = localize(index, xy, d, m, cam)
        assert bool(r.ok), f"{int(r.n_matches)} matches"
        dc, ang = _pose_err(rec, 13, r.R, r.t)
        assert dc < 0.1 and ang < 1.5, (dc, ang)

    def test_ann_path(self, built_map):
        """ann_threshold=0 forces the IVF cluster-sorted index + the
        match_pair_ann_big shortlist search — the product ANN path."""
        scene, rec, qfeats = built_map
        index = build_map_index(rec.points, rec.pt_desc, rec.pt_mask,
                                ann_threshold=0)
        assert index.ivf is not None
        cam = Pinhole.from_K(scene.K)
        ok = 0
        for f in (5, 13, 21):
            xy, d, m = qfeats[f]
            r = localize(index, xy, d, m, cam, budget=2048)
            if bool(r.ok):
                dc, ang = _pose_err(rec, f, r.R, r.t)
                assert dc < 0.15 and ang < 2.0, (f, dc, ang)
                ok += 1
        # IVF probing is approximate; require most queries to localize.
        assert ok >= 2, f"only {ok}/3 queries localized through ANN"

    def test_garbage_query_fails_closed(self, built_map):
        scene, rec, _ = built_map
        index = build_map_index(rec.points, rec.pt_desc, rec.pt_mask)
        cam = Pinhole.from_K(scene.K)
        rng = np.random.default_rng(7)
        xy = rng.uniform(0, 600, (512, 2)).astype(np.float32)
        d = np.abs(rng.standard_normal((512, 128))).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        r = localize(index, xy, d, np.ones(512, bool), cam)
        assert not bool(r.ok)

    def test_checkpoint_roundtrip(self, built_map, tmp_path):
        from fastmatch_tpu.pipeline.checkpoint import save_map
        from fastmatch_tpu.pipeline.localize import map_index_from_checkpoint

        scene, rec, qfeats = built_map
        save_map(rec, str(tmp_path / "map"))
        index = map_index_from_checkpoint(str(tmp_path / "map"))
        cam = Pinhole.from_K(scene.K)
        xy, d, m = qfeats[8]
        r = localize(index, xy, d, m, cam)
        assert bool(r.ok)
