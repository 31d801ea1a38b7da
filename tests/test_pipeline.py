"""Integration tier (SURVEY.md §5.2): config-3 milestone — synthetic
sequence through detect->match->pose->BA with ATE asserted."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.features.sift import SIFTConfig
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.reconstruct import reconstruct
from fastmatch_tpu.utils.evaluation import ate_rmse
from synth import SyntheticScene, random_descriptors


def synthetic_features(rng, scene, noise_px=0.3, cap=512, shuffle=False):
    """Fabricated per-frame features: each landmark gets a stable random
    descriptor (plus per-observation noise), keypoints at its projection.

    shuffle=True permutes keypoint order independently per frame so that
    cross-frame index alignment cannot mask match-index plumbing bugs
    (ADVICE r3: the aligned default hid a build_view_graph bug)."""
    n_pts = scene.points.shape[0]
    base_desc = random_descriptors(rng, n_pts)
    feats = []
    for f in range(scene.R.shape[0]):
        vis = np.where(scene.visible[f])[0]
        if shuffle:
            vis = rng.permutation(vis)
        xy = scene.pixels[f, vis] + noise_px * rng.standard_normal((len(vis), 2))
        desc = base_desc[vis] + 0.05 * rng.standard_normal((len(vis), 128)).astype(
            np.float32
        )
        desc = np.abs(desc)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        n = len(vis)
        xy_p = np.zeros((cap, 2), np.float32)
        d_p = np.zeros((cap, 128), np.float32)
        m_p = np.zeros(cap, bool)
        xy_p[:n] = xy
        d_p[:n] = desc
        m_p[:n] = True
        feats.append((xy_p, d_p, m_p))
    return feats


@pytest.fixture(scope="module")
def small_cfg():
    return PipelineConfig(
        ba=BAConfig(interval=4, max_iters=10, pcg_iters=30),
        map=MapConfig(max_frames=16, max_points=2048, max_obs=16384),
    )


class TestReconstruct:
    def test_sequence_ate(self, rng, small_cfg):
        scene = SyntheticScene(rng, n_points=300, n_frames=10)
        feats = synthetic_features(rng, scene, noise_px=0.3)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, small_cfg)
        assert rec.n_frames == 10
        assert rec.pose_mask[:10].all()
        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt[:10])))
        # Normalized units: scene diameter ~8; ATE after sim3 alignment.
        assert ate < 0.05, f"ATE {ate:.4f}"

    def test_points_near_ground_truth(self, rng, small_cfg):
        scene = SyntheticScene(rng, n_points=300, n_frames=8)
        feats = synthetic_features(rng, scene, noise_px=0.2)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, small_cfg)
        from fastmatch_tpu.utils.evaluation import align_umeyama

        est = rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)[:8]
        s, R, t = align_umeyama(jnp.asarray(est), jnp.asarray(gt))
        pts = rec.points[rec.pt_mask]
        aligned = float(s) * pts @ np.asarray(R).T + np.asarray(t)
        # Each reconstructed landmark should be near SOME ground-truth point.
        d = np.linalg.norm(aligned[:, None, :] - scene.points[None], axis=-1).min(1)
        assert np.median(d) < 0.05, f"median landmark error {np.median(d):.3f}"

    def test_ba_reduces_cost(self, rng, small_cfg):
        scene = SyntheticScene(rng, n_points=250, n_frames=8)
        feats = synthetic_features(rng, scene, noise_px=0.5)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, small_cfg)
        c0, c1 = rec.run_ba()
        assert c1 <= c0

    def test_stats_recorded(self, rng, small_cfg):
        scene = SyntheticScene(rng, n_points=200, n_frames=6)
        feats = synthetic_features(rng, scene)
        rec = reconstruct(feats, Pinhole.from_K(scene.K), small_cfg)
        assert len(rec.frame_stats) == 6
        assert rec.frame_stats[2]["n_pnp_inliers"] > 10


@pytest.mark.slow
class TestConfig3Scale:
    def test_fifty_frame_sequence(self, rng):
        """BASELINE.json config 3: a 50-frame sequence through detect-style
        features -> match -> RANSAC pose -> incremental BA, ATE-gated."""
        scene = SyntheticScene(rng, n_points=400, n_frames=50, span=2.0)
        feats = synthetic_features(rng, scene, noise_px=0.3)
        cfg = PipelineConfig(
            ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
            # The testkit's 0.05 descriptor noise puts same-landmark pairs
            # at d2 ~ 0.34 (real SIFT re-observations sit much closer), so
            # the dedup gate needs to be wider than the product default.
            map=MapConfig(max_frames=64, max_points=16384, max_obs=131072,
                          dedup_desc_d2=0.5),
        )
        rec = reconstruct(feats, Pinhole.from_K(scene.K), cfg)
        assert rec.n_frames == 50
        # landmark dedup: the map should be close to the 400 true points,
        # not thousands of duplicates
        assert int(rec.pt_mask.sum()) < 600
        gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
        ate = float(ate_rmse(jnp.asarray(rec.camera_centers()), jnp.asarray(gt)))
        # GT span is ~7 world units; reconstruction aligns to ~1% of it.
        assert ate < 0.1, ate


class TestPlanarBootstrap:
    """A fully planar scene through the full reconstruct() pipeline: the
    two-view bootstrap must take the homography branch (essential is
    degenerate on a plane), resolve the two-fold ambiguity with the third
    view when flagged, and still deliver a low-ATE reconstruction."""

    def test_planar_scene_reconstructs(self, rng):
        from fastmatch_tpu.utils.evaluation import ate_rmse

        scene = SyntheticScene(rng, n_points=300, n_frames=10)
        # Flatten the landmarks onto a plane (n . X = d) and recompute
        # projections/visibility for the same trajectory.
        n = np.array([0.1, -0.15, 1.0])
        n /= np.linalg.norm(n)
        d = 0.8
        X = scene.points
        X = X - np.outer(X @ n - d, n)  # project points onto the plane
        scene.points = X
        for f in range(scene.R.shape[0]):
            Xc = X @ scene.R[f].T + scene.t[f]
            uv = (Xc[:, :2] / np.maximum(Xc[:, 2:3], 1e-9))
            pix = uv * 500.0 + scene.K[:2, 2]
            scene.pixels[f] = pix
            scene.visible[f] = (
                (Xc[:, 2] > 0.2)
                & (pix[:, 0] >= 0) & (pix[:, 0] < 640)
                & (pix[:, 1] >= 0) & (pix[:, 1] < 480)
            )
        feats = synthetic_features(rng, scene, noise_px=0.3)
        cam = Pinhole.from_K(scene.K)
        rec = reconstruct(feats, cam, PipelineConfig())
        assert rec.frame_stats[1].get("bootstrap_homography") is True
        est = np.stack([-rec.R[f].T @ rec.t[f] for f in range(10)])
        gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        assert ate < 0.1, ate
