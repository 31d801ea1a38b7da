"""SLAM integration: loop-closure detection + pose-graph correction on a
revisiting trajectory (config-4 machinery end-to-end)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.slam import SlamConfig, slam
from fastmatch_tpu.utils.evaluation import ate_rmse
from synth import random_descriptors


class CircleScene:
    """Cameras on a full circle looking inward — the trajectory revisits its
    start, so late frames overlap early ones (loop-closure bait).

    ``angles``: optional explicit per-frame angle sequence (radians) —
    non-monotone sequences build revisit/oscillation trajectories where
    covisible frames are temporally far apart (covisibility-BA tests)."""

    def __init__(self, rng, n_points=300, n_frames=26, radius=6.0,
                 angles=None):
        w, h = 640, 480
        self.K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1.0]])
        self.points = rng.uniform(-1.5, 1.5, size=(n_points, 3))
        Rs, ts = [], []
        for k in range(n_frames):
            ang = angles[k] if angles is not None else 2 * np.pi * k / n_frames
            c, s = np.cos(ang), np.sin(ang)
            eye = np.array([radius * s, 0.3 * np.sin(2 * ang), -radius * c])
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            R_wc = np.stack([right, down, fwd], axis=1)
            R_cw = R_wc.T
            Rs.append(R_cw)
            ts.append(-R_cw @ eye)
        self.R = np.stack(Rs)
        self.t = np.stack(ts)
        cam = np.einsum("fij,pj->fpi", self.R, self.points) + self.t[:, None, :]
        z = cam[..., 2]
        uv = (cam[..., :2] / np.clip(z[..., None], 1e-9, None)) @ np.diag(
            [500.0, 500.0]
        ) + self.K[:2, 2]
        self.pixels = uv
        self.visible = (
            (z > 0.5) & (uv[..., 0] >= 0) & (uv[..., 0] < w)
            & (uv[..., 1] >= 0) & (uv[..., 1] < h)
        )


def features_of(rng, scene, noise_px=0.3, cap=512, base_desc=None):
    """Per-frame (xy, desc, mask) observations of the scene. ``base_desc``:
    per-3D-point descriptor identities; pass the same array to build
    independent re-detections of the same scene (localization tests)."""
    n_pts = scene.points.shape[0]
    if base_desc is None:
        base_desc = random_descriptors(rng, n_pts)
    feats = []
    for f in range(scene.R.shape[0]):
        vis = np.where(scene.visible[f])[0]
        xy = scene.pixels[f, vis] + noise_px * rng.standard_normal((len(vis), 2))
        desc = np.abs(
            base_desc[vis]
            + 0.05 * rng.standard_normal((len(vis), 128)).astype(np.float32)
        )
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
def setup():
    rng = np.random.default_rng(0)
    scene = CircleScene(rng, n_points=300, n_frames=26)
    feats = features_of(rng, scene)
    cfg = PipelineConfig(
        ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
    )
    scfg = SlamConfig(window=6, loop_gap=10, loop_min_votes=20)
    return scene, feats, cfg, scfg


@pytest.fixture(scope="module")
def result(setup):
    scene, feats, cfg, scfg = setup
    return slam(feats, Pinhole.from_K(scene.K), cfg, scfg), scene


class TestSlam:
    def test_completes_trajectory(self, result):
        out, scene = result
        assert out.rec.n_frames == 26
        assert out.rec.pose_mask[:26].all()

    def test_loop_closures_found(self, result):
        out, _ = result
        assert len(out.loop_edges) >= 1, "no loop closures detected"
        f, c = out.loop_edges[0][0], out.loop_edges[0][1]
        assert f - c >= 10  # respects the gap

    def test_pgo_ran(self, result):
        out, _ = result
        assert out.pgo_runs >= 1

    def test_final_ate(self, result):
        out, scene = result
        est = out.rec.camera_centers()
        gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        # Circle diameter 12; sub-2% ATE after closure + global BA.
        assert ate < 0.25, f"ATE {ate:.3f}"

    def test_odometry_edges_complete(self, result):
        out, _ = result
        assert len(out.odo_edges) == 25  # one per consecutive pair


@pytest.mark.slow
class TestKeyframeSelection:
    def test_keyframe_gate_caps_map_growth(self):
        """On a redundant (slow-motion) sequence, keyframe gating carries
        fewer observations while the trajectory stays accurate. (On fast
        sequences where every frame is needed the gate must stay off — the
        26-frame circle loses tracking with any gating, by design.)"""
        local_rng = np.random.default_rng(7)
        scene = CircleScene(local_rng, n_points=300, n_frames=40)
        feats = features_of(local_rng, scene)
        cfg = PipelineConfig(
            ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
            map=MapConfig(max_frames=64, max_points=8192, max_obs=65536),
        )
        base = dict(window=8, loop_gap=14, loop_min_votes=20)
        dense = slam(feats, Pinhole.from_K(scene.K), cfg, SlamConfig(**base))
        sparse = slam(
            feats, Pinhole.from_K(scene.K), cfg,
            SlamConfig(**base, kf_tracked_thresh=45, kf_max_gap=2),
        )
        assert sparse.rec.n_frames == dense.rec.n_frames
        assert sparse.rec.n_obs < 0.9 * dense.rec.n_obs
        gt = np.einsum("fji,fj->fi", scene.R, -scene.t)
        for out in (dense, sparse):
            ate = float(ate_rmse(
                jnp.asarray(out.rec.camera_centers()), jnp.asarray(gt)
            ))
            assert ate < 0.25, ate
