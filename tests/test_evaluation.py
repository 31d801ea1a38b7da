"""Evaluation harness tests (the reference's top layer, SURVEY.md §3.1):
match precision/recall vs ground-truth homographies, dataset loaders, and
the end-to-end detect->match->score driver on synthetic warped pairs."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.datasets import (
    ImagePair,
    evaluate_pairs,
    load_tum_trajectory,
    load_vgg_dataset,
    random_homography,
    render_texture,
    synthesize_warped_pair,
    warp_image,
)
from fastmatch_tpu.utils.evaluation import (
    match_agreement,
    match_precision_recall,
    project_homography,
)


class TestMatchPR:
    def test_hand_built_matches(self):
        # A-keypoints at integer grid, H = identity, B = A shuffled.
        xy_a = jnp.asarray(np.array([[10, 10], [50, 20], [90, 80], [0, 0]], np.float32))
        mask_a = jnp.asarray([True, True, True, False])
        perm = [2, 0, 1]
        xy_b = xy_a[jnp.asarray(perm)]
        mask_b = jnp.asarray([True, True, True])
        H = jnp.eye(3)
        # correct match for a0 is b1, a1 -> b2, a2 -> b0
        idx = jnp.asarray([1, 2, 1, 0], jnp.int32)  # a2 deliberately wrong
        valid = jnp.asarray([True, True, True, False])
        ev = match_precision_recall(xy_a, mask_a, xy_b, mask_b, idx, valid, H, tol=2.0)
        assert int(ev.n_predicted) == 3
        assert int(ev.n_correct) == 2
        assert int(ev.n_gt) == 3
        assert np.isclose(float(ev.precision), 2 / 3)
        assert np.isclose(float(ev.recall), 2 / 3)

    def test_projection(self):
        H = jnp.asarray(
            np.array([[2, 0, 5], [0, 2, -3], [0, 0, 1]], np.float32)
        )
        xy = jnp.asarray(np.array([[1.0, 2.0]], np.float32))
        out = project_homography(H, xy)
        assert np.allclose(np.asarray(out), [[7.0, 1.0]])

    def test_agreement_metric(self):
        idx_a = jnp.asarray([1, 2, 3, 4], jnp.int32)
        valid_a = jnp.asarray([True, True, False, False])
        idx_b = jnp.asarray([1, 9, 7, 4], jnp.int32)
        valid_b = jnp.asarray([True, True, False, True])
        # slot0 agree (same idx), slot1 disagree (diff idx), slot2 agree
        # (both invalid), slot3 disagree (validity differs)
        assert np.isclose(float(match_agreement(idx_a, valid_a, idx_b, valid_b)), 0.5)


class TestSyntheticPairs:
    def test_warp_roundtrip(self):
        rng = np.random.default_rng(0)
        img = render_texture(rng, 128, 128)
        H = random_homography(rng, 128, 128)
        warped = warp_image(img, H)
        # Centre pixel of the warp equals bilinear sample of the source at
        # H^-1 x (checked indirectly: warping by identity is identity).
        assert np.allclose(warp_image(img, np.eye(3, dtype=np.float32)), img, atol=1e-6)
        assert warped.shape == img.shape
        assert warped.dtype == np.float32

    def test_end_to_end_precision(self):
        """Detect+match+score on a synthetic warped pair: the matcher's
        surviving matches must be overwhelmingly correct (ratio+cross-check
        is a high-precision filter)."""
        from fastmatch_tpu.features.sift import SIFTConfig

        pair = synthesize_warped_pair(seed=1, h=192, w=192)
        cfg = SIFTConfig(capacity=512)
        results, agg = evaluate_pairs([pair], sift_cfg=cfg, tol=3.0, backend="jnp")
        assert agg["n_predicted"] >= 30
        assert agg["mean_precision"] >= 0.85
        assert agg["mean_recall"] >= 0.25


class TestLoaders:
    def test_vgg_layout(self, tmp_path):
        # Fabricate a minimal VGG-style dir with PGM images + H files.
        rng = np.random.default_rng(3)
        img = (render_texture(rng, 64, 64) * 255).astype(np.uint8)
        for i in (1, 2, 3):
            p = tmp_path / f"img{i}.pgm"
            with open(p, "wb") as fh:
                fh.write(b"P5\n64 64\n255\n" + img.tobytes())
        H = np.eye(3) + 0.01
        for k in (2, 3):
            np.savetxt(tmp_path / f"H1to{k}p", H)
        pairs = load_vgg_dataset(str(tmp_path))
        assert len(pairs) == 2
        assert pairs[0].name.endswith("1to2")
        assert np.allclose(pairs[0].H_ab, H, atol=1e-6)
        # images decode through the native loader
        from fastmatch_tpu.datasets import _gray

        g = _gray(pairs[0].image_a)
        assert g.shape == (64, 64)

    def test_vgg_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_vgg_dataset(str(tmp_path))

    def test_tum_trajectory(self, tmp_path):
        p = tmp_path / "gt.txt"
        p.write_text(
            "# ts tx ty tz qx qy qz qw\n"
            "0.0 1 2 3 0 0 0 1\n"
            "1.0 4 5 6 0 0 0 1\n"
        )
        ts, centers, quats = load_tum_trajectory(str(p))
        assert ts.shape == (2,)
        assert np.allclose(centers, [[1, 2, 3], [4, 5, 6]])
        assert np.allclose(quats[:, 3], 1.0)


class TestCLI:
    def test_evaluate_synth(self, capsys):
        from fastmatch_tpu.cli import main

        main(["--set", "sift.capacity=256", "evaluate", "synth",
              "--n-synth", "1", "--resize", "128"])
        out = capsys.readouterr().out.strip().splitlines()
        agg = json.loads(out[-1])["aggregate"]
        assert agg["pairs"] == 1
        assert 0.0 <= agg["mean_precision"] <= 1.0


class TestResizeHandling:
    def test_resize_rescales_homography(self):
        """--resize must conjugate H by the scaling (S_b H S_a^-1): metrics
        at half resolution should roughly match full resolution, not
        collapse to zero."""
        pair = synthesize_warped_pair(seed=2, h=256, w=256)
        from fastmatch_tpu.features.sift import SIFTConfig

        cfg = SIFTConfig(capacity=512)
        _, full = evaluate_pairs([pair], sift_cfg=cfg, backend="jnp")
        _, half = evaluate_pairs([pair], sift_cfg=cfg, backend="jnp",
                                 size=(128, 128))
        assert half["n_predicted"] > 10
        assert half["mean_precision"] > 0.7
        # and full resolution stays the reference point
        assert full["mean_precision"] > 0.85

    def test_agreement_mask(self):
        idx = jnp.zeros(8, jnp.int32)
        valid = jnp.zeros(8, bool)
        # live slots: 2, disagreeing on validity in one of them
        valid_b = valid.at[0].set(True)
        mask = jnp.zeros(8, bool).at[0].set(True).at[1].set(True)
        # unmasked: 7/8 agree (inflated); masked: 1/2
        assert np.isclose(float(match_agreement(idx, valid, idx, valid_b)), 7 / 8)
        assert np.isclose(
            float(match_agreement(idx, valid, idx, valid_b, mask=mask)), 0.5
        )


class TestTrajectoryEvaluation:
    def test_rpe_trans_gauge_invariance(self, rng):
        from fastmatch_tpu.utils.evaluation import rpe_trans
        import jax.numpy as jnp

        gt = np.cumsum(rng.normal(0, 0.3, (50, 3)), axis=0).astype(np.float32)
        # similarity-transformed copy: ATE and RPE must both be ~0
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        est = (2.5 * gt @ R.T + np.array([3.0, -1.0, 2.0])).astype(np.float32)
        rmse, med = rpe_trans(jnp.asarray(est), jnp.asarray(gt))
        assert float(rmse) < 1e-4
        # local noise raises RPE but only slightly moves its median
        est2 = est + rng.normal(0, 0.01, est.shape).astype(np.float32) * 2.5
        rmse2, _ = rpe_trans(jnp.asarray(est2), jnp.asarray(gt))
        assert float(rmse2) > float(rmse)

    def test_rpe_delta_validated(self, rng):
        """delta outside [1, n-1] used to yield NaN statistics (empty
        slices) that the CLI printed as non-standard JSON (ADVICE r4)."""
        from fastmatch_tpu.utils.evaluation import rpe_trans
        import jax.numpy as jnp

        gt = np.cumsum(rng.normal(0, 0.3, (10, 3)), axis=0).astype(np.float32)
        est = jnp.asarray(gt + 0.01)
        gtj = jnp.asarray(gt)
        for bad in (0, -1, 10, 11):
            with pytest.raises(ValueError, match="rpe delta"):
                rpe_trans(est, gtj, delta=bad)
        rmse, med = rpe_trans(est, gtj, delta=9)   # boundary is fine
        assert np.isfinite(float(rmse)) and np.isfinite(float(med))

    def test_cli_evaluate_traj(self, rng, tmp_path, capsys):
        import json
        from fastmatch_tpu.cli import main

        gt = np.cumsum(rng.normal(0, 0.3, (40, 3)), axis=0).astype(np.float32)
        est = 1.7 * gt + np.array([1.0, 2.0, 3.0], np.float32)
        est += rng.normal(0, 0.02, est.shape).astype(np.float32)
        np.savez(tmp_path / "est.npz", centers=est)
        # GT as a TUM file (identity quaternions)
        lines = ["# ts tx ty tz qx qy qz qw"]
        for i, c in enumerate(gt):
            lines.append(f"{i} {c[0]} {c[1]} {c[2]} 0 0 0 1")
        (tmp_path / "gt.txt").write_text("\n".join(lines))
        main(["evaluate", "traj", "--est", str(tmp_path / "est.npz"),
              "--gt", str(tmp_path / "gt.txt"), "--rpe-delta", "2"])
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["n_frames"] == 40
        assert rep["ate_rmse"] < 0.05
        assert rep["rpe_rmse"] < 0.1
        assert rep["rpe_delta"] == 2
