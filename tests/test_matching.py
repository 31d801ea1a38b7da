"""Matching tests: jnp reference vs cv2 BFMatcher oracle + adversarial masks.

SURVEY.md §5.2 "Oracle parity" tier: cv2 is the test oracle, never the
product path. The >=99% agreement target is BASELINE.json:5.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy
from fastmatch_tpu.matching.matcher import (
    BIG,
    match_batch,
    match_pair_jnp,
    masked_top2,
    squared_distance_matrix,
)
from synth import corresponding_descriptors, random_descriptors


def cv2_ratio_matches(desc_a, desc_b, ratio=0.8, cross_check=True):
    """Oracle: cv2 BFMatcher knnMatch + Lowe ratio (+ mutual-NN filter)."""
    import cv2

    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(desc_a, desc_b, k=2)
    out = {}
    for pair in knn:
        if len(pair) < 2:
            continue
        m, n = pair
        if m.distance < ratio * n.distance:
            out[m.queryIdx] = m.trainIdx
    if cross_check:
        knn_ba = bf.knnMatch(desc_b, desc_a, k=1)
        nn_b = {p[0].queryIdx: p[0].trainIdx for p in knn_ba if p}
        out = {q: t for q, t in out.items() if nn_b.get(t) == q}
    return out


class TestDistanceMatrix:
    def test_matches_numpy(self, rng):
        a = random_descriptors(rng, 50)
        b = random_descriptors(rng, 70)
        d2 = np.asarray(squared_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        expected = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d2, expected, atol=1e-5)

    def test_top2_masking(self):
        # Padded zero rows in B must never win: distance to a zero row from a
        # unit vector is 1.0, often less than to a real neighbor.
        a = np.eye(4, 128, dtype=np.float32)
        b = np.zeros((8, 128), np.float32)
        b[0] = np.eye(1, 128, dtype=np.float32)[0] * 0.9
        mask_b = np.zeros(8, bool)
        mask_b[0] = True
        d2 = squared_distance_matrix(jnp.asarray(a), jnp.asarray(b))
        idx1, d1, idx2, d2nd = masked_top2(d2, jnp.asarray(mask_b))
        assert int(idx1[0]) == 0
        assert float(d2nd[0]) >= float(BIG) * 0.99  # only one valid neighbor

    def test_tie_breaks_low_index(self):
        a = np.ones((1, 128), np.float32)
        b = np.ones((4, 128), np.float32)  # all identical -> 4-way tie
        desc_a = Descriptors(jnp.asarray(a), jnp.ones(1, bool))
        desc_b = Descriptors(jnp.asarray(b), jnp.ones(4, bool))
        m = match_pair_jnp(desc_a, desc_b, ratio=1.1, cross_check=False)
        assert int(m.idx[0]) == 0


class TestMatchPairJnp:
    @pytest.mark.parametrize("cross_check", [False, True])
    def test_oracle_agreement(self, rng, cross_check):
        a, b, gt = corresponding_descriptors(rng, 500, noise=0.08, n_distract=300)
        ours = match_pair_jnp(
            descriptors_from_numpy(a, 512),
            descriptors_from_numpy(b, 1024),
            ratio=0.8,
            cross_check=cross_check,
        )
        oracle = cv2_ratio_matches(a, b, ratio=0.8, cross_check=cross_check)
        ours_map = {
            i: int(ours.idx[i]) for i in range(512) if bool(ours.valid[i]) and i < 500
        }
        # Agreement on the union of either side's matches:
        keys = set(oracle) | set(ours_map)
        agree = sum(1 for k in keys if oracle.get(k) == ours_map.get(k))
        assert keys, "oracle produced no matches — fixture broken"
        assert agree / len(keys) >= 0.99, f"agreement {agree/len(keys):.3f}"

    def test_recovers_ground_truth(self, rng):
        a, b, gt = corresponding_descriptors(rng, 300, noise=0.03, n_distract=100)
        m = match_pair_jnp(descriptors_from_numpy(a, 512), descriptors_from_numpy(b, 512))
        hits = sum(
            1 for i in range(300) if bool(m.valid[i]) and int(m.idx[i]) == gt[i]
        )
        total = int(np.sum(np.asarray(m.valid)[:300]))
        assert total > 200  # low noise: most should match
        assert hits / max(total, 1) >= 0.99

    def test_all_masked_a(self, rng):
        a = descriptors_from_numpy(random_descriptors(rng, 10), 16)
        b = descriptors_from_numpy(random_descriptors(rng, 10), 16)
        a_empty = Descriptors(a.data, jnp.zeros_like(a.mask))
        m = match_pair_jnp(a_empty, b)
        assert int(m.count()) == 0

    def test_all_masked_b(self, rng):
        a = descriptors_from_numpy(random_descriptors(rng, 10), 16)
        b = descriptors_from_numpy(random_descriptors(rng, 10), 16)
        b_empty = Descriptors(b.data, jnp.zeros_like(b.mask))
        m = match_pair_jnp(a, b_empty)
        assert int(m.count()) == 0

    def test_single_valid_b_fails_ratio(self, rng):
        # With one valid B entry there is no second neighbor: no match.
        a = descriptors_from_numpy(random_descriptors(rng, 4), 8)
        b_raw = random_descriptors(rng, 1)
        b = descriptors_from_numpy(b_raw, 8)
        m = match_pair_jnp(a, b, cross_check=False)
        assert int(m.count()) == 0

    def test_adversarial_mask_pattern(self, rng):
        # Interleaved masks; results must equal matching the compacted sets.
        a_raw = random_descriptors(rng, 64)
        b_raw = random_descriptors(rng, 64)
        keep_a = np.arange(64) % 3 != 0
        keep_b = np.arange(64) % 2 == 0
        full_a = Descriptors(jnp.asarray(a_raw), jnp.asarray(keep_a))
        full_b = Descriptors(jnp.asarray(b_raw), jnp.asarray(keep_b))
        m_full = match_pair_jnp(full_a, full_b)

        comp_a = descriptors_from_numpy(a_raw[keep_a], 64)
        comp_b = descriptors_from_numpy(b_raw[keep_b], 64)
        m_comp = match_pair_jnp(comp_a, comp_b)

        ia = np.where(keep_a)[0]
        ib = np.where(keep_b)[0]
        for ci, fi in enumerate(ia):
            assert bool(m_full.valid[fi]) == bool(m_comp.valid[ci])
            if bool(m_comp.valid[ci]):
                assert int(m_full.idx[fi]) == ib[int(m_comp.idx[ci])]

    def test_masked_rows_never_valid(self, rng):
        a = descriptors_from_numpy(random_descriptors(rng, 20), 32)
        b = descriptors_from_numpy(random_descriptors(rng, 20), 32)
        m = match_pair_jnp(a, b, ratio=1.5)  # permissive ratio
        assert not np.any(np.asarray(m.valid)[20:])


class TestMatchBatch:
    def test_batch_equals_loop(self, rng):
        B, n = 4, 100
        pairs = [corresponding_descriptors(rng, n, noise=0.1, n_distract=28) for _ in range(B)]
        da = Descriptors(
            jnp.stack([descriptors_from_numpy(p[0], 128).data for p in pairs]),
            jnp.stack([descriptors_from_numpy(p[0], 128).mask for p in pairs]),
        )
        db = Descriptors(
            jnp.stack([descriptors_from_numpy(p[1], 128).data for p in pairs]),
            jnp.stack([descriptors_from_numpy(p[1], 128).mask for p in pairs]),
        )
        mb = match_batch(da, db)
        for i in range(B):
            mi = match_pair_jnp(
                Descriptors(da.data[i], da.mask[i]), Descriptors(db.data[i], db.mask[i])
            )
            np.testing.assert_array_equal(np.asarray(mb.valid[i]), np.asarray(mi.valid))
            np.testing.assert_array_equal(np.asarray(mb.idx[i]), np.asarray(mi.idx))


class TestGeometricVerification:
    """verify_matches: appearance matches filtered by a robust two-view model."""

    def _setup(self, rng, n=200, n_bad=40):
        from synth import corresponding_descriptors
        from fastmatch_tpu.core.containers import Keypoints

        # General 3D scene projected to two pixel frames.
        X = np.column_stack([rng.uniform(-1.5, 1.5, (n, 2)),
                             rng.uniform(2.0, 6.0, n)])
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.4, -0.1, 0.15], np.float32)
        X2 = X @ R.T + t
        px1 = (X[:, :2] / X[:, 2:3] * 500 + [320, 240]).astype(np.float32)
        px2 = (X2[:, :2] / X2[:, 2:3] * 500 + [320, 240]).astype(np.float32)
        # Descriptors: matched pairs agree; n_bad of them are appearance
        # look-alikes placed at geometrically WRONG locations in image b.
        # desc_b is shuffled (d_a[i] <-> d_b[gt[i]]), so image-b keypoint
        # coordinates must be laid out in the same shuffled order.
        d_a, d_b, gt = corresponding_descriptors(rng, n, noise=0.02)
        px2[:n_bad] = rng.uniform(0, 640, (n_bad, 2)).astype(np.float32)
        px2 = px2[np.argsort(gt)]

        def kp(px):
            c = px.shape[0]
            return Keypoints(
                xy=jnp.asarray(px), scale=jnp.ones(c), angle=jnp.zeros(c),
                score=jnp.ones(c), mask=jnp.ones(c, bool))

        return kp(px1), kp(px2), d_a, d_b, n_bad

    def test_filters_geometric_outliers(self, rng):
        from fastmatch_tpu.core.containers import descriptors_from_numpy
        from fastmatch_tpu.matching.matcher import match_pair_jnp
        from fastmatch_tpu.matching.verify import verify_matches

        kp_a, kp_b, d_a, d_b, n_bad = self._setup(rng)
        n = d_a.shape[0]
        da = descriptors_from_numpy(d_a, n)
        db = descriptors_from_numpy(d_b, n)
        m = match_pair_jnp(da, db)
        # Appearance matching keeps the look-alikes...
        assert int(np.asarray(m.valid)[:n_bad].sum()) > 0.5 * n_bad
        vr = verify_matches(jax.random.PRNGKey(0), kp_a, kp_b, m,
                            model="fundamental", thr_px=2.0)
        assert bool(vr.ok)
        v = np.asarray(vr.matches.valid)
        # ...geometric verification removes them and keeps the good ones.
        # (F constrains a match to an epipolar LINE, so a few random
        # locations legitimately land within thr of it — allow ~15%.)
        assert v[:n_bad].sum() <= 0.15 * n_bad + 1
        assert v[n_bad:].sum() >= 0.9 * np.asarray(m.valid)[n_bad:].sum()

    def test_unverifiable_passes_through(self, rng):
        from fastmatch_tpu.core.containers import descriptors_from_numpy
        from fastmatch_tpu.matching.matcher import match_pair_jnp
        from fastmatch_tpu.matching.verify import verify_matches

        kp_a, kp_b, d_a, d_b, _ = self._setup(rng, n=20, n_bad=0)
        da = descriptors_from_numpy(d_a, 20)
        db = descriptors_from_numpy(d_b, 20)
        m = match_pair_jnp(da, db)
        vr = verify_matches(jax.random.PRNGKey(0), kp_a, kp_b, m,
                            model="fundamental", min_inliers=50)
        assert not bool(vr.ok)
        np.testing.assert_array_equal(np.asarray(vr.matches.valid),
                                      np.asarray(m.valid))
