"""ANN pre-filter tests: recall vs exact matching (component T7)."""

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy
from fastmatch_tpu.matching.ann import build_index, kmeans, match_pair_ann
from fastmatch_tpu.matching.matcher import match_pair_jnp
from synth import corresponding_descriptors, random_descriptors


class TestKMeans:
    def test_clusters_separable_data(self, rng):
        # 4 well-separated blobs in descriptor space.
        centers = np.eye(4, 128, dtype=np.float32)
        data = np.repeat(centers, 64, axis=0) + 0.01 * rng.standard_normal(
            (256, 128)
        ).astype(np.float32)
        cent, assign = kmeans(
            jax.random.PRNGKey(0), jnp.asarray(data), jnp.ones(256, bool), 4, iters=8
        )
        a = np.asarray(assign)
        # Each ground-truth blob maps to exactly one cluster.
        for b in range(4):
            blob = a[b * 64 : (b + 1) * 64]
            assert len(np.unique(blob)) == 1

    def test_masked_rows_ignored(self, rng):
        data = random_descriptors(rng, 128)
        data[64:] = 100.0  # poison the masked half
        mask = np.zeros(128, bool)
        mask[:64] = True
        cent, _ = kmeans(jax.random.PRNGKey(1), jnp.asarray(data),
                         jnp.asarray(mask), 8)
        assert float(jnp.abs(cent).max()) < 10.0


class TestANNMatch:
    def test_high_recall_vs_exact(self, rng):
        a, b, _ = corresponding_descriptors(rng, 600, noise=0.08, n_distract=424)
        da = descriptors_from_numpy(a, 1024)
        db = descriptors_from_numpy(b, 1024)
        index = build_index(jax.random.PRNGKey(0), db, n_clusters=32)
        exact = match_pair_jnp(da, db)
        approx = match_pair_ann(da, index, n_probe=8)
        ev = np.asarray(exact.valid)
        av = np.asarray(approx.valid)
        # Recall: fraction of exact matches the ANN path reproduces.
        agree = (av & ev & (np.asarray(approx.idx) == np.asarray(exact.idx))).sum()
        recall = agree / max(ev.sum(), 1)
        assert recall >= 0.95, f"ANN recall {recall:.3f}"

    def test_probe_all_equals_exact(self, rng):
        a, b, _ = corresponding_descriptors(rng, 300, noise=0.1, n_distract=212)
        da = descriptors_from_numpy(a, 512)
        db = descriptors_from_numpy(b, 512)
        index = build_index(jax.random.PRNGKey(0), db, n_clusters=16)
        exact = match_pair_jnp(da, db)
        approx = match_pair_ann(da, index, n_probe=16)  # probe everything
        np.testing.assert_array_equal(np.asarray(approx.valid), np.asarray(exact.valid))
        v = np.asarray(exact.valid)
        np.testing.assert_array_equal(np.asarray(approx.idx)[v], np.asarray(exact.idx)[v])
