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


class TestBigBankIVF:
    """Compact-gather IVF (match_pair_ann_big): real FLOP reduction with
    recall tested against the exact matcher on a clustered bank."""

    def _clustered_bank(self, rng, m=4096, k=32):
        centers = random_descriptors(rng, k)
        assign = rng.integers(0, k, m)
        d = centers[assign] + 0.08 * rng.standard_normal((m, 128)).astype(np.float32)
        d = np.abs(d)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return d

    def test_recall_vs_exact_coherent_queries(self, rng):
        """The IVF shortlist's use case: a visually coherent query frame
        (rows from a few visual words) against a big multi-word bank —
        recall equals the fraction of queries whose nearest cluster is
        admitted, so coherent queries fit the budget."""
        from fastmatch_tpu.matching.ann import build_index_sorted, match_pair_ann_big
        from fastmatch_tpu.matching.matcher import match_pair_jnp

        bank = self._clustered_bank(rng)
        idx = build_index_sorted(jax.random.PRNGKey(0),
                                 Descriptors(jnp.asarray(bank), jnp.ones(4096, bool)),
                                 n_clusters=32)
        # queries drawn from rows of 4 clusters only (one "scene")
        assign = np.asarray(idx.assign)
        perm = np.asarray(idx.perm)
        rows = perm[np.isin(assign, [3, 7, 11, 19])]
        q_src = rng.choice(rows, 256, replace=True)
        q = bank[q_src] + 0.03 * rng.standard_normal((256, 128)).astype(np.float32)
        q = np.abs(q)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        da = Descriptors(jnp.asarray(q), jnp.ones(256, bool))
        db = Descriptors(jnp.asarray(bank), jnp.ones(4096, bool))

        exact = match_pair_jnp(da, db)
        approx = match_pair_ann_big(da, idx, budget=1024, n_probe=6,
                                    backend="jnp")
        ev = np.asarray(exact.valid)
        av = np.asarray(approx.valid)
        same = (np.asarray(exact.idx) == np.asarray(approx.idx)) & ev & av
        recall = same.sum() / max(ev.sum(), 1)
        # 4x FLOP reduction (budget 1024 vs bank 4096) at high recall
        assert recall >= 0.9, recall

    def test_index_sort_roundtrip(self, rng):
        from fastmatch_tpu.matching.ann import build_index_sorted

        bank = self._clustered_bank(rng, m=512, k=8)
        mask = np.ones(512, bool)
        mask[::7] = False
        db = Descriptors(jnp.asarray(bank), jnp.asarray(mask))
        idx = build_index_sorted(jax.random.PRNGKey(1), db, n_clusters=8)
        # permutation restores original rows
        np.testing.assert_allclose(
            np.asarray(idx.desc.data), bank[np.asarray(idx.perm)], atol=0
        )
        # cluster ranges are contiguous and cover all live rows
        starts = np.asarray(idx.starts)
        assert starts[-1] == mask.sum()
        a = np.asarray(idx.assign)
        for k in range(8):
            assert (a[starts[k]:starts[k + 1]] == k).all()
