"""Kernel parity tier (SURVEY.md §5.2): Pallas fused kernel vs jnp reference.

Runs in interpret mode on CPU; the on-chip path shares the exact same op
sequence and is exercised by bench.py and tpu-marked tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy
from fastmatch_tpu.kernels.distance_topk import distance_topk, match_pair_pallas
from fastmatch_tpu.matching.matcher import BIG, match_pair_jnp
from synth import corresponding_descriptors, random_descriptors


def _pallas(a, b, **kw):
    return match_pair_pallas(a, b, interpret=True, **kw)


def _assert_matches_equal(m1, m2):
    np.testing.assert_array_equal(np.asarray(m1.valid), np.asarray(m2.valid))
    v = np.asarray(m1.valid)
    np.testing.assert_array_equal(np.asarray(m1.idx)[v], np.asarray(m2.idx)[v])
    np.testing.assert_allclose(
        np.asarray(m1.dist)[v], np.asarray(m2.dist)[v], rtol=1e-6, atol=1e-6
    )


class TestDistanceTopkParity:
    @pytest.mark.parametrize("cross_check", [False, True])
    def test_exact_parity_random(self, rng, cross_check):
        a, b, _ = corresponding_descriptors(rng, 400, noise=0.1, n_distract=112)
        da = descriptors_from_numpy(a, 512)
        db = descriptors_from_numpy(b, 512)
        mp = _pallas(da, db, cross_check=cross_check)
        mj = match_pair_jnp(da, db, cross_check=cross_check)
        _assert_matches_equal(mp, mj)

    def test_rectangular_and_multitile(self, rng):
        a = random_descriptors(rng, 700)
        b = random_descriptors(rng, 300)
        da = descriptors_from_numpy(a, 1024)
        db = descriptors_from_numpy(b, 512)
        _assert_matches_equal(_pallas(da, db), match_pair_jnp(da, db))

    def test_small_single_tile(self, rng):
        a = random_descriptors(rng, 100)
        b = random_descriptors(rng, 100)
        da = descriptors_from_numpy(a, 256)
        db = descriptors_from_numpy(b, 256)
        _assert_matches_equal(_pallas(da, db), match_pair_jnp(da, db))

    def test_adversarial_masks(self, rng):
        a = random_descriptors(rng, 512)
        b = random_descriptors(rng, 512)
        keep_a = np.arange(512) % 5 != 0
        keep_b = np.arange(512) % 7 != 3
        da = Descriptors(jnp.asarray(a), jnp.asarray(keep_a))
        db = Descriptors(jnp.asarray(b), jnp.asarray(keep_b))
        _assert_matches_equal(_pallas(da, db), match_pair_jnp(da, db))

    def test_all_b_masked(self, rng):
        a = descriptors_from_numpy(random_descriptors(rng, 100), 256)
        b_raw = descriptors_from_numpy(random_descriptors(rng, 100), 256)
        b = Descriptors(b_raw.data, jnp.zeros_like(b_raw.mask))
        mp = _pallas(a, b)
        assert int(mp.count()) == 0

    def test_duplicate_descriptors_tie_break(self):
        # Identical rows in B spanning tile boundaries: both backends must
        # pick the same (lowest) index.
        a = np.tile(np.eye(8, 128, dtype=np.float32), (32, 1))  # 256 rows
        b = np.zeros((512, 128), np.float32)
        b[:] = np.tile(np.eye(8, 128, dtype=np.float32), (64, 1))
        da = descriptors_from_numpy(a, 256)
        db = descriptors_from_numpy(b, 512)
        mp = _pallas(da, db, cross_check=False, ratio=1.5)
        mj = match_pair_jnp(da, db, cross_check=False, ratio=1.5)
        np.testing.assert_array_equal(np.asarray(mp.idx), np.asarray(mj.idx))
        np.testing.assert_array_equal(np.asarray(mp.valid), np.asarray(mj.valid))

    def test_raw_outputs(self, rng):
        # distance_topk's raw outputs against a numpy brute-force computation.
        a = random_descriptors(rng, 256)
        b = random_descriptors(rng, 256)
        a2 = (a * a).sum(1)
        b2 = (b * b).sum(1)
        idx1, d1, d2nd, nnb = distance_topk(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(b2), jnp.asarray(a2), interpret=True
        )
        d2_full = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx1), d2_full.argmin(1))
        np.testing.assert_allclose(np.asarray(d1), d2_full.min(1), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(nnb), d2_full.argmin(0))
        part = np.partition(d2_full, 1, axis=1)[:, 1]
        np.testing.assert_allclose(np.asarray(d2nd), part, atol=1e-5)


class TestFastPrecision:
    """precision="fast" (bf16 MXU feed): >=99% decision agreement with the
    exact path on a near-tie-heavy workload (noisy copies + distractors)."""

    def test_agreement_gate(self, rng):
        from fastmatch_tpu.core.containers import Descriptors
        from fastmatch_tpu.kernels.distance_topk import match_pair_pallas
        from fastmatch_tpu.matching.matcher import match_pair_jnp
        from fastmatch_tpu.utils.evaluation import match_agreement

        n = 1024
        base = np.abs(rng.standard_normal((n, 128))).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        q = base[: n // 2] + 0.15 * np.abs(
            rng.standard_normal((n // 2, 128))
        ).astype(np.float32)
        q = np.vstack([q, np.abs(rng.standard_normal((n // 2, 128))).astype(np.float32)])
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        da = Descriptors(jnp.asarray(q), jnp.ones(n, bool))
        db = Descriptors(jnp.asarray(base), jnp.ones(n, bool))
        ref = match_pair_jnp(da, db)
        fast = match_pair_pallas(da, db, precision="fast", interpret=True)
        agree = float(match_agreement(ref.idx, ref.valid, fast.idx, fast.valid))
        assert agree >= 0.99, agree

    def test_bad_precision_rejected(self, rng):
        from fastmatch_tpu.core.containers import Descriptors
        from fastmatch_tpu.kernels.distance_topk import match_pair_pallas

        d = Descriptors(jnp.zeros((8, 128)), jnp.ones(8, bool))
        with pytest.raises(ValueError, match="precision"):
            match_pair_pallas(d, d, precision="bf16")
