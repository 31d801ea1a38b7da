"""Batched fused matcher kernel (kernels/batch_match.py) vs the jnp anchor:
decision parity in interpret mode, including adversarial masks. On-chip
throughput/agreement is exercised by bench.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.kernels.batch_match import match_batch_fused
from fastmatch_tpu.matching.matcher import match_pair_jnp


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    B, N, M = 4, 512, 768

    def mkd(cap):
        k = int(rng.integers(cap // 2, cap + 1))
        d = np.zeros((cap, 128), np.float32)
        m = np.zeros(cap, bool)
        d[:k] = np.abs(rng.standard_normal((k, 128))).astype(np.float32)
        d[:k] /= np.linalg.norm(d[:k], axis=1, keepdims=True)
        m[:k] = True
        return d, m

    da = [mkd(N) for _ in range(B)]
    db = [mkd(M) for _ in range(B)]
    # Adversarial: a single-entry bank (no second neighbor -> no match) and
    # a fully-masked query set.
    db[2][1][:] = False
    db[2][1][:1] = True
    da[3][1][:] = False
    DA = Descriptors(jnp.stack([d for d, _ in da]),
                     jnp.stack([m for _, m in da]))
    DB = Descriptors(jnp.stack([d for d, _ in db]),
                     jnp.stack([m for _, m in db]))
    return DA, DB


class TestBatchMatchFused:
    @pytest.mark.parametrize("cross_check", [True, False])
    @pytest.mark.parametrize("ratio", [0.8, 1.0])
    def test_decision_parity_vs_anchor(self, batch, cross_check, ratio):
        DA, DB = batch
        out = match_batch_fused(DA, DB, ratio=ratio, cross_check=cross_check,
                                interpret=True)
        for i in range(DA.data.shape[0]):
            ref = match_pair_jnp(
                Descriptors(DA.data[i], DA.mask[i]),
                Descriptors(DB.data[i], DB.mask[i]),
                ratio, cross_check=cross_check)
            assert np.array_equal(np.asarray(out.valid[i]),
                                  np.asarray(ref.valid)), i
            v = np.asarray(ref.valid)
            assert np.array_equal(np.asarray(out.idx[i])[v],
                                  np.asarray(ref.idx)[v]), i
            np.testing.assert_allclose(np.asarray(out.dist[i])[v],
                                       np.asarray(ref.dist)[v], rtol=1e-6)

    @pytest.mark.parametrize("cross_check", [True, False])
    def test_fast_value_crosscheck_parity(self, batch, cross_check):
        """fast=True swaps the exact column-argmin cross-check for the
        value-based mutual test (round 3). With descriptors pre-quantized to
        bf16-representable values the fast path's operand cast is value-exact,
        so its decisions must equal the anchor's bit-for-bit — the value-based
        mutual check diverges only on exact f32 column-score ties, absent in
        random data. Covers the adversarial masks of the shared fixture."""
        DA, DB = batch
        q = lambda d: Descriptors(
            d.data.astype(jnp.bfloat16).astype(jnp.float32), d.mask)
        DAq, DBq = q(DA), q(DB)
        out = match_batch_fused(DAq, DBq, cross_check=cross_check,
                                fast=True, interpret=True)
        for i in range(DAq.data.shape[0]):
            ref = match_pair_jnp(
                Descriptors(DAq.data[i], DAq.mask[i]),
                Descriptors(DBq.data[i], DBq.mask[i]),
                cross_check=cross_check)
            assert np.array_equal(np.asarray(out.valid[i]),
                                  np.asarray(ref.valid)), i
            v = np.asarray(ref.valid)
            assert np.array_equal(np.asarray(out.idx[i])[v],
                                  np.asarray(ref.idx)[v]), i

    def test_correlated_pairs_match_correctly(self):
        rng = np.random.default_rng(7)
        N = 256
        base = np.abs(rng.standard_normal((N, 128))).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        noisy = np.abs(base + 0.05 * rng.standard_normal((N, 128))
                       .astype(np.float32))
        noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
        perm = rng.permutation(N)
        DA = Descriptors(jnp.asarray(base[None]), jnp.ones((1, N), bool))
        DB = Descriptors(jnp.asarray(noisy[perm][None]),
                         jnp.ones((1, N), bool))
        out = match_batch_fused(DA, DB, interpret=True)
        inv = np.argsort(perm)
        v = np.asarray(out.valid[0])
        idx = np.asarray(out.idx[0])
        assert v.sum() > N // 2
        assert (idx[v] == inv[v]).all()

    def test_bank_size_guard(self, batch):
        DA, _ = batch
        big = Descriptors(jnp.zeros((4, 8192, 128)), jnp.zeros((4, 8192), bool))
        with pytest.raises(ValueError, match="VMEM-resident"):
            match_batch_fused(DA, big, interpret=True)
