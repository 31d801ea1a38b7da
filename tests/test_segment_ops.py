"""Sorted-segment Pallas kernels vs jax.ops references (interpret mode;
on-chip exercised through ba_solve once the backend gate activates)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.kernels.segment_ops import (
    sorted_gather_rows,
    sorted_segment_sum,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestSortedSegmentSum:
    def test_matches_xla(self, rng):
        O, P = 8192, 2048
        vals = jnp.asarray(rng.standard_normal((O, 3)).astype(np.float32))
        seg = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))
        out = sorted_segment_sum(vals, seg, P, interpret=True)
        ref = jax.ops.segment_sum(vals, seg, num_segments=P)
        assert float(jnp.abs(out - ref).max()) < 1e-4

    def test_sparse_ids_large_spans(self, rng):
        # 40 distinct ids spread over the full range: blocks span many
        # window tiles — exercises the fori tile walk.
        O, P = 8192, 2048
        vals = jnp.asarray(rng.standard_normal((O, 2)).astype(np.float32))
        ids = np.sort(rng.choice(P, 40, replace=False)[
            np.sort(rng.integers(0, 40, O))]).astype(np.int32)
        seg = jnp.asarray(ids)
        out = sorted_segment_sum(vals, seg, P, interpret=True)
        ref = jax.ops.segment_sum(vals, seg, num_segments=P)
        assert float(jnp.abs(out - ref).max()) < 1e-3

    def test_small_target_unsorted_ok(self, rng):
        # n_segments <= window: full-range one-hot, sortedness NOT required
        # (the cam-keyed reductions rely on this).
        O, C = 4096, 128
        vals = jnp.asarray(rng.standard_normal((O, 6)).astype(np.float32))
        seg = jnp.asarray(rng.integers(0, C, O).astype(np.int32))  # unsorted
        out = sorted_segment_sum(vals, seg, C, interpret=True)
        ref = jax.ops.segment_sum(vals, seg, num_segments=C)
        assert float(jnp.abs(out - ref).max()) < 1e-3

    def test_shape_guards(self):
        with pytest.raises(ValueError):
            sorted_segment_sum(jnp.zeros((1000, 3)), jnp.zeros(1000, jnp.int32),
                               2048, interpret=True)


class TestSortedGatherRows:
    def test_matches_indexing(self, rng):
        O, P = 8192, 2048
        table = jnp.asarray(rng.standard_normal((P, 6)).astype(np.float32))
        seg = jnp.asarray(np.sort(rng.integers(0, P, O)).astype(np.int32))
        out = sorted_gather_rows(table, seg, interpret=True)
        # Split-float (bf16 hi + lo) reconstruction: ~2^-18 relative.
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(seg)],
                                   rtol=1e-5, atol=1e-5)

    def test_small_table_unsorted_ok(self, rng):
        O, C = 4096, 128
        table = jnp.asarray(rng.standard_normal((C, 9)).astype(np.float32))
        seg = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
        out = sorted_gather_rows(table, seg, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(table)[np.asarray(seg)],
                                   rtol=1e-5, atol=1e-5)


class TestPallasGate:
    def test_unsorted_keys_never_select_windowed_path(self):
        # ADVICE r1 (medium): cam-keyed reductions feed UNSORTED keys; the
        # windowed multi-tile kernel (n_target > 1024) derives tile ranges
        # from chunk endpoints and silently drops contributions for them.
        # The gate must refuse that combination regardless of divisibility.
        from fastmatch_tpu.ba.schur import _pallas_ok

        assert not _pallas_ok(8192, 2048, sorted_keys=False)
        assert not _pallas_ok(8192, 4096, sorted_keys=False)
        # Sorted keys or small targets remain eligible (backend permitting:
        # on CPU the gate is off anyway, so assert only the refusal above
        # plus gate symmetry on the sorted flag).
        if jax.default_backend() == "tpu":
            assert _pallas_ok(8192, 2048, sorted_keys=True)
            assert _pallas_ok(8192, 1024, sorted_keys=False)
