"""Pallas patch-gather kernel parity (interpret mode; on-chip covered by
the SIFT pipeline once wired in)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.kernels.patch_gather import gather_patches


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _ref(stack, lyx, P):
    L, H, W = stack.shape
    out = []
    for l, y, x in lyx:
        l = np.clip(l, 0, L - 1)
        y = np.clip(y, 0, H - P)
        x = np.clip(x, 0, W - P)
        out.append(stack[l, y:y + P, x:x + P])
    return np.stack(out)


class TestGatherPatches:
    def test_matches_dynamic_slice(self, rng):
        stack = rng.random((6, 500, 660)).astype(np.float32)
        K, P = 256, 19
        lyx = np.column_stack([
            rng.integers(0, 6, K),
            rng.integers(0, 500 - P, K),
            rng.integers(0, 660 - P, K),
        ]).astype(np.int32)
        out = gather_patches(jnp.asarray(stack), jnp.asarray(lyx), P,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(out), _ref(stack, lyx, P))

    def test_borders_and_clamping(self, rng):
        stack = rng.random((3, 123, 251)).astype(np.float32)  # odd sizes
        P = 24
        lyx = np.array([
            [0, 0, 0], [2, 99, 227], [1, 98, 226], [0, 7, 1],
            [1, 8, 128], [2, 95, 120], [5, 500, 500], [0, -3, -3],
        ] * 16, np.int32)  # includes out-of-range rows -> clamped
        out = gather_patches(jnp.asarray(stack), jnp.asarray(lyx), P,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(out), _ref(stack, lyx, P))

    def test_bad_k_raises(self, rng):
        stack = jnp.zeros((2, 64, 128))
        with pytest.raises(ValueError):
            gather_patches(stack, jnp.zeros((100, 3), jnp.int32), 8,
                           interpret=True)
