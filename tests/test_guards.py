"""Guard-mode tests (SURVEY.md §6.2): checkify sweeps over the gather-heavy
paths (matcher, BA assembly) with adversarial masks, and the failure case —
a deliberately out-of-bounds gather must raise, not clamp silently."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.core.lie import SE3
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.ba.schur import assemble
from fastmatch_tpu.matching.matcher import match_pair_jnp
from fastmatch_tpu.utils.guards import checked, debug_nans, maybe_checked


def _descs(rng, n, cap, n_valid=None):
    d = np.abs(rng.standard_normal((cap, 128))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    mask = np.zeros(cap, bool)
    mask[: (n_valid if n_valid is not None else n)] = True
    d[~mask] = 0.0
    return Descriptors(jnp.asarray(d), jnp.asarray(mask))


class TestCheckify:
    def test_matcher_clean_under_checkify(self, rng):
        """The matcher with adversarial masks (nearly-all-dead bank) passes
        index+float checks: no OOB gathers, no nan/inf materialized."""
        da = _descs(rng, 64, 128)
        db = _descs(rng, 64, 128, n_valid=2)
        fn = checked(lambda a, b: match_pair_jnp(a, b))
        m = fn(da, db)
        assert bool(jnp.all(m.idx[m.valid] < 2))

    def test_ba_assembly_clean_under_checkify(self, rng):
        n_cams, n_pts, n_obs = 3, 16, 64
        pts = rng.uniform(-1, 1, (n_pts, 3)).astype(np.float32)
        R = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
        t = np.zeros((n_cams, 3), np.float32)
        t[:, 2] = 4.0
        ci = rng.integers(0, n_cams, n_obs).astype(np.int32)
        pi = rng.integers(0, n_pts, n_obs).astype(np.int32)
        p = np.einsum("oij,oj->oi", R[ci], pts[pi]) + t[ci]
        uv = (p[:, :2] / p[:, 2:3]).astype(np.float32)
        mask = rng.random(n_obs) > 0.3  # adversarial: dead observations mixed in
        obs = Observations(jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
                           jnp.asarray(mask))
        poses = SE3(jnp.asarray(R), jnp.asarray(t))
        fn = checked(
            lambda po, pt, ob: assemble(po, pt, ob, n_cams, n_pts)[1]
        )
        cost = fn(poses, jnp.asarray(pts), obs)
        assert np.isfinite(float(cost))

    def test_oob_gather_raises(self):
        def bad(x, i):
            return x[i]

        fn = checked(bad)
        x = jnp.arange(4.0)
        with pytest.raises(Exception, match="out-of-bounds|index"):
            fn(x, jnp.int32(7))

    def test_maybe_checked_flag(self, monkeypatch):
        calls = {}

        def f(x):
            calls["ran"] = True
            return x + 1

        monkeypatch.setenv("FASTMATCH_CHECKIFY", "0")
        assert maybe_checked(f) is f
        monkeypatch.setenv("FASTMATCH_CHECKIFY", "1")
        g = maybe_checked(f)
        assert g is not f
        assert float(g(jnp.float32(1.0))) == 2.0


class TestDebugNans:
    def test_scoped_nan_detection(self):
        with pytest.raises(Exception):
            with debug_nans():
                jnp.log(jnp.float32(-1.0)).block_until_ready()
        # config restored
        assert jax.config.jax_debug_nans is False
