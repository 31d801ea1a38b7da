"""Mirror matcher (matching/mirror.py): joint-distinctiveness mutual
matching — brute-force numpy oracle, repeated-structure behavior (the case
Lowe's ratio test structurally drops), and masking discipline."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.matching.matcher import match_pair_jnp
from fastmatch_tpu.matching.mirror import match_pair_mirror


def _unit(rng, n):
    d = np.abs(rng.standard_normal((n, 128))).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def _mirror_oracle(a, b, mask_a, mask_b, tau=1.0):
    """Brute-force numpy restatement of the mirror criterion."""
    d_ab = ((a[:, None] - b[None]) ** 2).sum(-1)
    d_ab[~mask_a] = np.inf
    d_ab[:, ~mask_b] = np.inf
    d_aa = ((a[:, None] - a[None]) ** 2).sum(-1)
    np.fill_diagonal(d_aa, np.inf)
    d_aa[:, ~mask_a] = np.inf
    nn_ab = d_ab.argmin(1)
    nn_ba = d_ab.argmin(0)
    out = {}
    for i in range(len(a)):
        if not mask_a[i]:
            continue
        j = nn_ab[i]
        if nn_ba[j] != i or not np.isfinite(d_ab[i, j]):
            continue
        if d_ab[i, j] < tau * tau * d_aa[i].min():
            out[i] = j
    return out


class TestMirrorMatch:
    def test_matches_bruteforce_oracle(self):
        rng = np.random.default_rng(0)
        n, m = 96, 80
        a = _unit(rng, n)
        base = a[rng.permutation(n)[:m]]
        b = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        mask_a = np.ones(n, bool)
        mask_b = np.ones(m, bool)
        mask_a[-7:] = False
        mask_b[-5:] = False
        mm = match_pair_mirror(
            Descriptors(jnp.asarray(a), jnp.asarray(mask_a)),
            Descriptors(jnp.asarray(b), jnp.asarray(mask_b)))
        got = {i: int(mm.idx[i]) for i in range(n) if bool(mm.valid[i])}
        want = _mirror_oracle(a, b, mask_a, mask_b)
        assert got == want
        assert len(got) > 20  # the correlated subset actually matches

    def test_keeps_repeated_structure_ratio_drops(self):
        """Plant one feature with TWO near-identical true copies in B:
        the ratio test sees d1/d2 ~ 1 and kills it; the mirror criterion
        keeps the mutual copy because image A holds no second copy."""
        rng = np.random.default_rng(1)
        n = 64
        a = _unit(rng, n)
        b = a + 0.02 * rng.standard_normal((n, 128)).astype(np.float32)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        # b[n-1] becomes a near-duplicate of b[0] (both copies of a[0]).
        b[-1] = b[0] + 1e-4 * rng.standard_normal(128).astype(np.float32)
        b[-1] /= np.linalg.norm(b[-1])
        da = Descriptors(jnp.asarray(a), jnp.ones(n, bool))
        db = Descriptors(jnp.asarray(b), jnp.ones(n, bool))

        ratio = match_pair_jnp(da, db)
        mirror = match_pair_mirror(da, db)
        assert not bool(ratio.valid[0]), "ratio test should drop the dup"
        assert bool(mirror.valid[0]), "mirror must keep the mutual copy"
        assert int(mirror.idx[0]) in (0, n - 1)  # either true copy
        # Tightening tau suppresses chance acceptances on pure noise (for
        # uncorrelated data cross-min and self-min are draws from the same
        # distribution, so tau << 1 is the knob; correlated data sits at
        # d2 ~ noise^2 << self-distance and survives).
        noise = _unit(rng, 16)
        dn = Descriptors(jnp.asarray(noise), jnp.ones(16, bool))
        far = match_pair_mirror(dn, db, tau=0.7)
        near = match_pair_mirror(da, db, tau=0.7)
        assert int(far.valid.sum()) <= 2
        assert int(near.valid.sum()) >= 48

    def test_self_repeated_structure_is_rejected(self):
        """If the SAME feature also repeats inside image A, neither copy is
        distinctive (joint self-min ~ 0) and mirror rejects both — the
        documented reliability behavior."""
        rng = np.random.default_rng(2)
        n = 48
        a = _unit(rng, n)
        a[1] = a[0] + 1e-3 * rng.standard_normal(128).astype(np.float32)
        a[1] /= np.linalg.norm(a[1])
        b = a + 0.02 * rng.standard_normal((n, 128)).astype(np.float32)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        mm = match_pair_mirror(
            Descriptors(jnp.asarray(a), jnp.ones(n, bool)),
            Descriptors(jnp.asarray(b), jnp.ones(n, bool)))
        assert not bool(mm.valid[0]) and not bool(mm.valid[1])
        # Loosening tau re-admits them (both copies are mutual).
        loose = match_pair_mirror(
            Descriptors(jnp.asarray(a), jnp.ones(n, bool)),
            Descriptors(jnp.asarray(b), jnp.ones(n, bool)), tau=100.0)
        assert int(loose.valid.sum()) > int(mm.valid.sum())

    def test_all_masked(self):
        rng = np.random.default_rng(3)
        a = _unit(rng, 8)
        mm = match_pair_mirror(
            Descriptors(jnp.asarray(a), jnp.zeros(8, bool)),
            Descriptors(jnp.asarray(a), jnp.ones(8, bool)))
        assert int(mm.valid.sum()) == 0
