"""Mirror matching: reliable matches without the Lowe ratio test.

The reference repository (arnfred/Fast-Match) is research code from the
"Mirror Match: Reliable Feature Point Matching Without Geometric
Constraints" line of work (Arnfred & Winkler; SURVEY.md §1.1 — recalled
public knowledge, the reference mount has been empty in every session so
the exact upstream formulation is unverifiable). The published idea this
implements: judge a candidate match by a feature's distinctiveness against
the JOINT descriptor set of both images, not by Lowe's second-neighbor
ratio within the other image alone.

Semantics (``match_pair_mirror``):

- cross nearest neighbor: for each a_i the closest b_j (squared L2), and
  the reverse map nn_ba for the mutuality check;
- the MIRROR test: a_i's own image is mirrored into the gallery as
  distractors — a_i is distinctive iff its joint nearest neighbor over
  ``(A \\ {a_i}) ∪ B`` lies in B, i.e.
  ``d2(a_i, b_j) < tau^2 * self_a[i]`` with
  ``self_a[i] = min_{i' != i} d2(a_i, a_i')``;
- accept the pair (i, j = nn_ab[i]) iff it passes the mirror test and is
  MUTUAL (nn_ba[j] == i).

The mirror test is deliberately ONE-SIDED (query-image distractors only):
it needs no second cross neighbor, so it survives where the ratio test
structurally fails — several true copies of the same feature in image B
(ratio d1/d2 -> 1 kills all of them; mirror keeps the mutual copy).
Gating on B-side self-distance too would reintroduce exactly that failure
(a gallery duplicate zeroes its own self-distance). Repetition in the
QUERY image (a_i itself ambiguous) is rejected, since self_a[i] ~ 0.

TPU mapping: two MXU Gram matmuls (AB cross + AA self-join) + row-min
reductions — all XLA-fused; the self-join reuses
``squared_distance_matrix``. For big banks route the AB leg through the
Pallas matcher and only the self-min leg here. Everything is static-shape
and mask-disciplined (masked rows yield invalid matches; masked columns
+BIG).

Parity oracle: tests/test_mirror.py checks behavior on synthetic
correlated sets with planted repeated structure (the case the ratio test
drops) and cross-validates against brute-force numpy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors, Matches
from fastmatch_tpu.matching.matcher import BIG, squared_distance_matrix


def _masked_self_min(d2: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row min over valid columns excluding the diagonal (self)."""
    n = d2.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2m = jnp.where(mask[None, :] & ~eye, d2, BIG)
    return jnp.min(d2m, axis=1)


@partial(jax.jit, static_argnames=())
def match_pair_mirror(
    desc_a: Descriptors,
    desc_b: Descriptors,
    tau: float | jnp.ndarray = 1.0,
) -> Matches:
    """Mirror matcher: mutual cross-NN gated by joint-set distinctiveness.

    ``tau`` scales the self-distance gate (1.0 = strictly closer to the
    match than to anything in either own image; >1 admits borderline
    repeated structure). Returns the same ``Matches`` container as the
    ratio-test matchers: ``idx[i]`` is a_i's match in B, ``dist`` the
    squared L2, ``valid`` the acceptance mask.
    """
    a = desc_a.data.astype(jnp.float32)
    b = desc_b.data.astype(jnp.float32)
    d_ab = squared_distance_matrix(a, b)                      # (N, M)
    d_ab = jnp.where(desc_b.mask[None, :], d_ab, BIG)
    d_ab = jnp.where(desc_a.mask[:, None], d_ab, BIG)

    # Cross nearest neighbors, both directions (lowest-index tie-break,
    # same convention as matcher.masked_top2).
    nn_ab = jnp.argmin(d_ab, axis=1)                          # (N,)
    d1_ab = jnp.min(d_ab, axis=1)                             # (N,)
    nn_ba = jnp.argmin(d_ab, axis=0)                          # (M,)

    # Query-side self distinctiveness (the mirrored distractor set).
    self_a = _masked_self_min(squared_distance_matrix(a, a), desc_a.mask)

    mutual = nn_ba[nn_ab] == jnp.arange(a.shape[0])
    tau2 = jnp.asarray(tau, jnp.float32) ** 2
    distinct = d1_ab < tau2 * self_a
    ok = desc_a.mask & mutual & distinct & (d1_ab < BIG)
    return Matches(
        idx=nn_ab.astype(jnp.int32),
        dist=jnp.where(ok, d1_ab, BIG),
        valid=ok,
    )
