"""Hamming-distance matching for packed binary descriptors (ORB/rBRIEF).

TPU-first design: a systolic array has no popcount, but it does not need
one. A packed n-bit descriptor unpacks to a {-1, +1}^n vector ``s`` with

    ``|s_a - s_b|^2 = 4 * hamming(a, b)``        (each differing bit adds 4)

so the squared-L2 machinery the whole engine is built on — the fused
Pallas distance/top-2/cross-check kernels of kernels/distance_topk.py and
kernels/batch_match.py — applies verbatim, with the MXU computing the
256-wide dot products. Two properties make this exact, not approximate:

- bit values (+-1) and every partial dot product (integers in [-256, 256])
  are exactly representable in bf16, and the MXU accumulates in f32 — the
  ``fast`` bf16 kernel path is therefore *bit-exact* for binary
  descriptors (unlike for SIFT floats, where it is a >=99%-agreement
  approximation);
- distances are exact multiples of 4.0 in f32, so the lowest-index
  tie-break order of the L2 kernels equals the popcount matcher's.

``hamming_distance_matrix`` (lax.population_count) is the semantic anchor
the MXU path is parity-tested against; it is also the faster choice on
CPU. The Lowe ratio here follows the *linear-distance* convention used
for binary matching (``h1 < ratio * h2``); since the L2 backend compares
``d1 < r^2 * d2`` on d = 4h, the wrapper passes ``sqrt(ratio)`` through.

Capability spec: the reference line of work is fast approximate feature
matching (SURVEY.md §1.1); binary descriptors + Hamming matching are that
genre's canonical fast path, provided here as a second descriptor family
(features/orb.py) beyond SIFT. No counterpart file:line exists — the
reference mount is empty (SURVEY.md §0); spec is BASELINE.json:5's
"approximate nearest-neighbor matching" clause.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastmatch_tpu.core.containers import (BinaryDescriptors, Descriptors,
                                           Matches, unpack_bits_signed)
from fastmatch_tpu.matching.matcher import BIG, match_pair_jnp


def hamming_distance_matrix(a_packed: jnp.ndarray, b_packed: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distances between packed rows, via popcount(xor).

    a_packed: (N, W) uint32, b_packed: (M, W) uint32 -> (N, M) int32.
    O(N*M*W) scalar ops on the VPU — the anchor/CPU path; the product TPU
    path goes through the MXU (see module docstring).
    """
    x = jax.lax.population_count(a_packed[:, None, :] ^ b_packed[None, :, :])
    return jnp.sum(x.astype(jnp.int32), axis=-1)


@partial(jax.jit, static_argnames=("cross_check",))
def match_pair_hamming_jnp(
    desc_a: BinaryDescriptors,
    desc_b: BinaryDescriptors,
    ratio: float | jnp.ndarray = 0.8,
    cross_check: bool = True,
) -> Matches:
    """Popcount reference matcher (the Hamming semantic anchor).

    Top-2 + linear-ratio + mutual cross-check with the same masking and
    lowest-index tie-break discipline as matcher.match_pair_jnp. Distances
    in the returned Matches are Hamming counts (float32).
    """
    h = hamming_distance_matrix(desc_a.packed, desc_b.packed).astype(jnp.float32)
    hm = jnp.where(desc_b.mask[None, :], h, BIG)
    neg, idx = jax.lax.top_k(-hm, 2)  # stable: ties -> lower index
    idx1 = idx[..., 0]
    d1, d2nd = -neg[..., 0], -neg[..., 1]
    r = jnp.asarray(ratio, jnp.float32)
    ok = desc_a.mask & (d1 < r * d2nd) & (d2nd < BIG)
    if cross_check:
        hcol = jnp.where(desc_a.mask[:, None], h, BIG)
        nn_b = jnp.argmin(hcol, axis=0)
        mutual = nn_b[idx1] == jnp.arange(h.shape[0])
        ok = ok & mutual
    return Matches(idx=idx1.astype(jnp.int32), dist=jnp.where(ok, d1, BIG), valid=ok)


def _as_signed(desc: BinaryDescriptors) -> Descriptors:
    return Descriptors(data=unpack_bits_signed(desc.packed, desc.mask),
                       mask=desc.mask)


def _ratio_sqrt(ratio: float) -> float:
    """f32 r with fl32(r * r) == fl32(ratio), if one exists near sqrt(ratio).

    The L2 backends square their ratio argument in f32; Hamming distances are
    integers, so exact boundary cases (h1/h2 == ratio, e.g. 4/5 at the 0.8
    default) are COMMON, and a threshold off by 1 ulp flips them vs the
    popcount anchor. Scaling by the exact power of two (d = 4h) preserves the
    comparison, so a bitwise-equal threshold makes the MXU path decision-
    identical to the anchor everywhere.
    """
    c32 = np.float32(ratio)
    r = np.float32(np.sqrt(float(c32)))
    for cand in (r, np.nextafter(r, np.float32(0.0)),
                 np.nextafter(r, np.float32(2.0))):
        if np.float32(cand * cand) == c32:
            return float(cand)
    return float(r)  # no exact representative: ~1 ulp threshold skew


def match_pair_hamming(
    desc_a: BinaryDescriptors,
    desc_b: BinaryDescriptors,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "auto",
) -> Matches:
    """Match packed binary descriptors; returns Hamming-count distances.

    backend: "popcount" (VPU anchor), "mxu" (unpack to +-1 and route through
    the fused L2 kernels — exact, see module docstring), or "auto"
    (mxu on TPU, popcount elsewhere). ``ratio`` is the linear Hamming ratio
    (h1 < ratio * h2).
    """
    if backend == "auto":
        backend = "mxu" if jax.default_backend() not in ("cpu",) else "popcount"
    if backend == "popcount":
        return match_pair_hamming_jnp(desc_a, desc_b, ratio=ratio,
                                      cross_check=cross_check)
    if backend == "mxu":
        from fastmatch_tpu.kernels.distance_topk import match_pair_pallas

        m = match_pair_pallas(_as_signed(desc_a), _as_signed(desc_b),
                              ratio=_ratio_sqrt(ratio), cross_check=cross_check,
                              precision="fast")
        return m._replace(dist=jnp.where(m.valid, m.dist * 0.25, BIG))
    if backend == "mxu_jnp":  # XLA (non-Pallas) variant, for CPU parity tests
        m = match_pair_jnp(_as_signed(desc_a), _as_signed(desc_b),
                           ratio=_ratio_sqrt(ratio), cross_check=cross_check)
        return m._replace(dist=jnp.where(m.valid, m.dist * 0.25, BIG))
    raise ValueError(f"unknown backend {backend!r}")


@partial(jax.jit, static_argnames=("ratio", "cross_check", "backend"))
def match_batch_hamming(
    desc_a: BinaryDescriptors,
    desc_b: BinaryDescriptors,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "popcount",
) -> Matches:
    """Batched binary matcher: containers carry a leading (B, C, ...) axis.

    backend="mxu" routes through the fully-fused batched kernel
    (kernels/batch_match.py) with bf16 MXU feeds — exact for binary
    descriptors; "popcount" vmaps the anchor.
    """
    if backend == "mxu":
        from fastmatch_tpu.kernels.batch_match import (MAX_RESIDENT_M,
                                                       match_batch_fused)

        if desc_b.packed.shape[-2] <= MAX_RESIDENT_M:
            # Round-4 fast path: feed the kernel PACKED words — it unpacks
            # to +-1 bf16 in VMEM (exact) with the constant-norm shortcut
            # (every live row has |s|^2 == n_bits). The XLA-side unpack +
            # norm prologue this replaces measured ~35% of the whole
            # batched binary match on v5e (docs/PERFORMANCE.md).
            nb = desc_a.n_bits
            m = match_batch_fused(
                Descriptors(data=desc_a.packed, mask=desc_a.mask),
                Descriptors(data=desc_b.packed, mask=desc_b.mask),
                ratio=_ratio_sqrt(ratio), cross_check=cross_check,
                fast=True, interpret=jax.default_backend() == "cpu",
                const_sq_norm=float(nb), binary=True)
        else:
            from fastmatch_tpu.matching.matcher import match_pair as _mp
            a, b = _as_signed(desc_a), _as_signed(desc_b)
            m = jax.vmap(partial(_mp, ratio=_ratio_sqrt(ratio),
                                 cross_check=cross_check, backend="pallas",
                                 precision="fast"))(a, b)
        return m._replace(dist=jnp.where(m.valid, m.dist * 0.25, BIG))
    fn = partial(match_pair_hamming_jnp, ratio=ratio, cross_check=cross_check)
    return jax.vmap(fn)(desc_a, desc_b)
