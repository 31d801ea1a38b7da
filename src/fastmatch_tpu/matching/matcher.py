"""Descriptor matching: distance matrix, top-2, Lowe ratio, cross-check.

This module holds the *semantic definition* of matching for the whole engine:

- ``match_pair_jnp`` is the pure-``jax.numpy`` reference implementation
  (component T5, SURVEY.md §3.2). It is the parity anchor: the fused Pallas
  kernel (kernels/distance_topk.py) and every sharded variant (dist/) must
  reproduce its output exactly (same indices, distances to float tolerance).
- ``match_pair`` dispatches between backends ("jnp" | "pallas").
- ``match_batch`` is the vmapped multi-pair entry point (component T6,
  BASELINE.json config 2: 64 pairs, 1 chip).

Conventions (the masking discipline, see core/containers.py):
- distances are *squared* L2; the Lowe ratio test compares
  ``d1 < ratio^2 * d2`` which is equivalent to the classical
  ``sqrt(d1) < ratio * sqrt(d2)``;
- masked B columns contribute +inf distance so they can never win top-2;
- masked A rows yield ``valid=False`` matches;
- ties break toward the lower index (fixed reduction order — required for the
  >=99% agreement gate, SURVEY.md §8.2 "determinism").

Capability spec: BASELINE.json:5 (north star: "128-d descriptor L2/dot-product
distance matrix, ratio-test argmin/top-2, and mutual cross-check").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastmatch_tpu.core.containers import Descriptors, Matches

# Large-but-finite stand-in for +inf: keeps arithmetic NaN-free on the VPU
# (inf - inf in a fused kernel would poison the ratio test). A Python float
# (not a jnp scalar) so Pallas kernels can close over it as a compile-time
# constant. Exactly representable in f32.
BIG = float(np.float32(3.0e38))


def squared_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs squared L2 distance via the Gram trick.

    ``d2[i, j] = |a_i|^2 + |b_j|^2 - 2 a_i . b_j`` — one (N, 128) x (128, M)
    matmul, which XLA maps onto the MXU. Clamped at zero (the expansion can go
    slightly negative in float32).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T  # (1, M)
    # Full f32 accumulation: on TPU the default matmul precision is bf16,
    # which flips near-tie ratio tests and breaks the jnp<->pallas parity
    # gate. The Pallas fast path matches this choice.
    cross = jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)  # MXU
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


def masked_top2(d2: jnp.ndarray, mask_b: jnp.ndarray):
    """Per-row two smallest distances over valid B columns.

    Returns (idx1, d1, idx2, dsecond); ties break toward the lower B index.
    Rows see +BIG where mask_b is False; if fewer than 2 valid columns exist,
    the corresponding distances are ~BIG and downstream ratio tests fail
    (matching cv2.knnMatch semantics of "no second neighbor => no match").
    """
    d2m = jnp.where(mask_b[None, :], d2, BIG)
    neg, idx = jax.lax.top_k(-d2m, 2)  # top_k is stable: ties -> lower index
    d_sorted = -neg
    return idx[..., 0], d_sorted[..., 0], idx[..., 1], d_sorted[..., 1]


@partial(jax.jit, static_argnames=("cross_check",))
def match_pair_jnp(
    desc_a: Descriptors,
    desc_b: Descriptors,
    ratio: float | jnp.ndarray = 0.8,
    cross_check: bool = True,
) -> Matches:
    """Reference matcher: full distance matrix + top-2 + ratio (+ cross-check).

    This is component T5 — the semantic ground truth for the Pallas fast path.
    The op sequence deliberately mirrors the fused kernel bit-for-bit so both
    backends make identical decisions: rows are *ordered* by
    ``|b|^2(masked) - 2 a.b`` (the row-constant |a|^2 cannot change the
    ordering and is added only when materializing distances), and the
    column argmin for cross-check is ordered by ``|a|^2(masked) - 2 a.b``.
    """
    a = desc_a.data.astype(jnp.float32)
    b = desc_b.data.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    a2m = jnp.where(desc_a.mask, a2, BIG)
    b2m = jnp.where(desc_b.mask, b2, BIG)
    neg2 = -2.0 * jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)  # MXU
    srow = neg2 + b2m[None, :]
    neg, idx = jax.lax.top_k(-srow, 2)  # two smallest; ties -> lower index
    idx1 = idx[..., 0]
    d1 = jnp.maximum(-neg[..., 0] + a2, 0.0)
    d2nd = jnp.maximum(-neg[..., 1] + a2, 0.0)
    ratio = jnp.asarray(ratio, jnp.float32)
    # A *real* second neighbor is required (d2nd < BIG): with <2 valid B
    # entries there is no ratio to test — no match (cv2.knnMatch semantics).
    ok = desc_a.mask & (d1 < ratio * ratio * d2nd) & (d2nd < BIG)
    if cross_check:
        scol = neg2 + a2m[:, None]
        nn_b = jnp.argmin(scol, axis=0)  # (M,), ties -> lower row index
        mutual = nn_b[idx1] == jnp.arange(a.shape[0])
        ok = ok & mutual
    return Matches(idx=idx1.astype(jnp.int32), dist=jnp.where(ok, d1, BIG), valid=ok)


def match_pair(
    desc_a: Descriptors,
    desc_b: Descriptors,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "auto",
    precision: str = "exact",
) -> Matches:
    """Match one descriptor set against another.

    backend: "jnp" (XLA-fused reference), "pallas" (fused TPU kernel), or
    "auto" (pallas on TPU, jnp elsewhere).
    precision (pallas backend only): "exact" is bit-identical to the jnp
    anchor; "fast" feeds the MXU in bf16 — 1.8x faster, >=99.8% decision
    agreement (meets the >=99% gate; tested).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    if backend == "jnp":
        fn = partial(match_pair_jnp, ratio=ratio, cross_check=cross_check)
        if not isinstance(desc_a.data, jax.core.Tracer):
            from fastmatch_tpu.utils.guards import maybe_checked

            # FASTMATCH_CHECKIFY=1 sweeps the gather-heavy matcher with
            # index/float checks (SURVEY.md §6.2); free when unset. Skipped
            # under tracing (vmap/jit callers): check_error raises on host.
            fn = maybe_checked(fn)
        return fn(desc_a, desc_b)
    if backend == "pallas":
        from fastmatch_tpu.kernels.distance_topk import match_pair_pallas

        return match_pair_pallas(desc_a, desc_b, ratio=ratio,
                                 cross_check=cross_check, precision=precision)
    raise ValueError(f"unknown backend {backend!r}")


@partial(jax.jit, static_argnames=("cross_check", "backend", "precision"))
def match_batch(
    desc_a: Descriptors,
    desc_b: Descriptors,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "jnp",
    precision: str = "exact",
) -> Matches:
    """Batched matcher (T6): containers carry a leading batch axis (B, C, ...).

    BASELINE.json config 2: 64 pairs on one chip. Independent pairs are the
    data-parallel unit — sharding the batch axis across chips is handled in
    dist/ (T16).

    The pallas backend routes VMEM-resident banks to the fully-fused
    batched kernel (kernels/batch_match.py: one grid step per pair, ratio +
    cross-check in-kernel — measured 1.5-2x over vmapping the per-pair
    kernel, which pays per-row-tile grid-step launch overhead plus an HBM
    gather for the mutual check). Larger banks fall back to the vmapped
    per-pair chunked path.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    if backend == "pallas":
        from fastmatch_tpu.kernels.batch_match import (
            MAX_RESIDENT_M, match_batch_fused)

        if desc_b.data.shape[-2] <= MAX_RESIDENT_M:
            return match_batch_fused(
                desc_a, desc_b, ratio=ratio, cross_check=cross_check,
                fast=precision == "fast",
                interpret=jax.default_backend() == "cpu")
    fn = partial(match_pair, ratio=ratio, cross_check=cross_check,
                 backend=backend, precision=precision)
    return jax.vmap(fn)(desc_a, desc_b)
