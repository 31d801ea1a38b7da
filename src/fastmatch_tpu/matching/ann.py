"""Approximate NN pre-filter (component T7): k-means coarse quantizer.

Honors the north star's "approximate nearest-neighbor matching"
(BASELINE.json:5) with an IVF-style two-stage search, shaped for the MXU:

1. **Train**: k-means over bank descriptors (Lloyd iterations under
   ``lax.scan`` — one (M, 128) x (128, K) matmul per iteration).
2. **Query**: queries score all K centroids (cheap matmul), keep the top-P
   probe clusters, and run the *exact* fused kernel against only the
   descriptors whose cluster assignment falls in the probe set — implemented
   by masking, not gathering: the candidate mask folds into ``b2m`` exactly
   like dead padding, so the same Pallas kernel and tie-break semantics
   apply and recall failures can only come from probing, never from the
   inner search.

This is also the engine's EP analog: descriptors route to clusters as
tokens route to experts (SURVEY.md §3.2); on a sharded bank each device
quantizes its own shard, so probing composes with the ring matcher.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors, Matches
from fastmatch_tpu.matching.matcher import BIG, match_pair_jnp


class IVFIndex(NamedTuple):
    centroids: jnp.ndarray   # (K, 128)
    assign: jnp.ndarray      # (M,) int32 cluster of each bank row
    desc: Descriptors        # the bank itself


@partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans(key, data: jnp.ndarray, mask: jnp.ndarray, n_clusters: int, iters: int = 10):
    """Masked Lloyd's k-means; returns (centroids (K, D), assign (M,))."""
    m, d = data.shape
    # Init: random valid rows (Gumbel top-k over the mask).
    g = jax.random.gumbel(key, (m,))
    g = jnp.where(mask, g, -jnp.inf)
    _, init_idx = jax.lax.top_k(g, n_clusters)
    cent0 = data[init_idx]

    def step(cent, _):
        d2 = (
            jnp.sum(data * data, 1, keepdims=True)
            - 2.0 * data @ cent.T
            + jnp.sum(cent * cent, 1)[None, :]
        )
        d2 = jnp.where(mask[:, None], d2, BIG)
        assign = jnp.argmin(d2, axis=1)
        w = mask.astype(jnp.float32)
        sums = jax.ops.segment_sum(data * w[:, None], assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(w, assign, num_segments=n_clusters)
        new_cent = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid.
        new_cent = jnp.where((counts > 0)[:, None], new_cent, cent)
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    d2 = (
        jnp.sum(data * data, 1, keepdims=True)
        - 2.0 * data @ cent.T
        + jnp.sum(cent * cent, 1)[None, :]
    )
    d2 = jnp.where(mask[:, None], d2, BIG)
    return cent, jnp.argmin(d2, axis=1).astype(jnp.int32)


def build_index(key, desc: Descriptors, n_clusters: int = 64, iters: int = 10) -> IVFIndex:
    cent, assign = kmeans(key, desc.data.astype(jnp.float32), desc.mask,
                          n_clusters, iters)
    return IVFIndex(centroids=cent, assign=assign, desc=desc)


@partial(jax.jit, static_argnames=("n_probe", "cross_check"))
def match_pair_ann(
    desc_a: Descriptors,
    index: IVFIndex,
    n_probe: int = 8,
    ratio: float = 0.8,
    cross_check: bool = True,
) -> Matches:
    """Approximate matcher: probe the top ``n_probe`` clusters per query.

    The probe set is the union over queries (capacity-style, mask-based):
    a cluster is live if ANY query probes it — batch-friendly (one shared
    candidate mask keeps the inner search a single dense kernel call) and
    strictly increases recall vs per-query probing.
    """
    a = desc_a.data.astype(jnp.float32)
    cent = index.centroids
    # Query -> centroid distances.
    dq = (
        jnp.sum(a * a, 1, keepdims=True)
        - 2.0 * a @ cent.T
        + jnp.sum(cent * cent, 1)[None, :]
    )  # (N, K)
    _, probe = jax.lax.top_k(-dq, n_probe)  # (N, P)
    probed = jnp.zeros(cent.shape[0], bool).at[probe.reshape(-1)].set(True)
    # Probed clusters only, via masking (same kernel semantics as padding).
    cand_mask = index.desc.mask & probed[index.assign]
    return match_pair_jnp(
        desc_a, Descriptors(index.desc.data, cand_mask),
        ratio=ratio, cross_check=cross_check,
    )
