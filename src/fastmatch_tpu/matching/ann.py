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


class IVFIndexSorted(NamedTuple):
    """Cluster-sorted IVF index for real FLOP savings on big banks.

    The bank is reordered so each cluster's rows are contiguous; probing
    then selects whole clusters and ONE budget-sized gather builds a compact
    candidate bank for the exact fused kernel — compute drops by
    budget/bank_size instead of just masking (IVFIndex.match_pair_ann keeps
    exact-kernel-over-masked-bank semantics; this variant is the
    city-scale loop-retrieval path, SURVEY.md §3.2 T7 / config 5).
    """

    centroids: jnp.ndarray  # (K, 128)
    desc: Descriptors       # bank rows sorted by cluster
    perm: jnp.ndarray       # (M,) original bank index of each sorted row
    starts: jnp.ndarray     # (K + 1,) cluster row ranges in the sorted bank
    assign: jnp.ndarray     # (M,) cluster of each *sorted* row


def build_index_sorted(key, desc: Descriptors, n_clusters: int = 64,
                       iters: int = 10) -> IVFIndexSorted:
    """K-means + host-side cluster sort (one-time, index build)."""
    import numpy as np

    cent, assign = kmeans(key, desc.data.astype(jnp.float32), desc.mask,
                          n_clusters, iters)
    assign_np = np.asarray(assign)
    mask_np = np.asarray(desc.mask)
    # Dead rows sort to a virtual cluster K (they stay unmatched: zero desc
    # rows keep mask False after the sort).
    keys = np.where(mask_np, assign_np, n_clusters)
    perm = np.argsort(keys, kind="stable")
    sorted_keys = keys[perm]
    starts = np.searchsorted(sorted_keys, np.arange(n_clusters + 1))
    return IVFIndexSorted(
        centroids=cent,
        desc=Descriptors(desc.data[perm], desc.mask[perm]),
        perm=jnp.asarray(perm.astype(np.int32)),
        starts=jnp.asarray(starts.astype(np.int32)),
        assign=jnp.asarray(sorted_keys.astype(np.int32)),
    )


@partial(jax.jit, static_argnames=("budget", "n_probe", "cross_check", "backend"))
def match_pair_ann_big(
    desc_a: Descriptors,
    index: IVFIndexSorted,
    budget: int = 4096,
    n_probe: int = 8,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "auto",
) -> Matches:
    """IVF search with a compact candidate bank (static ``budget`` rows).

    1. Queries score all centroids (one small matmul); each query probes its
       ``n_probe`` nearest clusters.
    2. Clusters are ranked by how many queries probe them; whole clusters are
       admitted in rank order while they fit the row budget (static shapes:
       admission is a mask-and-prefix-sum, no data-dependent control flow).
    3. One gather builds the (budget, 128) candidate bank; the exact fused
       matcher runs on it; indices map back through the sort permutation.

    Approximation: queries probing non-admitted clusters lose those
    candidates, and the cross-check argmin sees only admitted rows —
    standard IVF semantics. Recall equals the fraction of queries whose
    nearest cluster is admitted, so the shortlist pays off exactly when the
    query set is visually coherent relative to the codebook (a loop-closure
    query frame probing a city-scale bank: n_clusters >> clusters-per-frame).
    For incoherent query sets use the exact matcher — on the MXU, dense
    brute force is the fast path until the bank dwarfs the budget.
    """
    M = index.desc.capacity
    K = index.centroids.shape[0]
    budget = min(budget, M)  # a budget covering the whole bank is exact search
    a = desc_a.data.astype(jnp.float32)
    dq = (
        jnp.sum(a * a, 1, keepdims=True)
        - 2.0 * a @ index.centroids.T
        + jnp.sum(index.centroids * index.centroids, 1)[None, :]
    )
    dq = jnp.where(desc_a.mask[:, None], dq, BIG)
    _, probe = jax.lax.top_k(-dq, n_probe)  # (N, P)
    # Rank-weighted votes: a query's top-1 probe counts much more than its
    # n_probe-th — closer to "probability the true NN lives here".
    rank_w = (1.0 / (1.0 + jnp.arange(n_probe, dtype=jnp.float32)))
    w = (desc_a.mask.astype(jnp.float32)[:, None] * rank_w[None, :]).reshape(-1)
    onehot = jax.nn.one_hot(probe.reshape(-1), K, dtype=jnp.float32)
    votes = jnp.sum(onehot * w[:, None], axis=0)  # (K,)

    sizes = index.starts[1:] - index.starts[:-1]  # (K,)
    order = jnp.argsort(-votes)  # clusters by (weighted) popularity
    sz_ord = sizes[order]
    v_ord = votes[order]

    # Admission in vote order, vectorized: prefix-admit, then two repair
    # passes over the leftovers — each pass first drops clusters larger
    # than the remaining budget (so one oversized cluster can't inflate the
    # cumsum and block everything ranked after it), then prefix-admits the
    # rest. (A per-cluster greedy scan is exact but serializes K VPU steps
    # — measured slower than the whole exact search at K=1024.)
    admit_ord = jnp.zeros_like(v_ord, dtype=bool)
    for _ in range(3):
        left = budget - jnp.sum(jnp.where(admit_ord, sz_ord, 0))
        elig = ~admit_ord & (v_ord > 0) & (sz_ord <= left)
        cum = jnp.cumsum(jnp.where(elig, sz_ord, 0))
        admit_ord = admit_ord | (elig & (cum <= left))
    adm_sz = jnp.where(admit_ord, sz_ord, 0)
    off_ord = (jnp.cumsum(adm_sz) - adm_sz).astype(jnp.int32)
    end_ord = off_ord + adm_sz.astype(jnp.int32)
    n_admitted = end_ord[-1]

    # Compact-bank slot -> sorted-bank row, built from the ADMITTED side:
    # O(budget + K) work per query (an M-length pass or an M-row scatter
    # here would dominate the whole search at city-scale banks).
    slots = jnp.arange(budget, dtype=jnp.int32)
    k_of_slot = jnp.searchsorted(end_ord, slots, side="right")  # first end>s
    k_of_slot = jnp.clip(k_of_slot, 0, K - 1)
    cl_of_slot = order[k_of_slot]
    tbl = index.starts[cl_of_slot] + (slots - off_ord[k_of_slot])
    valid_row = slots < n_admitted
    tbl = jnp.where(valid_row, tbl, 0)
    compact = Descriptors(
        jnp.where(valid_row[:, None], index.desc.data[tbl], 0.0),
        valid_row & index.desc.mask[tbl],
    )
    from fastmatch_tpu.matching.matcher import match_pair

    m = match_pair(desc_a, compact, ratio=ratio, cross_check=cross_check,
                   backend=backend)
    orig = index.perm[tbl]
    return Matches(
        idx=jnp.where(m.valid, orig[jnp.clip(m.idx, 0, budget - 1)], m.idx),
        dist=m.dist,
        valid=m.valid,
    )
