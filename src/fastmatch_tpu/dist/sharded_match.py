"""Sharded matching (component T17): descriptor-bank parallelism.

Two parallelism modes over the (N, M) distance problem (SURVEY.md §3.2):

- ``match_batch_dp``: independent pairs sharded over the ``data`` axis (pure
  DP) — jit + NamedSharding, XLA partitions with no collectives.
- ``match_pair_sharded``: ONE large bank sharded in rows over the ``bank``
  axis (TP/SP analog). Queries stay stationary per device; bank shards
  rotate around the ring via ``ppermute`` while a running top-2 accumulator
  merges per step — structurally ring attention with "two smallest + index"
  in place of the softmax accumulator (the long-context story: bank size is
  the sequence length; SURVEY.md §6.7). Per-device compute reuses the fused
  Pallas kernel. Merges are (value, index)-lexicographic, so results are
  identical on every device and independent of ring visit order — bit-equal
  to the unsharded matcher (tested on the 8-device CPU mesh).

Cross-check needs no ring: A is replicated, so each device computes the
column-argmin for its home shard exactly, and one tiled all_gather
reassembles nnb.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fastmatch_tpu.core.containers import Descriptors, Matches
from fastmatch_tpu.kernels.distance_topk import distance_topk
from fastmatch_tpu.matching.matcher import BIG, match_pair


def _lex_merge(v1, i1, v2, i2, m1, j1, m2, j2):
    """Merge two sorted (value, index) pairs; global tie-break = lower index
    (order-independent, unlike 'running wins ties')."""

    def lt(va, ia, vb, ib):
        return (va < vb) | ((va == vb) & (ia < ib))

    take = lt(m1, j1, v1, i1)
    nv1 = jnp.where(take, m1, v1)
    ni1 = jnp.where(take, j1, i1)
    # Loser of the first slot competes for the second.
    lv = jnp.where(take, v1, m1)
    li = jnp.where(take, i1, j1)
    ov = jnp.where(take, m2, v2)
    oi = jnp.where(take, j2, i2)
    use_l = lt(lv, li, ov, oi)
    nv2 = jnp.where(use_l, lv, ov)
    ni2 = jnp.where(use_l, li, oi)
    return nv1, ni1, nv2, ni2


def match_pair_sharded(
    desc_a: Descriptors,
    desc_b: Descriptors,
    mesh: Mesh,
    ratio: float = 0.8,
    cross_check: bool = True,
    interpret: bool | None = None,
) -> Matches:
    """Match queries A against a bank B sharded over mesh axis ``bank``.

    desc_a is replicated; desc_b rows are split evenly across the axis (its
    capacity must divide by the axis size).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_shards = mesh.shape["bank"]
    n = desc_a.data.shape[0]
    m = desc_b.data.shape[0]
    if m % n_shards:
        raise ValueError(f"bank capacity {m} must divide by {n_shards} shards")

    a = desc_a.data.astype(jnp.float32)
    b = desc_b.data.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1)
    a2m = jnp.where(desc_a.mask, a2, BIG)
    b2 = jnp.sum(b * b, axis=-1)
    b2m = jnp.where(desc_b.mask, b2, BIG)

    fn = _ring_runner(mesh, n, m, interpret)
    d1, idx1, d2nd, nnb = fn(a, a2m, b, b2m)
    r = jnp.float32(ratio)
    ok = desc_a.mask & (d1 < r * r * d2nd) & (d2nd < BIG)
    if cross_check:
        mutual = nnb[idx1] == jnp.arange(n, dtype=jnp.int32)
        ok = ok & mutual
    return Matches(idx=idx1.astype(jnp.int32), dist=jnp.where(ok, d1, BIG), valid=ok)


import functools


@functools.lru_cache(maxsize=None)
def _ring_runner(mesh: Mesh, n: int, m: int, interpret: bool):
    """shard_map'd ring matcher, cached per (mesh, shapes): rebuilding (and
    re-tracing) the collective graph per call costs host seconds."""
    n_shards = mesh.shape["bank"]
    ms = m // n_shards
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(a, a2m, b_sh, b2m_sh):
        # Local shapes: b_sh (ms, 128), b2m_sh (ms,) — this device's shard.
        my = jax.lax.axis_index("bank")

        v1 = jnp.full((n,), BIG, jnp.float32)
        i1 = jnp.zeros((n,), jnp.int32)
        v2 = jnp.full((n,), BIG, jnp.float32)
        i2 = jnp.zeros((n,), jnp.int32)
        nnb_local = jnp.zeros((ms,), jnp.int32)
        b_cur, b2_cur = b_sh, b2m_sh
        for s in range(n_shards):
            owner = (my - s) % n_shards
            ci1, cd1, cd2, cnnb = distance_topk(a, b_cur, b2_cur, a2m,
                                                interpret=interpret)
            if s == 0:
                # Home-shard pass doubles as the cross-check column argmin
                # (exact: A is replicated, these are this shard's columns).
                nnb_local = cnnb
            g1 = ci1 + owner * ms
            # Second-best index within the shard is not returned by the
            # kernel; it is only needed for merging, where its value cd2
            # dominates — use the shard base as a deterministic stand-in
            # ordered consistently with cd2's shard.
            g2 = jnp.full_like(g1, owner * ms + ms - 1)
            v1, i1, v2, i2 = _lex_merge(v1, i1, v2, i2, cd1, g1, cd2, g2)
            if s != n_shards - 1:
                b_cur = jax.lax.ppermute(b_cur, "bank", perm)
                b2_cur = jax.lax.ppermute(b2_cur, "bank", perm)
        nnb = jax.lax.all_gather(nnb_local, "bank", tiled=True)  # (M,)
        return v1, i1, v2, nnb

    spec_rep = P()
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep, P("bank"), P("bank")),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep),
        check_vma=False,
    )


@functools.lru_cache(maxsize=None)
def _dp_runner(mesh: Mesh, ratio: float, cross_check: bool, backend: str):
    sh = NamedSharding(mesh, P("data"))

    @jax.jit
    def run(da, db):
        da = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sh), da)
        db = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sh), db)
        f = partial(match_pair, ratio=ratio, cross_check=cross_check, backend=backend)
        return jax.vmap(f)(da, db)

    return run


def match_batch_dp(
    desc_a: Descriptors,
    desc_b: Descriptors,
    mesh: Mesh,
    ratio: float = 0.8,
    cross_check: bool = True,
    backend: str = "jnp",
) -> Matches:
    """Data-parallel batched matching: leading batch axis sharded over
    ``data``. Pure jit + sharding constraint; XLA inserts no collectives
    (pairs are independent). The jitted runner is cached per
    (mesh, options) so repeated calls hit the compile cache."""
    return _dp_runner(mesh, ratio, cross_check, backend)(desc_a, desc_b)
