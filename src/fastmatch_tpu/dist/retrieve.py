"""Sharded frame-level retrieval: the VLAD keyframe DB over the mesh.

Config-5 scale puts the keyframe DB on the same ``bank`` axis as the
descriptor banks and map blocks (dist/mesh.py): each device scores the
query VLADs against ITS row shard of the (F, K*D) database — the full
K*D contraction stays local, so per-row scores are bit-identical to the
unsharded matmul — takes a local top-k, and one tiled ``all_gather`` of
(value, global-index) candidates (topk rows per device, not the F-row
score matrix) feeds a final replicated top-k.

Tie-break note: the gathered candidate columns are shard-major and each
shard's candidates are (value desc, index asc), so the final ``top_k``
resolves equal scores toward the lower global frame index — the same
order the unsharded `matching.vlad.retrieve` produces. The 8-device CPU
test asserts bit-equality.

Unlike the ring matcher (sharded_match.py) there is no ppermute here:
retrieval output is O(topk), so a single candidate gather is cheaper
than rotating shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def retrieve_sharded(q: jnp.ndarray, db: jnp.ndarray, db_mask: jnp.ndarray,
                     mesh: Mesh, topk: int = 5, axis: str = "bank"):
    """Score (Q, K*D) queries against an (F, K*D) DB row-sharded over
    ``axis``. Returns (scores (Q, topk), ids (Q, topk)) replicated.

    F must divide by the axis size, and each shard must hold >= topk rows
    (F/n >= topk) so no candidate can be lost to a local cut.
    """
    n = mesh.shape[axis]
    f = db.shape[0]
    if f % n:
        raise ValueError(f"DB rows {f} not divisible by mesh axis {n}")
    if f // n < topk:
        raise ValueError(f"shard rows {f // n} < topk {topk}")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def body(qr, db_sh, mask_sh):
        i = jax.lax.axis_index(axis)
        s = qr @ db_sh.T  # (Q, F/n) — full contraction, exact per row
        s = jnp.where(mask_sh[None, :], s, -jnp.inf)
        v, idx = jax.lax.top_k(s, topk)
        gidx = idx + i * (f // n)
        va = jax.lax.all_gather(v, axis, axis=1, tiled=True)    # (Q, n*topk)
        ia = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        v2, sel = jax.lax.top_k(va, topk)
        return v2, jnp.take_along_axis(ia, sel, axis=1)

    spec_db = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    q = jax.device_put(q, rep)
    db = jax.device_put(db, spec_db)
    db_mask = jax.device_put(db_mask, spec_db)
    return body(q, db, db_mask)
