"""Frame-level place recognition: VLAD descriptors on the MXU.

The engine's retrieval layers so far operate at DESCRIPTOR granularity —
the fused matcher / IVF shortlist scores every landmark row (city_bench:
12 ms per query over a 4M-row bank). Loop-closure and kidnapped-robot
relocalization only need FRAME granularity first: "which keyframes look
like this view?" is a (1, K*D) x (K*D, F) matmul if every frame is
compressed to one vector. This module provides that compression —
VLAD (vector of locally aggregated descriptors) over the engine's own
SIFT/ORB descriptors — so retrieval cost scales with the number of
keyframes, not the number of landmarks (~2000x fewer rows).

TPU-first shape of the encoder (no scatters, no data-dependent shapes):

* assignment: one (M, D) x (D, K) matmul + row argmin -> one-hot (M, K)
* aggregation: V = one_hot^T @ desc - counts[:, None] * vocab — two
  matmuls replace the classic per-cluster residual scatter
* normalization: intra-norm (per-word L2, kills burstiness), signed
  square root (SSR), global L2 — all elementwise VPU work fused by XLA

The vocabulary is the masked Lloyd k-means already used by the IVF index
(matching/ann.kmeans), so a map can share one codebook between its
IVF landmark index and its keyframe retrieval DB.

Reference scope note: arnfred/Fast-Match is pair matching research with
no place-recognition layer (SURVEY.md §3.1); this is a north-star
extension component (loop-closure detect, SURVEY.md §3.2 T21) built
TPU-native. Product wiring lives in pipeline/retrieval.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.matching.ann import kmeans


class Vocabulary(NamedTuple):
    """Visual vocabulary: k-means centroids over descriptor space."""

    words: jnp.ndarray  # (K, D) f32


def train_vocabulary(key, desc: jnp.ndarray, mask: jnp.ndarray,
                     n_words: int = 64, iters: int = 12) -> Vocabulary:
    """Train a K-word vocabulary over a masked (M, D) descriptor sample."""
    cent, _ = kmeans(key, jnp.asarray(desc, jnp.float32),
                     jnp.asarray(mask, bool), n_clusters=n_words, iters=iters)
    return Vocabulary(words=cent)


@jax.jit
def vlad_encode(desc: jnp.ndarray, mask: jnp.ndarray,
                vocab: Vocabulary) -> jnp.ndarray:
    """Encode one frame's (M, D) masked descriptor set -> (K*D,) VLAD.

    Hard assignment to the nearest word, residual aggregation per word,
    intra-normalization, SSR, global L2. All-masked input returns zeros
    (a zero vector scores 0 against everything — a safe "no place").
    """
    x = jnp.asarray(desc, jnp.float32)
    m = jnp.asarray(mask, bool)
    c = vocab.words  # (K, D)
    d2 = (jnp.sum(x * x, 1, keepdims=True) - 2.0 * x @ c.T
          + jnp.sum(c * c, 1)[None, :])  # (M, K)
    assign = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(assign, c.shape[0], dtype=jnp.float32)
    onehot = onehot * m[:, None].astype(jnp.float32)  # (M, K)
    # V[k] = sum_{assigned i} (x_i - c_k) = onehot^T x - counts_k c_k
    counts = jnp.sum(onehot, axis=0)  # (K,)
    V = onehot.T @ x - counts[:, None] * c  # (K, D)
    # Intra-normalization: each word's residual to unit length.
    V = V / jnp.maximum(jnp.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    v = V.reshape(-1)
    # Signed square root (power-law normalization).
    v = jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    n = jnp.linalg.norm(v)
    return jnp.where(n > 1e-12, v / jnp.maximum(n, 1e-12), jnp.zeros_like(v))


vlad_encode_batch = jax.jit(jax.vmap(vlad_encode, in_axes=(0, 0, None)))
"""(F, M, D), (F, M), Vocabulary -> (F, K*D): one compile per bucket."""


@partial(jax.jit, static_argnames=("topk",))
def retrieve(q: jnp.ndarray, db: jnp.ndarray, db_mask: jnp.ndarray,
             topk: int = 5):
    """Score (Q, K*D) query VLADs against an (F, K*D) database.

    Cosine similarity == dot product (both sides unit-norm); one matmul
    feeds the MXU, then ``top_k`` per query row. Dead database rows score
    -inf so they never retrieve. Returns (scores (Q, topk), ids (Q, topk)).
    """
    s = q @ db.T  # (Q, F)
    s = jnp.where(db_mask[None, :], s, -jnp.inf)
    return jax.lax.top_k(s, topk)
