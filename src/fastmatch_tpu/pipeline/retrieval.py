"""Keyframe retrieval DB + hierarchical localization (place recognition).

Product wiring for matching/vlad.py: compress every keyframe of a built
map into one VLAD vector, retrieve candidate keyframes for a query view
with a single matmul, then match ONLY the landmarks those keyframes
observe. This is the standard hierarchical-localization layout
(retrieve -> local match -> PnP) built on the engine's own pieces:

* frame descriptor sets come straight from the map's observation table
  (``obs_cam``/``obs_pt`` -> ``pt_desc`` rows) — no extra storage beyond
  what `pipeline/reconstruct.Reconstruction` already carries, so a DB can
  be built from any saved checkpoint;
* the vocabulary is shared-trainable with the IVF landmark index
  (same masked Lloyd k-means);
* the local match reuses `matching.matcher.match_pair` on a
  bucket-padded candidate bank (power-of-two buckets -> one compile per
  bucket, same discipline as `pipeline/serve._bucket`);
* the pose solve is the same `ransac_pnp` the flat localizer uses.

Compared with flat `pipeline/localize.py` (every landmark row scored per
query), retrieval cost scales with keyframes: a 10k-keyframe DB is a
(1, K*128) x (K*128, 10k) matmul — microseconds — and the local match
touches only the few-thousand-row candidate bank. See
benchmarks/city_bench.py for measured numbers.

Reference scope: arnfred/Fast-Match has no retrieval layer (SURVEY.md
§3.1); this implements the north star's loop-closure detect / descriptor
bank query component (SURVEY.md §3.2 T21) at frame granularity.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors
from fastmatch_tpu.geometry.pnp import PnPResult, ransac_pnp
from fastmatch_tpu.matching.matcher import match_pair
from fastmatch_tpu.matching.vlad import (
    Vocabulary,
    retrieve,
    train_vocabulary,
    vlad_encode,
    vlad_encode_batch,
)
from fastmatch_tpu.pipeline.localize import LocalizeResult


def _bucket(n: int, floor: int = 256) -> int:
    """Round up to a power of two (one compile per bucket)."""
    b = floor
    while b < n:
        b *= 2
    return b


class KeyframeDB(NamedTuple):
    """Frame-granular retrieval index over a built map."""

    vocab: Vocabulary
    vlads: jnp.ndarray       # (F_cap, K*D) unit VLAD per keyframe
    frame_mask: jnp.ndarray  # (F_cap,) keyframe has >= min_obs observations
    frame_pts: np.ndarray    # (F_cap, L) landmark ids per frame, -1 padded
    frame_npts: np.ndarray   # (F_cap,) live count per row of frame_pts


def build_keyframe_db(
    rec,
    n_words: int = 64,
    vocab_sample: int = 16384,
    min_obs: int = 8,
    seed: int = 0,
    vocab: Vocabulary | None = None,
) -> KeyframeDB:
    """Build a KeyframeDB from a Reconstruction (or checkpoint fields).

    ``rec`` needs: pt_desc, pt_mask, obs_cam, obs_pt, obs_mask, n_frames,
    and the map capacity via pose_mask.shape[0]. Pass ``vocab`` to reuse
    a codebook (e.g. the IVF index's centroids) instead of training one.
    """
    f_cap = rec.pose_mask.shape[0]
    obs_ok = np.asarray(rec.obs_mask, bool)
    cams = np.asarray(rec.obs_cam, np.int32)[obs_ok]
    pts = np.asarray(rec.obs_pt, np.int32)[obs_ok]

    # Per-frame landmark lists, padded to the max count (host-side, once).
    counts = np.bincount(cams, minlength=f_cap)
    L = max(int(counts.max()) if counts.size else 1, 1)
    frame_pts = np.full((f_cap, L), -1, np.int64)
    order = np.argsort(cams, kind="stable")
    cs, ps = cams[order], pts[order]
    starts = np.zeros(f_cap + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for f in range(f_cap):
        a, b = starts[f], starts[f + 1]
        frame_pts[f, : b - a] = ps[a:b]
    frame_npts = counts.astype(np.int32)
    frame_mask = frame_npts >= min_obs

    if vocab is None:
        live = np.asarray(rec.pt_mask, bool)
        bank = np.asarray(rec.pt_desc, np.float32)
        rng = np.random.default_rng(seed)
        idx = np.flatnonzero(live)
        if idx.size > vocab_sample:
            idx = rng.choice(idx, size=vocab_sample, replace=False)
        sample = bank[idx]
        vocab = train_vocabulary(jax.random.PRNGKey(seed),
                                 jnp.asarray(sample),
                                 jnp.ones(sample.shape[0], bool),
                                 n_words=n_words)

    # Per-frame descriptor stacks: gather pt_desc rows (clip dead ids to 0,
    # mask carries liveness). One (F_cap, L, D) encode batch.
    safe = np.clip(frame_pts, 0, rec.pt_desc.shape[0] - 1)
    desc = jnp.asarray(np.asarray(rec.pt_desc, np.float32)[safe])
    dmask = jnp.asarray(frame_pts >= 0)
    vlads = vlad_encode_batch(desc, dmask, vocab)
    vlads = jnp.where(jnp.asarray(frame_mask)[:, None], vlads, 0.0)
    return KeyframeDB(vocab=vocab, vlads=vlads,
                      frame_mask=jnp.asarray(frame_mask),
                      frame_pts=frame_pts, frame_npts=frame_npts)


def query_frames(db: KeyframeDB, desc, mask, topk: int = 5):
    """Retrieve the top-k keyframes for one query view.

    Returns (scores (topk,), frame ids (topk,)); dead DB rows score -inf.
    """
    q = vlad_encode(jnp.asarray(np.asarray(desc, np.float32)),
                    jnp.asarray(np.asarray(mask, bool)), db.vocab)
    s, ids = retrieve(q[None], db.vlads, db.frame_mask, topk=topk)
    return s[0], ids[0]


def localize_hierarchical_normalized(
    rec,
    db: KeyframeDB,
    xn: np.ndarray,
    desc: np.ndarray,
    mask: np.ndarray,
    thr_n: float,
    topk: int = 4,
    ratio: float = 0.8,
    n_hyp: int = 512,
    min_inliers: int = 12,
    seed: int = 0,
) -> LocalizeResult:
    """`localize_hierarchical` core on already-normalized image coords
    (``xn``; ``thr_n`` a squared normalized-plane threshold) — the entry
    map merging uses, since observation tables store normalized uv."""
    _, ids = query_frames(db, desc, mask, topk=topk)
    ids = np.asarray(ids)
    cand = np.unique(db.frame_pts[ids][db.frame_pts[ids] >= 0])
    cap = _bucket(max(cand.size, 1))
    bank = np.zeros((cap, rec.pt_desc.shape[1]), np.float32)
    bmask = np.zeros(cap, bool)
    pts3 = np.zeros((cap, 3), np.float32)
    if cand.size:
        bank[: cand.size] = np.asarray(rec.pt_desc, np.float32)[cand]
        bmask[: cand.size] = np.asarray(rec.pt_mask, bool)[cand]
        pts3[: cand.size] = np.asarray(rec.points, np.float32)[cand]

    q = Descriptors(jnp.asarray(np.asarray(desc, np.float32)),
                    jnp.asarray(np.asarray(mask, bool)))
    m = match_pair(q, Descriptors(jnp.asarray(bank), jnp.asarray(bmask)),
                   ratio=ratio, cross_check=False)
    X = jnp.asarray(pts3)[jnp.clip(m.idx.astype(jnp.int32), 0, cap - 1)]
    pn: PnPResult = ransac_pnp(jax.random.PRNGKey(seed),
                               X, jnp.asarray(np.asarray(xn, np.float32)),
                               m.valid, thr=jnp.float32(thr_n), n_hyp=n_hyp,
                               min_inliers=min_inliers)
    return LocalizeResult(
        ok=pn.ok, R=pn.pose.R, t=pn.pose.t,
        n_matches=jnp.sum(m.valid, dtype=jnp.int32),
        n_inliers=pn.n_inliers,
    )


def localize_hierarchical(
    rec,
    db: KeyframeDB,
    xy: np.ndarray,
    desc: np.ndarray,
    mask: np.ndarray,
    camera,
    topk: int = 4,
    thr_px: float = 2.0,
    ratio: float = 0.8,
    n_hyp: int = 512,
    min_inliers: int = 12,
    seed: int = 0,
) -> LocalizeResult:
    """Retrieve top-k keyframes, match their landmark union, RANSAC PnP.

    The candidate bank is the union of landmarks observed by the
    retrieved keyframes, bucket-padded to a power of two so repeated
    queries against one map hit one compiled program per bucket.
    """
    from fastmatch_tpu.pipeline.reconstruct import _normalize

    xn = _normalize(np.asarray(xy, np.float32), camera).astype(np.float32)
    thr_n = (thr_px / float(camera.fx)) ** 2
    return localize_hierarchical_normalized(
        rec, db, xn, desc, mask, thr_n, topk=topk, ratio=ratio,
        n_hyp=n_hyp, min_inliers=min_inliers, seed=seed)


def map_from_checkpoint(path: str):
    """Load a `checkpoint.save_map` directory into the minimal map record
    both `build_keyframe_db` and `localize_hierarchical` consume."""
    import os
    from types import SimpleNamespace

    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return SimpleNamespace(**{
        k: np.asarray(tree[k])
        for k in ("points", "pt_mask", "pt_desc", "obs_cam", "obs_pt",
                  "obs_mask", "pose_mask")
    })
