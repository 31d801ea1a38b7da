"""City-scale benchmark (BASELINE.json config 5, single-chip legs): the
"10k+ keyframes" scale run on ONE v5e chip.

Two legs, both sized to 10,000 keyframes:

1. Pose-graph optimization over the full 10k-keyframe trajectory with
   loop closures — the matrix-free block-Jacobi-PCG solver
   (posegraph/pgo.py, solver="pcg"; the dense Hessian would be 14+ GB).
   Reports LM iters/s and the cost drop.

2. Loop-closure retrieval against the whole city: one query frame
   (2048 descriptors) vs a 10k-keyframe x 400-descriptor bank
   (4,000,000 rows, 2 GB f32 on device) — the exact chunked matcher vs
   the IVF cluster-sorted shortlist (matching/ann.py match_pair_ann_big),
   plus shortlist recall vs exact. This is the workload the ~100k-row
   IVF crossover (docs/PERFORMANCE.md) extrapolates to; here the
   shortlist should win by ~5-10x.

The multi-host legs of config 5 (sharded retrieval + distributed BA) are
structure-validated on the 8-device CPU mesh (tests/test_dist_pipeline.py,
tests/test_config5_sim.py) and dry-run compiled by __graft_entry__; their
wall-clock needs a real pod slice which this container does not have.

    /opt/venv/bin/python benchmarks/city_bench.py [n_keyframes] [desc_per_kf]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np


def bench_pgo_10k(n, rng):
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.core.lie import SE3
    from fastmatch_tpu.posegraph.pgo import PoseGraph, pgo_solve

    ang = 2 * np.pi * np.arange(n) / n
    c, s = np.cos(ang), np.sin(ang)
    Rw = np.zeros((n, 3, 3), np.float32)
    Rw[:, 0, 0] = c; Rw[:, 0, 1] = -s
    Rw[:, 1, 0] = s; Rw[:, 1, 1] = c
    Rw[:, 2, 2] = 1.0
    Rg = np.swapaxes(Rw, 1, 2).copy()
    eye = np.stack([100 * c, 100 * s, np.zeros(n)], 1).astype(np.float32)
    tg = -np.einsum("nij,nj->ni", Rg, eye).astype(np.float32)

    def rel_np(Ra, ta, Rb, tb):
        R = np.einsum("nij,nkj->nik", Ra, Rb)
        t = ta - np.einsum("nij,nj->ni", R, tb)
        return R.astype(np.float32), t.astype(np.float32)

    steps = 0.001 * rng.standard_normal((n, 6)).astype(np.float32)
    steps[0] = 0.0
    walk = jnp.asarray(np.cumsum(steps, axis=0))
    init = jax.vmap(SE3.exp)(walk).compose(SE3(jnp.asarray(Rg), jnp.asarray(tg)))

    oi = np.arange(1, n, dtype=np.int32)
    oj = oi - 1
    ZRo, Zto = rel_np(Rg[oi], tg[oi], Rg[oj], tg[oj])
    nz = jax.vmap(SE3.exp)(jnp.asarray(
        0.002 * rng.standard_normal((n - 1, 6)).astype(np.float32)))
    Zo = nz.compose(SE3(jnp.asarray(ZRo), jnp.asarray(Zto)))
    li = np.arange(500, n, 500, dtype=np.int32)
    lj = li - 500
    ZRl, Ztl = rel_np(Rg[li], tg[li], Rg[lj], tg[lj])

    ei = np.concatenate([oi, li])
    ej = np.concatenate([oj, lj])
    ZR = jnp.concatenate([Zo.R, jnp.asarray(ZRl)])
    Zt = jnp.concatenate([Zo.t, jnp.asarray(Ztl)])
    fixed = np.zeros(n, bool)
    fixed[0] = True
    g = PoseGraph(
        poses=init,
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        Z=SE3(ZR, Zt),
        edge_weight=jnp.ones(ei.shape[0], jnp.float32),
        pose_mask=jnp.ones(n, bool),
        fixed=jnp.asarray(fixed),
    )
    max_iters = 30
    solve = lambda: pgo_solve(g, max_iters=max_iters, solver="pcg",
                              pcg_iters=64, huber_delta_static=0.5,
                              kernel="geman", rtol=0.0)
    import jax
    t0 = time.perf_counter()
    res = solve()
    np.asarray(res.poses.R[:1])  # force a real round-trip (relay protocol)
    compile_s = time.perf_counter() - t0
    # Timing protocol (see bench.py): throwaway loop, then best-of-3 with a
    # forced readback — block_until_ready alone is unreliable via the relay.
    for _ in range(2):
        res = solve()
    np.asarray(res.poses.R[:1])
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve()
        np.asarray(res.poses.R[:1])
        dt = min(dt, time.perf_counter() - t0)
    it = int(res.iters)
    print(f"PGO {n} keyframes ({ei.shape[0]} edges), PCG solver: "
          f"{dt:.2f}s for {it} LM iters -> {it / dt:.1f} LM iters/s "
          f"(cost {float(res.cost0):.2e} -> {float(res.cost):.2e}; "
          f"first compile {compile_s:.0f}s)", flush=True)

    # Hierarchical (condensed-graph) solve: the drift-capable config-5
    # solver (posegraph/pgo.py:pgo_solve_hierarchical) — flat PCG's LM
    # iters/s above measure throughput, this measures the WHOLE
    # coarse+interpolate+polish wall-clock at 10k poses.
    from fastmatch_tpu.posegraph.pgo import pgo_solve_hierarchical

    hres = pgo_solve_hierarchical(g)         # warm compiles
    np.asarray(hres.poses.R[:1])
    t0 = time.perf_counter()
    hres = pgo_solve_hierarchical(g)
    np.asarray(hres.poses.R[:1])
    print(f"PGO {n} hierarchical solve: {time.perf_counter() - t0:.2f}s "
          f"(cost {float(hres.cost0):.2e} -> {float(hres.cost):.2e})",
          flush=True)


def _make_city(n_kf, per_kf, rng):
    """Synthetic city bank with loop-closure structure.

    City structure: the codebook scales with M (~16 rows/word — with a
    fixed small codebook 4M rows pack so densely that d2 -> d1 and the
    Lowe ratio test correctly rejects nearly every query), and keyframe k
    draws its words from a sliding window of the codebook (spatial
    locality: consecutive keyframes co-observe words, distant ones
    don't) — the structure a loop-closure query exploits.

    Returns (bank_np (M, 128) grouped per keyframe, query (2048, 128),
    qmask, j) where the query re-observes keyframes j..j+2 (a REVISIT of
    one place — visually coherent, like a real loop-closure query)."""
    M = n_kf * per_kf
    n_words = max(4096, M // 16)
    wpk = n_words // n_kf  # fresh words per keyframe
    words = np.abs(rng.standard_normal((n_words, 128))).astype(np.float32)
    words /= np.linalg.norm(words, axis=1, keepdims=True)
    # Per-row noise 0.3: rows share word structure but stay individually
    # distinct (a bank of near-duplicates would fail the ratio test).
    chunks = []
    kf_per_chunk = max(1, (1 << 20) // per_kf)
    for k0 in range(0, n_kf, kf_per_chunk):
        ks = np.arange(k0, min(k0 + kf_per_chunk, n_kf))
        base = np.repeat(ks * wpk, per_kf)
        wid = (base + rng.integers(0, max(3 * wpk, 1), base.shape[0])) % n_words
        w = words[wid]
        d = np.abs(w + 0.3 * rng.standard_normal(w.shape).astype(np.float32))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        chunks.append(d)
    bank_np = np.concatenate(chunks)

    j = int(rng.integers(0, n_kf - 3))
    src = np.arange(j * per_kf, (j + 3) * per_kf)
    rng.shuffle(src)
    src = src[: min(2048, src.shape[0])]
    nq = src.shape[0]
    q = np.zeros((2048, 128), np.float32)
    q[:nq] = np.abs(bank_np[src]
                    + 0.05 * rng.standard_normal((nq, 128)).astype(np.float32))
    q[:nq] /= np.linalg.norm(q[:nq], axis=1, keepdims=True)
    qmask = np.zeros(2048, bool)
    qmask[:nq] = True
    return bank_np, q, qmask, j


def bench_retrieval_city(n_kf, per_kf, rng):
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import Descriptors
    from fastmatch_tpu.matching.ann import build_index_sorted, match_pair_ann_big
    from fastmatch_tpu.matching.matcher import match_pair

    M = n_kf * per_kf
    print(f"bank: {n_kf} kf x {per_kf} desc = {M:,} rows "
          f"({M * 128 * 4 / 2**30:.1f} GiB f32)", flush=True)
    bank_np, q, qmask, _ = _make_city(n_kf, per_kf, rng)
    bank = Descriptors(jnp.asarray(bank_np), jnp.ones(M, bool))
    qd = Descriptors(jnp.asarray(q), jnp.asarray(qmask))

    t0 = time.perf_counter()
    idx = build_index_sorted(jax.random.PRNGKey(0), bank, n_clusters=1024,
                             iters=10)
    jax.block_until_ready(idx.centroids)
    t_build = time.perf_counter() - t0

    def timeit(f, reps=10):
        out = f()
        jax.block_until_ready(out.idx)
        for _ in range(2):
            outs = [f() for _ in range(3)]
        jax.block_until_ready(outs[-1].idx)
        t0 = time.perf_counter()
        outs = [f() for _ in range(reps)]
        jax.block_until_ready(outs[-1].idx)
        return (time.perf_counter() - t0) / reps, out

    t_exact, m_exact = timeit(lambda: match_pair(qd, bank))
    t_ivf, m_ivf = timeit(lambda: match_pair_ann_big(qd, idx, budget=65536,
                                                     n_probe=8))
    ve = np.asarray(m_exact.valid)
    vi = np.asarray(m_ivf.valid)
    print(f"  valid: exact {int(ve.sum())}/2048, shortlist {int(vi.sum())}",
          flush=True)
    agree = (np.asarray(m_exact.idx)[ve & vi] == np.asarray(m_ivf.idx)[ve & vi])
    recall = float(agree.mean()) if agree.size else float("nan")
    print(f"retrieval (1 frame x {M:,} rows): exact {t_exact * 1e3:.1f} ms, "
          f"IVF shortlist {t_ivf * 1e3:.1f} ms ({t_exact / t_ivf:.1f}x), "
          f"shortlist agreement {recall:.3f} on {int((ve & vi).sum())} "
          f"co-valid matches; index build {t_build:.1f}s one-time",
          flush=True)


def bench_vlad_city(n_kf, per_kf, rng):
    """Frame-granular place recognition over the same city: VLAD DB build
    (one-time) + per-query retrieval cost vs the descriptor-level legs."""
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.matching.vlad import (
        retrieve, train_vocabulary, vlad_encode, vlad_encode_batch)

    bank_np, q, qmask, j = _make_city(n_kf, per_kf, rng)
    n_words = 128
    sample = bank_np[rng.choice(bank_np.shape[0], 16384, replace=False)]
    t0 = time.perf_counter()
    vocab = train_vocabulary(jax.random.PRNGKey(0), jnp.asarray(sample),
                             jnp.ones(sample.shape[0], bool),
                             n_words=n_words)
    jax.block_until_ready(vocab.words)
    t_vocab = time.perf_counter() - t0

    frames = bank_np.reshape(n_kf, per_kf, 128)
    fmask = jnp.ones((512, per_kf), bool)
    t0 = time.perf_counter()
    vlads = []
    for k0 in range(0, n_kf, 512):
        chunk = frames[k0 : k0 + 512]
        pad = 512 - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, per_kf, 128),
                                                    np.float32)])
        vlads.append(vlad_encode_batch(jnp.asarray(chunk), fmask, vocab))
    db = jnp.concatenate(vlads)[:n_kf]
    jax.block_until_ready(db)
    t_enc = time.perf_counter() - t0
    db_mask = jnp.ones(n_kf, bool)

    # Query tensors live on device up front — in the product the query
    # frame's descriptors come from the on-device detector; re-uploading
    # per call would time the host->device relay, not retrieval.
    qj, qmj = jnp.asarray(q), jnp.asarray(qmask)

    def query():
        v = vlad_encode(qj, qmj, vocab)
        return retrieve(v[None], db, db_mask, topk=8)

    s, ids = query()
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    for _ in range(20):
        s, ids = query()
    jax.block_until_ready(ids)
    t_q = (time.perf_counter() - t0) / 20
    top = set(np.asarray(ids)[0].tolist())
    hit = len(top & {j, j + 1, j + 2}) > 0
    print(f"VLAD place recognition: vocab({n_words}w/16k rows) {t_vocab:.2f}s"
          f" one-time, DB encode {n_kf} kf in {t_enc:.2f}s "
          f"({n_kf / t_enc:.0f} kf/s), query {t_q * 1e3:.2f} ms "
          f"(encode + (1,{n_words * 128}) x ({n_words * 128},{n_kf}) matmul"
          f" + top-8), revisit hit={hit} (true kf {j}..{j + 2}, "
          f"top-8 {sorted(top)[:8]})", flush=True)


def main():
    n_kf = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    per_kf = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rng = np.random.default_rng(0)
    import jax
    print(f"backend={jax.default_backend()}", flush=True)
    leg = os.environ.get("CITY_LEG", "all")
    if leg in ("all", "pgo"):
        bench_pgo_10k(n_kf, rng)
    if leg in ("all", "retrieval"):
        bench_retrieval_city(n_kf, per_kf, rng)
    if leg in ("all", "vlad"):
        bench_vlad_city(n_kf, per_kf, rng)


if __name__ == "__main__":
    main()
