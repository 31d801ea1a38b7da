"""Benchmark harness (T24): matching throughput, TPU vs CPU baseline.

Workload = BASELINE.json config 2: batched image-pair matching, 2048-capacity
128-d descriptor sets, Lowe ratio + cross-check. The reference published no
numbers (BASELINE.md), so the CPU baseline is established here: cv2 BFMatcher
(the reference's native matching path, C++ brute force) on the same workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the TPU:CPU speedup (target >= 5x, BASELINE.json:5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

import numpy as np


def make_pairs(rng, batch, n_desc=1500, cap=2048):
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import Descriptors, descriptors_from_numpy

    def mk(n):
        d = np.abs(rng.standard_normal((n, 128))).astype(np.float32)
        return d / np.linalg.norm(d, axis=1, keepdims=True)

    raw = [(mk(n_desc), mk(n_desc)) for _ in range(batch)]
    da = Descriptors(
        jnp.stack([descriptors_from_numpy(a, cap).data for a, _ in raw]),
        jnp.stack([descriptors_from_numpy(a, cap).mask for a, _ in raw]),
    )
    db = Descriptors(
        jnp.stack([descriptors_from_numpy(b, cap).data for _, b in raw]),
        jnp.stack([descriptors_from_numpy(b, cap).mask for _, b in raw]),
    )
    return raw, da, db


def bench_cpu_cv2(raw, repeats=2):
    """Reference-style CPU baseline: cv2 BFMatcher knnMatch (C++ brute force)."""
    import cv2

    bf = cv2.BFMatcher(cv2.NORM_L2)
    t0 = time.perf_counter()
    for _ in range(repeats):
        for a, b in raw:
            bf.knnMatch(a, b, k=2)
            bf.knnMatch(b, a, k=1)  # the cross-check leg
    dt = (time.perf_counter() - t0) / (repeats * len(raw))
    return 1.0 / dt


def bench_tpu_pallas(da, db, repeats=20, precision="exact", fused=True):
    import jax

    if fused:
        # Round-2 headline path: ONE grid step per pair, ratio + mutual
        # cross-check in-kernel (kernels/batch_match.py) — no per-row-tile
        # launch overhead, no XLA gather epilogue.
        from fastmatch_tpu.kernels.batch_match import match_batch_fused

        @jax.jit
        def run(da, db):
            return match_batch_fused(da, db, fast=precision == "fast")
    else:
        from fastmatch_tpu.kernels.distance_topk import match_pair_pallas

        @jax.jit
        def run(da, db):
            return jax.vmap(
                lambda a, b: match_pair_pallas(a, b, interpret=False,
                                               precision=precision)
            )(da, db)

    out = run(da, db)
    jax.block_until_ready(out)  # compile + settle queue
    np.asarray(out.idx[:1, :1])  # force a real device round-trip
    # Throughput protocol: enqueue `repeats` batches back-to-back, sync once.
    # (Per-call block_until_ready has proven unreliable through the remote
    # TPU relay — it can return before execution completes. The FIRST timing
    # loop after a compile is also unreliable — hiccups of 0.1-9 s/call —
    # so run a throwaway loop, then take the best of 3 measured loops.)
    for _ in range(3):
        outs = [run(da, db) for _ in range(4)]
    jax.block_until_ready(outs[-1])
    np.asarray(outs[-1].idx[:1, :1])
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(da, db) for _ in range(repeats)]
        jax.block_until_ready(outs[-1])
        np.asarray(outs[-1].idx[:1, :1])
        dt = min(dt, (time.perf_counter() - t0) / repeats)
    batch = da.data.shape[0]
    return batch / dt


def main():
    rng = np.random.default_rng(0)
    batch = 64
    raw, da, db = make_pairs(rng, batch)

    import jax

    assert jax.default_backend() != "cpu", "bench must run on the TPU chip"

    # Accuracy gate for the fast (bf16-feed) path: decision agreement with
    # the exact jnp anchor on the first pair must clear the >=99% bar
    # (BASELINE.json:5) for its throughput to count as the headline.
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import Descriptors
    from fastmatch_tpu.matching.matcher import match_pair_jnp
    from fastmatch_tpu.utils.evaluation import match_agreement

    from fastmatch_tpu.kernels.batch_match import match_batch_fused

    one = lambda d, i: Descriptors(d.data[i], d.mask[i])
    ref = match_pair_jnp(one(da, 0), one(db, 0))
    fast = match_batch_fused(
        Descriptors(da.data[:1], da.mask[:1]),
        Descriptors(db.data[:1], db.mask[:1]), fast=True)
    agreement = float(match_agreement(ref.idx, ref.valid, fast.idx[0],
                                      fast.valid[0], mask=da.mask[0]))
    assert agreement >= 0.99, f"fast-path agreement {agreement} < 0.99"
    # The exact fused path must agree with the anchor bit-for-bit.
    exact = match_batch_fused(
        Descriptors(da.data[:1], da.mask[:1]),
        Descriptors(db.data[:1], db.mask[:1]), fast=False)
    assert np.array_equal(np.asarray(exact.valid[0]), np.asarray(ref.valid))

    tpu_fast = bench_tpu_pallas(da, db, precision="fast")
    tpu_exact = bench_tpu_pallas(da, db, precision="exact")
    vmapped_fast = bench_tpu_pallas(da, db, precision="fast", fused=False)
    # Sustained rate at B=256: ~1.1 ms/dispatch of relay/XLA-prologue
    # overhead dominates the 64-pair batch (measured round 3); a serving
    # deployment batches deeper, so report the amortized rate too.
    _, da256, db256 = make_pairs(rng, 256)
    tpu_fast_256 = bench_tpu_pallas(da256, db256, repeats=8, precision="fast")
    cpu_pairs_s = bench_cpu_cv2(raw[:8])  # cv2 is slow; subsample pairs

    # Binary (ORB/Hamming) matching on the same batch geometry: packed
    # 256-bit descriptors through the SAME fused kernel via the +-1 unpack
    # (d2 = 4*hamming; bf16 MXU feed is bit-exact for binaries). Gate:
    # decision parity with the popcount anchor on pair 0.
    from fastmatch_tpu.core.containers import BinaryDescriptors
    from fastmatch_tpu.matching.hamming import (match_batch_hamming,
                                                match_pair_hamming_jnp)

    pk = rng.integers(0, 2 ** 32, size=(batch, 2048, 8),
                      dtype=np.uint64).astype(np.uint32)
    qk = pk.copy()
    qk[:, :1024] = rng.integers(0, 2 ** 32, size=(batch, 1024, 8),
                                dtype=np.uint64).astype(np.uint32)
    bmask = jnp.ones((batch, 2048), bool)
    A = BinaryDescriptors(packed=jnp.asarray(pk), mask=bmask)
    B = BinaryDescriptors(packed=jnp.asarray(qk), mask=bmask)
    anchor = match_pair_hamming_jnp(
        BinaryDescriptors(A.packed[0], A.mask[0]),
        BinaryDescriptors(B.packed[0], B.mask[0]))
    mb = match_batch_hamming(A, B, backend="mxu")
    assert np.array_equal(np.asarray(anchor.valid), np.asarray(mb.valid)[0])
    # Same protocol as bench_tpu_pallas: throwaway loops, then best-of-3
    # at repeats deep enough to amortize the per-sync relay cost (~15 ms —
    # at 4 repeats it added ~4 ms/batch and hid half the kernel's rate).
    run_bin = lambda: match_batch_hamming(A, B, backend="mxu")
    np.asarray(run_bin().idx[:1, :1])
    for _ in range(3):
        outs = [run_bin() for _ in range(4)]
    jax.block_until_ready(outs[-1])
    np.asarray(outs[-1].idx[:1, :1])
    dt_bin = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run_bin() for _ in range(16)]
        jax.block_until_ready(outs[-1])
        np.asarray(outs[-1].idx[:1, :1])
        dt_bin = min(dt_bin, (time.perf_counter() - t0) / 16)
    binary_pairs_s = batch / dt_bin

    print(
        json.dumps(
            {
                "metric": "match_pairs_per_s_per_chip",
                "value": round(tpu_fast, 2),
                "unit": "image pairs/s (2k x 2k 128-d, ratio+cross-check, bf16-fast)",
                "vs_baseline": round(tpu_fast / cpu_pairs_s, 2),
                "exact_pairs_per_s": round(tpu_exact, 2),
                "b256_fast_pairs_per_s": round(tpu_fast_256, 2),
                "vmapped_per_pair_pairs_per_s": round(vmapped_fast, 2),
                "orb_binary_pairs_per_s": round(binary_pairs_s, 2),
                "fast_agreement_vs_exact": round(agreement, 5),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
