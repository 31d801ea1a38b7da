"""MFU report: sustained matcher TFLOP/s vs the v5e ceiling (VERDICT r1
"what's weak" #7: no MFU-vs-peak table was published; the north star says
speed-of-light per chip, not 5x CPU).

Measures the batched fully-fused Pallas matcher (kernels/batch_match.py)
in both precisions at the headline workload (64 pairs x 2048 x 2048
128-d), plus the vmapped per-pair kernel for comparison, and prints a
JSON MFU table. FLOP model: the distance matrix matmul dominates —
2*B*N*M*D MACs -> 2*B*N*M*D flops (top-2/ratio/cross-check VPU work is
O(B*N*M) comparisons, excluded, which UNDERSTATES utilization slightly).

Ceilings (v5e, per chip): 197 TFLOP/s bf16 MXU. The exact path runs
f32 HIGHEST = 6 bf16 passes per product -> ~32.8 TFLOP/s effective
ceiling for the same math.

Timing protocol per [[tpu-perf-pathologies]]: enqueue N calls
back-to-back, sync once, best of 3, and end with a tiny host readback
(block_until_ready alone through the relay can measure only enqueue).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.core.containers import Descriptors

PEAK_BF16 = 197e12
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0  # 6 MXU passes per f32 HIGHEST product


def _bank(rng, b, n):
    d = np.abs(rng.standard_normal((b, n, 128))).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Descriptors(jnp.asarray(d), jnp.ones((b, n), bool))


def _time(fn, da, db, repeats=20):
    out = fn(da, db)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(da, db)
        jax.block_until_ready(out)
        np.asarray(out.idx.ravel()[:1])  # force a real host readback
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def main():
    B, N, M = 64, 2048, 2048
    rng = np.random.default_rng(0)
    da, db = _bank(rng, B, N), _bank(rng, B, M)
    flops = 2.0 * B * N * M * 128

    from fastmatch_tpu.kernels.batch_match import match_batch_fused
    from fastmatch_tpu.kernels.distance_topk import match_pair_pallas

    interp = jax.default_backend() == "cpu"
    rows = {}
    for name, fast in (("fused_exact", False), ("fused_fast", True)):
        fn = jax.jit(lambda a, b, fast=fast: match_batch_fused(
            a, b, fast=fast, interpret=interp))
        dt = _time(fn, da, db)
        peak = PEAK_BF16 if fast else PEAK_F32_HIGHEST
        rows[name] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "pairs_per_s": round(B / dt, 1),
            "tflops": round(flops / dt / 1e12, 2),
            "mfu_vs_ceiling": round(flops / dt / peak, 3),
            "ceiling_tflops": round(peak / 1e12, 1),
        }
    for name, prec in (("vmapped_exact", "exact"), ("vmapped_fast", "fast")):
        fn = jax.jit(lambda a, b, prec=prec: jax.vmap(
            lambda x, y: match_pair_pallas(x, y, precision=prec,
                                           interpret=interp))(a, b))
        dt = _time(fn, da, db)
        peak = PEAK_BF16 if prec == "fast" else PEAK_F32_HIGHEST
        rows[name] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "pairs_per_s": round(B / dt, 1),
            "tflops": round(flops / dt / 1e12, 2),
            "mfu_vs_ceiling": round(flops / dt / peak, 3),
        }
    print(json.dumps({
        "metric": "matcher_mfu",
        "workload": f"{B}x{N}x{M}x128 ratio+cross-check",
        "device": str(jax.devices()[0]),
        **rows,
    }))


if __name__ == "__main__":
    main()
