"""Multi-chip scaling-efficiency harness (BASELINE.json:5 ">= 80% scaling
efficiency at N >= 2 hosts").

Measures DP-batched matching throughput at every device count 1..N on the
current platform and reports efficiency = throughput(N) / (N * throughput(1)).
This container has ONE real TPU chip, so real numbers need a pod slice; run
with the CPU mesh for a smoke of the harness itself:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        /opt/venv/bin/python benchmarks/scaling_bench.py 4 256   # pairs/dev cap

On a pod slice, run it as-is under SPMD launch (one process per host;
jax.distributed.initialize via COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
env vars — dist/bootstrap.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np


def main():
    from fastmatch_tpu.dist.bootstrap import initialize_distributed

    initialize_distributed()

    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import Descriptors
    from fastmatch_tpu.dist.mesh import make_mesh
    from fastmatch_tpu.dist.sharded_match import match_batch_dp

    devices = jax.devices()
    n_dev = len(devices)
    args = [int(a) for a in sys.argv[1:3]]
    pairs_per_dev, cap = (args + [8, 2048])[:2]
    rng = np.random.default_rng(0)

    def bank(n):
        d = np.abs(rng.standard_normal((n, cap, 128))).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return Descriptors(jnp.asarray(d), jnp.ones((n, cap), bool))

    results = []
    counts = [n for n in range(1, n_dev + 1) if n == 1 or n_dev % n == 0]
    for n in counts:
        mesh = make_mesh(n_data=n, n_bank=1, devices=devices[:n])
        B = pairs_per_dev * n
        da, db = bank(B), bank(B)
        run = lambda: match_batch_dp(da, db, mesh)
        out = run()
        jax.block_until_ready(out)
        for _ in range(2):
            outs = [run() for _ in range(3)]
        jax.block_until_ready(outs[-1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(10)]
            jax.block_until_ready(outs[-1])
            np.asarray(outs[-1].idx[:1, :1])
            best = min(best, (time.perf_counter() - t0) / 10)
        results.append({"devices": n, "pairs_per_s": B / best})

    base = results[0]["pairs_per_s"]
    for r in results:
        r["efficiency"] = r["pairs_per_s"] / (r["devices"] * base)
    print(json.dumps({
        "metric": "dp_matching_scaling",
        "platform": jax.default_backend(),
        "results": [
            {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
            for r in results
        ],
    }))


if __name__ == "__main__":
    main()
