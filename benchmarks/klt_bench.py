"""KLT tracking throughput on chip: points/s and frames/s at VGA.

Protocol follows bench.py: enqueue batches back-to-back, fence with a
real readback (per-call block_until_ready is unreliable through the
remote relay), best of 3 measured loops after a throwaway loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import numpy as np
import jax
import jax.numpy as jnp


def fence(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    np.asarray(leaves[0].ravel()[:1])


def timeit(fn, n=10):
    fence(fn())
    for _ in range(2):
        outs = [fn() for _ in range(n)]
        fence(outs[-1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        fence(outs[-1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from fastmatch_tpu.features.klt import (KLTConfig, build_pyramid,
                                            shi_tomasi, track_pyramids)

    assert jax.default_backend() != "cpu", "bench must run on the TPU chip"
    rng = np.random.default_rng(0)
    h, w = 480, 640
    base = rng.standard_normal((h + 8, w + 8)).astype(np.float32)
    # smooth it a little so LK has gradients, via simple box passes
    for _ in range(3):
        base = 0.25 * (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                       + np.roll(np.roll(base, 1, 0), 1, 1))
    base -= base.min()
    base /= base.max()
    img0 = jnp.asarray(base[:h, :w])
    img1 = jnp.asarray(base[3:3 + h, 2:2 + w])  # 2-3 px true shift

    cfg = KLTConfig()
    pyr0 = build_pyramid(img0, cfg)
    pyr1 = build_pyramid(img1, cfg)
    for cap in (512, 2048):
        kps = shi_tomasi(img0, capacity=cap)
        dt = timeit(lambda: track_pyramids(pyr0, pyr1, kps.xy, kps.mask, cfg))
        n_ok = int(np.asarray(track_pyramids(pyr0, pyr1, kps.xy, kps.mask,
                                             cfg)[1]).sum())
        print(f"track {cap:5d} pts VGA: {dt*1e3:6.2f} ms/frame "
              f"({1/dt:6.0f} fps, {cap/dt/1e6:.2f} M pts/s, {n_ok} tracked)")
    dt_p = timeit(lambda: build_pyramid(img1, cfg))
    dt_d = timeit(lambda: shi_tomasi(img0, capacity=2048))
    print(f"build_pyramid VGA: {dt_p*1e3:.2f} ms; shi_tomasi 2048: "
          f"{dt_d*1e3:.2f} ms")


if __name__ == "__main__":
    main()
