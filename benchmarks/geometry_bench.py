"""Two-view geometry benchmark: RANSAC throughput on one chip.

Measures the fixed-K batched-hypothesis RANSAC stack (essential, homography,
fundamental, PnP) end-to-end — sampling, batched minimal solves (eigh of
9x9 normal matrices), scoring over all P candidates, refit. The TPU-first
claim being tested: hypothesis count is a FLOP knob, not a latency knob
(SURVEY.md §8.2) — doubling K should move time sublinearly until the MXU
saturates.

Protocol matches bench.py: enqueue a batch of solves, sync once (the axon
relay costs ~450 us per execution; per-call block_until_ready would measure
the relay, not the kernel), warm-up loop first, best of 3.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import numpy as np
import jax
import jax.numpy as jnp


def _scene(rng, planar: bool, P: int = 512):
    from fastmatch_tpu.core.lie import SO3

    if planar:
        n = np.array([0.15, -0.1, 1.0])
        n /= np.linalg.norm(n)
        d = 3.0
        xy = rng.uniform(-1.5, 1.5, (P, 2))
        z = (d - xy @ n[:2]) / n[2]
        X = np.column_stack([xy, z])
    else:
        X = np.column_stack(
            [rng.uniform(-1.5, 1.5, (P, 2)), rng.uniform(2.0, 6.0, P)])
    R = np.asarray(SO3.exp(jnp.asarray(rng.standard_normal(3) * 0.08,
                                       jnp.float32)))
    t = np.array([0.4, -0.1, 0.15], np.float32)
    X2 = X @ R.T + t
    x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    x2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
    x1 += rng.standard_normal(x1.shape).astype(np.float32) * 5e-4
    x2 += rng.standard_normal(x2.shape).astype(np.float32) * 5e-4
    bad = rng.random(P) < 0.3
    x2[bad] = rng.uniform(-1.0, 1.0, (int(bad.sum()), 2)).astype(np.float32)
    return jnp.asarray(x1), jnp.asarray(x2), X


def _readback(out):
    """Force a real device round-trip. block_until_ready alone is NOT a
    reliable fence through the axon relay (bench.py learned this first):
    without reading a byte back, timings can reflect enqueue cost only."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _time(fn, n_calls: int = 20, reps: int = 3) -> float:
    """Seconds per call: enqueue n_calls, sync once (readback), best of reps."""
    _readback(fn())  # compile + settle
    for _ in range(3):
        _readback(fn())  # warm-up (first-loop relay hiccups)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_calls):
            out = fn()
        _readback(out)
        best = min(best, (time.perf_counter() - t0) / n_calls)
    return best


def main():
    from fastmatch_tpu.geometry.fundamental import ransac_fundamental
    from fastmatch_tpu.geometry.homography import ransac_homography
    from fastmatch_tpu.geometry.pnp import ransac_pnp
    from fastmatch_tpu.geometry.ransac import ransac_essential

    rng = np.random.default_rng(0)
    x1, x2, X = _scene(rng, planar=False)
    h1, h2, _ = _scene(rng, planar=True)
    px1 = x1 * 500 + jnp.asarray([320.0, 240.0])
    px2 = x2 * 500 + jnp.asarray([320.0, 240.0])
    mask = jnp.ones(x1.shape[0], bool)
    key = jax.random.PRNGKey(0)
    thr = (2.0 / 500.0) ** 2

    print(f"devices: {jax.devices()}", flush=True)
    print(f"{'solver':<14} {'K':>5} {'ms/solve':>9} {'K-hyp/s':>12}", flush=True)
    for n_hyp in (256, 512, 1024, 2048):
        for name, fn in (
            ("essential", lambda: ransac_essential(
                key, x1, x2, mask, thr=thr, n_hyp=n_hyp)),
            ("homography", lambda: ransac_homography(
                key, h1, h2, mask, thr=2 * thr, n_hyp=n_hyp)),
            ("fundamental", lambda: ransac_fundamental(
                key, px1, px2, mask, thr=4.0, n_hyp=n_hyp)),
            # 5pt at small K only: its program is large (grid scan + RREF +
            # Newton) and each K is a fresh ~minutes-scale remote compile;
            # K is also exactly what the 5-pt sample size makes cheap.
            *([("essential-5pt", lambda: ransac_essential(
                key, x1, x2, mask, thr=thr, n_hyp=n_hyp, solver="5pt"))]
              if n_hyp <= 512 else []),
            ("pnp", lambda: ransac_pnp(
                key, jnp.asarray(X.astype(np.float32)), x1, mask,
                thr=thr, n_hyp=n_hyp)),
        ):
            dt = _time(fn)
            print(f"{name:<14} {n_hyp:>5} {dt*1e3:>9.2f} "
                  f"{n_hyp/dt/1e3:>12.1f}", flush=True)


if __name__ == "__main__":
    main()
