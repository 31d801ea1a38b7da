"""BA throughput microbenchmark (BASELINE.json:2 metric "BA iters/s").

Builds a synthetic bundle-adjustment problem at production scale (default:
128 cameras, 16k points, 128k observations — a 500-keyframe-class map block)
and times LM iterations/s on the current backend. Run on the chip:

    /opt/venv/bin/python benchmarks/ba_bench.py [n_cams n_pts n_obs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np


def make_problem(n_cams=128, n_pts=16384, n_obs=131072, noise=2e-3, seed=0):
    import jax.numpy as jnp
    from fastmatch_tpu.ba.problem import BAProblem, Observations
    from fastmatch_tpu.core.lie import SE3

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    # cameras on an arc looking at the cloud
    th = np.linspace(0, 0.8, n_cams)
    R = np.zeros((n_cams, 3, 3), np.float32)
    t = np.zeros((n_cams, 3), np.float32)
    for i, a in enumerate(th):
        c, s = np.cos(a), np.sin(a)
        R[i] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        t[i] = [0.2 * np.sin(3 * a), 0.0, 6.0 + 0.3 * np.cos(2 * a)]
    ci = rng.integers(0, n_cams, n_obs).astype(np.int32)
    pi = rng.integers(0, n_pts, n_obs).astype(np.int32)
    p = np.einsum("oij,oj->oi", R[ci], pts[pi]) + t[ci]
    uv = (p[:, :2] / p[:, 2:3] + noise * rng.standard_normal((n_obs, 2))).astype(
        np.float32
    )
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True
    # perturb the initial estimate
    return BAProblem(
        poses=SE3(jnp.asarray(R), jnp.asarray(t + 0.02 * rng.standard_normal(t.shape).astype(np.float32))),
        points=jnp.asarray(pts + 0.02 * rng.standard_normal(pts.shape).astype(np.float32)),
        obs=Observations(jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv),
                         jnp.ones(n_obs, bool)),
        cam_mask=jnp.ones(n_cams, bool),
        pt_mask=jnp.ones(n_pts, bool),
        fixed_cams=jnp.asarray(fixed),
    )


def main():
    import jax
    from fastmatch_tpu.ba.lm import ba_solve

    args = [int(a) for a in sys.argv[1:4]]
    n_cams, n_pts, n_obs = (args + [128, 16384, 131072])[:3]
    problem = make_problem(n_cams, n_pts, n_obs)
    max_iters, pcg_iters = 10, 32

    print(f"backend={jax.default_backend()} cams={n_cams} pts={n_pts} obs={n_obs}",
          flush=True)
    t0 = time.perf_counter()
    res = ba_solve(problem, max_iters=max_iters, pcg_iters=pcg_iters)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s cost {float(res.cost0):.4e} -> "
          f"{float(res.cost):.4e} iters={int(res.iters)}", flush=True)

    for label, grouped in (("scatter", None), ("grouped", "auto")):
        res = ba_solve(problem, grouped=grouped, max_iters=max_iters,
                       pcg_iters=pcg_iters)
        jax.block_until_ready(res)
        np.asarray(res.points[:1])
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            res = ba_solve(problem, grouped=grouped, max_iters=max_iters,
                           pcg_iters=pcg_iters)
        jax.block_until_ready(res)
        np.asarray(res.points[:1])
        dt = (time.perf_counter() - t0) / reps
        iters = int(res.iters)
        print(
            f"[{label}] {dt*1e3:.1f} ms/solve, {iters} LM iters -> "
            f"{iters/dt:.2f} LM iters/s ({iters*pcg_iters/dt:.0f} PCG matvecs/s) "
            f"cost {float(res.cost0):.4e} -> {float(res.cost):.4e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
