"""Pose-graph optimization throughput on one chip (BASELINE.json config 4):
500-keyframe circle with drifted odometry + 5 loop closures, LM with a
dense damped-Cholesky inner solve on the (6n, 6n) system.

    /opt/venv/bin/python benchmarks/pgo_bench.py [n_keyframes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np


def _build_graph(n, rng):
    import jax.numpy as jnp
    from fastmatch_tpu.core.lie import SE3
    from fastmatch_tpu.posegraph.pgo import PoseGraph

    ang = 2 * np.pi * np.arange(n) / n
    Rg = np.zeros((n, 3, 3), np.float32)
    tg = np.zeros((n, 3), np.float32)
    for k in range(n):
        c, s = np.cos(ang[k]), np.sin(ang[k])
        Rw = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        Rg[k] = Rw.T
        tg[k] = -Rw.T @ np.array([10 * c, 10 * s, 0], np.float32)

    def rel(Ri, ti, Rj, tj):
        return SE3(jnp.asarray(Ri), jnp.asarray(ti)).compose(
            SE3(jnp.asarray(Rj), jnp.asarray(tj)).inverse())

    drift = 0.004
    R0, t0 = [Rg[0]], [tg[0]]
    ei, ej, ZR, Zt, w = [], [], [], [], []
    for k in range(1, n):
        Z = rel(Rg[k], tg[k], Rg[k - 1], tg[k - 1])
        noise = SE3.exp(jnp.asarray(np.concatenate([
            drift * rng.standard_normal(3),
            0.5 * drift * rng.standard_normal(3),
        ]).astype(np.float32)))
        Zn = noise.compose(Z)
        Tk = Zn.compose(SE3(jnp.asarray(R0[-1]), jnp.asarray(t0[-1])))
        R0.append(np.array(Tk.R))
        t0.append(np.array(Tk.t))
        ei.append(k); ej.append(k - 1)
        ZR.append(np.array(Zn.R)); Zt.append(np.array(Zn.t)); w.append(1.0)
    for a, b in [(n - 1, 0), (n // 2, 0), (n - 1, n // 2),
                 (3 * n // 4, n // 4), (n // 4, 0)]:
        Z = rel(Rg[a], tg[a], Rg[b], tg[b])
        ei.append(a); ej.append(b)
        ZR.append(np.array(Z.R)); Zt.append(np.array(Z.t)); w.append(1.0)
    fixed = np.zeros(n, bool)
    fixed[0] = True
    return PoseGraph(
        poses=SE3(jnp.asarray(np.stack(R0)), jnp.asarray(np.stack(t0))),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        Z=SE3(jnp.asarray(np.stack(ZR)), jnp.asarray(np.stack(Zt))),
        edge_weight=jnp.asarray(np.array(w, np.float32)),
        pose_mask=jnp.ones(n, bool),
        fixed=jnp.asarray(fixed),
    )


def main():
    import jax
    from fastmatch_tpu.posegraph.pgo import pgo_solve

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rng = np.random.default_rng(0)
    g = _build_graph(n, rng)

    t0 = time.perf_counter()
    res = pgo_solve(g, max_iters=30, kernel="geman", huber_delta_static=0.5)
    np.asarray(res.poses.t)[:1]
    print(f"backend={jax.default_backend()} n={n} compile+first: "
          f"{time.perf_counter() - t0:.1f}s cost {float(res.cost0):.3e} -> "
          f"{float(res.cost):.3e} iters={int(res.iters)}", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        res = pgo_solve(g, max_iters=30, kernel="geman", huber_delta_static=0.5)
        np.asarray(res.poses.t)[:1]
        best = min(best, time.perf_counter() - t0)
    iters = int(res.iters)
    print(f"{best * 1e3:.0f} ms/solve, {iters} LM iters -> "
          f"{iters / best:.1f} LM iters/s", flush=True)


if __name__ == "__main__":
    main()
