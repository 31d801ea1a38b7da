"""Dense stereo throughput on chip: disparity maps/s at VGA and 720p.

Same fencing protocol as bench.py / klt_bench.py.
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


def timeit(fn, n=8):
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
    from fastmatch_tpu.dense.stereo import StereoConfig, stereo_disparity

    assert jax.default_backend() != "cpu", "bench must run on the TPU chip"
    rng = np.random.default_rng(0)
    for (h, w), D in (((480, 640), 64), ((480, 640), 128), ((720, 1280), 128)):
        base = rng.standard_normal((h, w + 200)).astype(np.float32)
        for _ in range(2):
            base = 0.25 * (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                           + np.roll(np.roll(base, 1, 0), 1, 1))
        base -= base.min()
        base /= base.max()
        left = jnp.asarray(base[:, :w])
        right = jnp.asarray(base[:, 12:12 + w])
        cfg = StereoConfig(max_disp=D)
        dt = timeit(lambda: stereo_disparity(left, right, cfg))
        disp, valid = stereo_disparity(left, right, cfg)
        vfrac = float(np.asarray(valid).mean())
        mp = h * w / dt / 1e6
        print(f"{w}x{h} D={D:3d}: {dt*1e3:6.2f} ms ({1/dt:5.1f} maps/s, "
              f"{mp:6.0f} Mpx/s, {h*w*D/dt/1e9:6.1f} Gdisp/s, "
              f"valid {vfrac:.2f})")


if __name__ == "__main__":
    main()
