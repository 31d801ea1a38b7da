"""SIFT detect+describe throughput (frames/s/chip, BASELINE.json:2).

Batched (vmapped) detection over identical-shape frames — the pipeline's
ingest stage. Run on the chip:

    /opt/venv/bin/python benchmarks/sift_bench.py [H W batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.features.sift import SIFTConfig, detect_and_describe
    from synth import render_blob_image

    args = [int(a) for a in sys.argv[1:4]]
    h, w, batch = (args + [480, 640, 8])[:3]
    rng = np.random.default_rng(0)
    imgs = np.stack(
        [render_blob_image(rng, (h, w), n_blobs=150) for _ in range(batch)]
    )
    cfg = SIFTConfig(capacity=2048)

    # Single-frame jit, frames enqueued back-to-back (the vmapped batch-8
    # variant compiles 3x longer and runs ~20% slower on v5e — the
    # per-octave python loop already gives XLA plenty to overlap).
    fn = jax.jit(lambda im: detect_and_describe(im, cfg))
    x = jnp.asarray(imgs)
    t0 = time.perf_counter()
    kps, descs = fn(x[0])
    jax.block_until_ready(descs)
    np.asarray(descs.mask[:1])
    compile_s = time.perf_counter() - t0
    print(f"backend={jax.default_backend()} {h}x{w} "
          f"compile+first: {compile_s:.1f}s keypoints: {int(kps.mask.sum())}",
          flush=True)

    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [fn(x[i]) for i in range(batch)]
    jax.block_until_ready(outs[-1])
    np.asarray(outs[-1][1].mask[:1])
    dt = (time.perf_counter() - t0) / (reps * batch)
    print(f"{dt*1e3:.1f} ms/frame -> {1/dt:.1f} frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
