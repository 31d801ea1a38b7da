"""End-to-end incremental SfM throughput on one chip (BASELINE.json
config 3): synthetic features -> reconstruct() (match + PnP + triangulate
+ interval BA), steady-state (second run: compile cache warm).

    /opt/venv/bin/python benchmarks/pipeline_bench.py [n_frames]
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
    from synth import SyntheticScene
    from test_pipeline import synthetic_features
    from fastmatch_tpu.pipeline.reconstruct import reconstruct
    from fastmatch_tpu.pipeline.config import PipelineConfig
    from fastmatch_tpu.core.camera import Pinhole
    from fastmatch_tpu.utils.evaluation import ate_rmse

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.default_rng(0)
    scene = SyntheticScene(rng, n_points=400, n_frames=n_frames)
    feats = synthetic_features(rng, scene)
    cam = Pinhole.from_K(scene.K)
    cfg = PipelineConfig()

    t0 = time.perf_counter()
    reconstruct(feats, cam, cfg)
    print(f"backend={jax.default_backend()} first run (compiles): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    rec = reconstruct(feats, cam, cfg)
    dt = time.perf_counter() - t0
    est = np.stack([-rec.R[f].T @ rec.t[f] for f in range(n_frames)])
    gt = np.einsum("fji,fj->fi", scene.R[:n_frames], -scene.t[:n_frames])
    ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
    print(f"host-orchestrated reconstruct: {dt:.1f}s for {n_frames} frames "
          f"-> {n_frames / dt:.2f} frames/s (ATE {ate:.4f})", flush=True)

    # ---- device-resident tracker (round 2): one jitted step per frame ----
    from fastmatch_tpu.pipeline.slam import SlamConfig
    from fastmatch_tpu.pipeline.slam_device import slam_device

    scfg = SlamConfig(window=10**6, loop_gap=10**6, loop_min_votes=10**9)
    t0 = time.perf_counter()
    slam_device(feats, cam, cfg, scfg)
    print(f"device tracker first run (compiles): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = slam_device(feats, cam, cfg, scfg)
    dt = time.perf_counter() - t0
    recd = out.rec
    estd = np.stack([-recd.R[f].T @ recd.t[f] for f in range(n_frames)])
    ated = float(ate_rmse(jnp.asarray(estd), jnp.asarray(gt)))
    # Dispatch accounting: per frame = 1 track_step + 1 device_get; BA adds
    # 1 solve per interval; everything else is host numpy.
    n_ba = n_frames // cfg.ba.interval if cfg.ba.interval else 0
    print(f"device tracker steady-state: {dt:.1f}s for {n_frames} frames "
          f"-> {n_frames / dt:.2f} frames/s (ATE {ated:.4f}); "
          f"dispatches/frame = 1 step + 1 readback "
          f"(+{n_ba} BA solves total)", flush=True)

    # ---- scan mode (round 2): the WHOLE sequence in one lax.scan ----
    from fastmatch_tpu.pipeline.slam_scan import slam_scan

    t0 = time.perf_counter()
    slam_scan(feats, cam, cfg, scfg)
    print(f"scan mode first run (compiles): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = slam_scan(feats, cam, cfg, scfg)
    dt = time.perf_counter() - t0
    recs = out.rec
    ests = np.stack([-recs.R[f].T @ recs.t[f] for f in range(n_frames)])
    ates = float(ate_rmse(jnp.asarray(ests), jnp.asarray(gt)))
    print(f"scan mode steady-state: {dt:.1f}s for {n_frames} frames "
          f"-> {n_frames / dt:.2f} frames/s (ATE {ates:.4f}); "
          f"dispatches = 1 scan + 1 final BA + 1 readback TOTAL", flush=True)


if __name__ == "__main__":
    main()
