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

    # ---- long sequence: fixed costs (bootstrap, final BA, readback)
    #      amortize; the scan body itself runs ~3 ms/frame ----
    from fastmatch_tpu.pipeline.config import MapConfig

    n_long = 100
    # span scales with length: SyntheticScene spreads its arc over ALL
    # frames, so a 100-frame run needs a wider orbit for per-frame baseline
    # (the 2-frame bootstrap needs parallax) while keeping the landmark
    # field in view.
    scene_l = SyntheticScene(rng, n_points=400, n_frames=n_long, span=1.2)
    feats_l = synthetic_features(rng, scene_l)
    cfg_l = PipelineConfig(
        map=MapConfig(max_frames=128, max_points=16384, max_obs=131072))
    scfg = SlamConfig(window=10, loop_gap=10**6, loop_min_votes=10**9)
    slam_scan(feats_l, cam, cfg_l, scfg)
    t0 = time.perf_counter()
    out = slam_scan(feats_l, cam, cfg_l, scfg)
    dt = time.perf_counter() - t0
    recl = out.rec
    estl = np.stack([-recl.R[f].T @ recl.t[f] for f in range(n_long)])
    gtl = np.einsum("fji,fj->fi", scene_l.R[:n_long], -scene_l.t[:n_long])
    atel = float(ate_rmse(jnp.asarray(estl), jnp.asarray(gtl)))
    print(f"scan mode {n_long} frames: {dt:.1f}s -> {n_long / dt:.2f} "
          f"frames/s (ATE {atel:.4f})", flush=True)


if __name__ == "__main__":
    main()
