"""KLT visual-odometry engine throughput on chip.

Two engines over the same rendered VGA sequence:

- host (pipeline/vo.py): per frame one pyramid build, one KLT track, one
  bucketed PnP dispatch + small readbacks; keyframes add
  triangulation/BA. Steady-state fps is bounded by the relay's
  per-dispatch latency on this container, not device work.
- scan (pipeline/vo_scan.py): host bootstrap, then the whole remaining
  sequence as ONE lax.scan dispatch (keyframe work and interval BA under
  lax.cond) + one final BA + one readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np
import jax


def main():
    assert jax.default_backend() != "cpu", "bench must run on the TPU chip"
    from synth import SyntheticScene, render_scene_views
    from fastmatch_tpu.core.camera import Pinhole
    from fastmatch_tpu.pipeline.config import (BAConfig, MapConfig,
                                               PipelineConfig)
    from fastmatch_tpu.pipeline.vo import VOConfig, visual_odometry
    from fastmatch_tpu.utils.evaluation import ate_rmse
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    scene = SyntheticScene(rng, n_points=260, n_frames=40,
                           image_size=(640, 480))
    views = [np.asarray(v, np.float32)
             for v in render_scene_views(scene, rng, image_size=(640, 480))]
    cam = Pinhole.from_K(scene.K)
    cfg = PipelineConfig(ba=BAConfig(max_iters=8, pcg_iters=25),
                         map=MapConfig(max_frames=64, max_points=8192,
                                       max_obs=65536))
    vo = VOConfig(capacity=512, bootstrap_px=8.0, kf_px=6.0,
                  min_parallax_px=4.0)
    from fastmatch_tpu.pipeline.vo_scan import visual_odometry_scan

    F = len(views)
    gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
    for name, engine in (("host", visual_odometry),
                         ("scan", visual_odometry_scan)):
        # cold run (includes every compile), then the steady-state run
        # over the same sequence (all shapes cached)
        t0 = time.perf_counter()
        engine(views, cam, cfg, vo)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        rec = engine(views, cam, cfg, vo)
        dt = time.perf_counter() - t0
        print(f"[{name}] cold (with compiles): {cold:.2f}s "
              f"({F/cold:.1f} fps)", flush=True)
        est = rec.camera_centers()
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        n_kf = sum(1 for s in rec.frame_stats if s.get("kf"))
        print(f"[{name}] VO {F} frames VGA, 512 tracks: {dt:.2f}s "
              f"({F/dt:.1f} frames/s) ATE {ate:.4f}, {n_kf} keyframes, "
              f"{int(rec.pt_mask.sum())} points, {rec.n_obs} obs",
              flush=True)

    # Longer sequence, scan engine only: the scan's cost is ~2.7 s fixed
    # (bootstrap dispatches + final BA + readback) + ~7 ms/frame of device
    # work, so throughput keeps rising with sequence length.
    scene2 = SyntheticScene(rng, n_points=260, n_frames=100,
                            image_size=(640, 480))
    views2 = [np.asarray(v, np.float32)
              for v in render_scene_views(scene2, rng,
                                          image_size=(640, 480))]
    gt2 = -np.einsum("fji,fj->fi", scene2.R, scene2.t)
    cam2 = Pinhole.from_K(scene2.K)
    cfg2 = PipelineConfig(ba=BAConfig(max_iters=8, pcg_iters=25),
                          map=MapConfig(max_frames=128, max_points=8192,
                                        max_obs=65536))
    visual_odometry_scan(views2, cam2, cfg2, vo)  # warm the 100-frame shapes
    t0 = time.perf_counter()
    rec = visual_odometry_scan(views2, cam2, cfg2, vo)
    dt = time.perf_counter() - t0
    ate = float(ate_rmse(jnp.asarray(rec.camera_centers()),
                         jnp.asarray(gt2)))
    print(f"[scan] VO {len(views2)} frames VGA: {dt:.2f}s "
          f"({len(views2)/dt:.1f} frames/s) ATE {ate:.4f}, "
          f"{int(rec.pt_mask.sum())} points", flush=True)


if __name__ == "__main__":
    main()
