"""KLT visual-odometry engine throughput on chip (pipeline/vo.py).

Host-driven loop (like slam_device): per frame one pyramid build, one
KLT track, one bucketed PnP dispatch + small readbacks; keyframes add
triangulation/BA. Steady-state fps is therefore bounded by the relay's
per-dispatch latency on this container, not device work — report both
the wall fps and the frame-stat breakdown.
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
    # cold run (includes every compile), then the steady-state run over
    # the same sequence (all shapes cached)
    t0 = time.perf_counter()
    visual_odometry(views, cam, cfg, vo)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec = visual_odometry(views, cam, cfg, vo)
    dt = time.perf_counter() - t0
    print(f"cold (with compiles): {cold:.2f}s ({len(views)/cold:.1f} fps)",
          flush=True)
    F = len(views)
    est = rec.camera_centers()
    gt = -np.einsum("fji,fj->fi", scene.R, scene.t)
    ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
    n_kf = sum(1 for s in rec.frame_stats if s.get("kf"))
    print(f"VO {F} frames VGA, 512 tracks: {dt:.2f}s ({F/dt:.1f} frames/s) "
          f"ATE {ate:.4f}, {n_kf} keyframes, {int(rec.pt_mask.sum())} points,"
          f" {rec.n_obs} obs", flush=True)


if __name__ == "__main__":
    main()
