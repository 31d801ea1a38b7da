"""Self-calibration (ba/calibrate.py): intrinsics refinement + the
alternating calibrate<->BA post-pass. CPU (conftest pins jax to cpu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synth import SyntheticScene
from fastmatch_tpu.ba.calibrate import (
    CalibResult,
    calibrate_map,
    param_indices,
    refine_intrinsics,
    self_calibrate,
)
from fastmatch_tpu.core.camera import (
    Pinhole,
    normalize_pixels,
    project_pixels,
)


def _scene_obs(rng, vec_true, n_points=160, n_frames=8, model="pinhole"):
    """GT structure + pixel observations generated with vec_true."""
    scene = SyntheticScene(rng, n_points=n_points, n_frames=n_frames,
                           span=1.0)
    R = jnp.asarray(scene.R, jnp.float32)
    t = jnp.asarray(scene.t, jnp.float32)
    X = jnp.asarray(scene.points, jnp.float32)
    f_idx, p_idx = np.nonzero(scene.visible)
    cam = np.einsum("oij,oj->oi", scene.R[f_idx], scene.points[p_idx]) \
        + scene.t[f_idx]
    xn = cam[:, :2] / cam[:, 2:3]
    uv = project_pixels(jnp.asarray(xn, jnp.float32),
                        jnp.asarray(vec_true), model)
    mask = np.ones(len(f_idx), bool)
    return (R, t, X, jnp.asarray(f_idx.astype(np.int32)),
            jnp.asarray(p_idx.astype(np.int32)), uv, jnp.asarray(mask),
            scene)


VEC_TRUE = np.array([520.0, 505.0, 328.0, 236.0, -0.12, 0.03,
                     0.0, 0.0, 0.0], np.float32)


def test_refine_recovers_intrinsics():
    rng = np.random.default_rng(0)
    R, t, X, oc, op, uv, m, _ = _scene_obs(rng, VEC_TRUE)
    vec0 = VEC_TRUE * np.array([1.06, 0.95, 1.0, 1.0, 0.0, 0.0,
                                1.0, 1.0, 1.0], np.float32)
    vec0[2:4] += [8.0, -6.0]
    res = refine_intrinsics(R, t, X, oc, op, uv, m,
                            jnp.asarray(vec0), model="pinhole")
    assert isinstance(res, CalibResult)
    v = np.asarray(res.vec)
    # Poses/points are exact GT, observations noiseless: LM should land on
    # the generating intrinsics to f32 accuracy.
    assert np.allclose(v[:4], VEC_TRUE[:4], rtol=2e-4)
    assert abs(v[4] - VEC_TRUE[4]) < 2e-3
    assert abs(v[5] - VEC_TRUE[5]) < 5e-3
    assert float(res.cost) < 1e-3  # mean squared pixel error
    assert float(res.cost) < float(res.cost0)


def test_refine_respects_free_mask():
    rng = np.random.default_rng(1)
    R, t, X, oc, op, uv, m, _ = _scene_obs(rng, VEC_TRUE)
    vec0 = VEC_TRUE.copy()
    vec0[0] *= 1.05
    vec0[2] += 11.0  # cx also wrong, but frozen below
    free = param_indices("pinhole", ("fx",))
    res = refine_intrinsics(R, t, X, oc, op, uv, m,
                            jnp.asarray(vec0), model="pinhole", free=free)
    v = np.asarray(res.vec)
    # Frozen entries are bit-identical to the start.
    assert np.array_equal(v[1:], vec0[1:])
    # fx still improves (cx error leaks in, so not exact).
    assert abs(v[0] - VEC_TRUE[0]) < abs(vec0[0] - VEC_TRUE[0])


def test_refine_sharded_psum_parity():
    """Observation-sharded refinement == unsharded (the dist_ba pattern)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(2)
    R, t, X, oc, op, uv, m, _ = _scene_obs(rng, VEC_TRUE)
    n_dev = len(jax.devices())
    O = (len(np.asarray(oc)) // n_dev) * n_dev  # trim to divisible
    oc, op, uv, m = oc[:O], op[:O], uv[:O], m[:O]
    vec0 = jnp.asarray(VEC_TRUE * np.float32(1.03))

    ref = refine_intrinsics(R, t, X, oc, op, uv, m, vec0,
                            model="pinhole", max_iters=6)

    mesh = Mesh(np.array(jax.devices()), ("obs",))
    fn = shard_map(
        lambda oc, op, uv, m: refine_intrinsics(
            R, t, X, oc, op, uv, m, vec0, model="pinhole",
            max_iters=6, axis_name="obs").vec,
        mesh=mesh,
        in_specs=(P("obs"), P("obs"), P("obs"), P("obs")),
        out_specs=P(),
    )
    v_sh = fn(oc, op, uv, m)
    # psum changes f32 reduction grouping; parity to tolerance.
    np.testing.assert_allclose(np.asarray(v_sh), np.asarray(ref.vec),
                               rtol=2e-4, atol=2e-4)


def test_calibrate_map_alternation_improves():
    rng = np.random.default_rng(3)
    R, t, X, oc, op, uv, m, scene = _scene_obs(rng, VEC_TRUE)
    # Miscalibrated start: wrong focal AND a perturbed map (what a
    # pipeline run under the wrong intrinsics would hand us).
    vec0 = VEC_TRUE.copy()
    vec0[0] *= 1.05
    vec0[1] *= 1.05
    Xp = X + 0.01 * rng.standard_normal(X.shape).astype(np.float32)
    C = R.shape[0]
    cam_mask = jnp.ones(C, bool)
    fixed = jnp.zeros(C, bool).at[:2].set(True)
    pt_mask = jnp.ones(X.shape[0], bool)
    free = param_indices("pinhole", ("fx", "fy"))
    vec, R2, t2, X2, hist = calibrate_map(
        R, t, Xp, oc, op, uv, m, cam_mask, pt_mask, fixed,
        vec0, model="pinhole", free=free, rounds=3,
        ba_kwargs=dict(max_iters=8, pcg_iters=30,
                       huber_delta_static=2.0 / 520.0))
    v = np.asarray(vec)
    err0 = abs(vec0[0] - VEC_TRUE[0])
    assert abs(v[0] - VEC_TRUE[0]) < err0 / 3
    assert hist[-1][0] < hist[0][0] * 1.01  # pixel cost non-increasing


@pytest.mark.slow
def test_cli_reconstruct_selfcal(tmp_path, capsys):
    """CLI --selfcal wiring: features rendered through an UNMODELED lens
    (k1 = -0.10), reconstruct assumes no distortion, the post-pass must
    report refined intrinsics with k1 pulled in the correct direction.

    Magnitude is deliberately not pinned: on a smooth-orbit scene each
    landmark keeps a similar image radius across frames, so BA absorbs
    most of the distortion into structure (observability limit — the
    strong-recovery guarantees live in the fixed-structure tests above).
    """
    import json
    from test_pipeline import synthetic_features
    from fastmatch_tpu.cli import main

    rng = np.random.default_rng(5)
    scene = SyntheticScene(rng, n_points=250, n_frames=12, span=1.0)
    K1 = -0.10
    vec_true = np.array([500.0, 500.0, 320.0, 240.0, K1, 0, 0, 0, 0],
                        np.float32)
    cam3 = np.einsum("fij,pj->fpi", scene.R, scene.points) \
        + scene.t[:, None, :]
    xn = cam3[..., :2] / np.clip(cam3[..., 2:3], 1e-9, None)
    scene.pixels = np.asarray(project_pixels(
        jnp.asarray(xn, jnp.float32), jnp.asarray(vec_true), "pinhole"))
    z = cam3[..., 2]
    uv = scene.pixels
    scene.visible = ((z > 0.1) & (uv[..., 0] >= 0) & (uv[..., 0] < 640)
                     & (uv[..., 1] >= 0) & (uv[..., 1] < 480))
    feats = synthetic_features(rng, scene)
    npz = {"n_frames": len(feats), "image_size": np.array([640, 480])}
    for i, (xy, d, m) in enumerate(feats):
        npz[f"xy_{i}"], npz[f"desc_{i}"], npz[f"mask_{i}"] = xy, d, m
    inp = tmp_path / "feats.npz"
    np.savez(inp, **npz)

    main([
        "--set", "ba.interval=4", "--set", "ba.max_iters=8",
        "--set", "ba.pcg_iters=30",
        "--set", "map.max_frames=16", "--set", "map.max_points=4096",
        "--set", "map.max_obs=32768",
        "reconstruct", str(inp), "--focal", "500",
        "--selfcal", "3",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sc = rep["selfcal"]
    assert sc["dist"][0] < -0.005, rep     # k1 moved toward -0.10
    assert abs(sc["fx"] - 500.0) < 15.0, rep
    assert sc["mean_px2"] < 1.0, rep


def test_self_calibrate_reconstruction():
    """Product surface: a Reconstruction built under WRONG intrinsics,
    post-passed with self_calibrate — focal recovered, map refit."""
    from fastmatch_tpu.pipeline.config import MapConfig, PipelineConfig
    from fastmatch_tpu.pipeline.reconstruct import Reconstruction

    rng = np.random.default_rng(4)
    scene = SyntheticScene(rng, n_points=160, n_frames=8, span=1.0)
    true_cam = Pinhole.from_K(scene.K)
    vec_true = true_cam.intrinsics_vector()
    wrong = Pinhole(fx=float(vec_true[0]) * 1.06,
                    fy=float(vec_true[1]) * 1.06,
                    cx=float(vec_true[2]), cy=float(vec_true[3]))

    cfg = PipelineConfig(map=MapConfig(max_frames=16, max_points=512,
                                       max_obs=4096))
    rec = Reconstruction(cfg=cfg, camera=wrong)
    F = scene.R.shape[0]
    rec.R[:F] = scene.R
    rec.t[:F] = scene.t
    rec.pose_mask[:F] = True
    rec.n_frames = F
    vis_any = scene.visible.any(axis=0)
    ids = rec.add_points(scene.points[vis_any].astype(np.float32),
                         np.zeros((int(vis_any.sum()), 128), np.float32))
    remap = -np.ones(scene.points.shape[0], np.int64)
    remap[np.nonzero(vis_any)[0]] = ids
    wrong_vec = jnp.asarray(wrong.intrinsics_vector())
    for f in range(F):
        p = np.nonzero(scene.visible[f])[0]
        # The pipeline would have normalized the TRUE pixels with the
        # WRONG camera — reproduce exactly that.
        uv_n = normalize_pixels(
            jnp.asarray(scene.pixels[f, p], jnp.float32), wrong_vec,
            "pinhole")
        rec.add_observations(f, remap[p].astype(np.int32), np.asarray(uv_n))

    cam2, hist = self_calibrate(
        rec, wrong, cfg, rounds=3,
        free=param_indices("pinhole", ("fx", "fy")))
    err0 = abs(float(wrong.fx) - float(vec_true[0]))
    err1 = abs(float(cam2.fx) - float(vec_true[0]))
    assert err1 < err0 / 3
    # The refit map reprojects consistently under the refined camera.
    assert hist[-1][0] < hist[0][0] * 1.01
