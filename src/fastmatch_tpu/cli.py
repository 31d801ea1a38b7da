"""Command-line interface (component T22).

Subcommands:
  match       — match two descriptor files (.npy) or two images
  reconstruct — incremental SfM over an image directory / .npz features
  bench       — matching throughput benchmark (same as repo-root bench.py)
  info        — devices, mesh, versions

Config: --config YAML/JSON file + dotted --set overrides, e.g.
  fastmatch-tpu reconstruct seq/ --set ba.interval=3 --set matching.ratio=0.75
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _load_config(args):
    from fastmatch_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig()
    data = {}
    if args.config:
        text = open(args.config).read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            import yaml  # type: ignore

            data = yaml.safe_load(text)
    for kv in args.set or []:
        k, v = kv.split("=", 1)
        d = data
        parts = k.split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        try:
            d[parts[-1]] = json.loads(v)
        except json.JSONDecodeError:
            d[parts[-1]] = v

    def apply(obj, overrides):
        # Config nodes are frozen dataclasses or NamedTuples (SIFTConfig).
        if not overrides:
            return obj
        is_nt = hasattr(obj, "_fields")
        names = obj._fields if is_nt else [f.name for f in dataclasses.fields(obj)]
        kw = {}
        for name in names:
            if name in overrides:
                cur = getattr(obj, name)
                ov = overrides[name]
                kw[name] = apply(cur, ov) if isinstance(ov, dict) else ov
        unknown = set(overrides) - set(names)
        if unknown:
            raise KeyError(f"unknown config keys {sorted(unknown)} on {type(obj).__name__}")
        return obj._replace(**kw) if is_nt else dataclasses.replace(obj, **kw)

    return apply(cfg, data)


def cmd_info(args):
    import jax

    print(f"jax {jax.__version__} backend={jax.default_backend()}")
    print(f"devices: {jax.devices()}")
    print(f"process {jax.process_index()}/{jax.process_count()}")


def cmd_match(args):
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import descriptors_from_numpy
    from fastmatch_tpu.matching.matcher import match_pair

    cfg = _load_config(args)

    def load_side(path):
        if path.endswith(".npy"):
            if args.feature == "orb":
                raise ValueError("--feature orb needs image inputs "
                                 "(descriptor .npy dumps are SIFT float)")
            return None, descriptors_from_numpy(np.load(path).astype(np.float32))
        # image file: native decode + on-device features
        from fastmatch_tpu.utils.imageio import load_gray

        if args.feature == "orb":
            from fastmatch_tpu.features.orb import detect_and_describe_orb

            return detect_and_describe_orb(jnp.asarray(load_gray(path)))
        from fastmatch_tpu.features.sift import detect_and_describe

        kps, descs = detect_and_describe(jnp.asarray(load_gray(path)), cfg.sift)
        return kps, descs

    kp_a, da = load_side(args.a)
    kp_b, db = load_side(args.b)
    if args.feature == "orb":
        if args.method == "mirror":
            raise ValueError("--method mirror applies to SIFT float "
                             "descriptors; ORB matches in Hamming space")
        from fastmatch_tpu.matching.hamming import match_pair_hamming

        m = match_pair_hamming(da, db, ratio=cfg.matching.ratio,
                               cross_check=cfg.matching.cross_check)
    elif args.method == "mirror":
        from fastmatch_tpu.matching.mirror import match_pair_mirror

        m = match_pair_mirror(da, db, tau=args.mirror_tau)
    else:
        m = match_pair(da, db, ratio=cfg.matching.ratio,
                       cross_check=cfg.matching.cross_check,
                       backend=cfg.matching.backend,
                       precision=cfg.matching.precision)
    report = {}
    if args.verify != "none":
        if kp_a is None or kp_b is None:
            raise ValueError("--verify needs image inputs (keypoint coords)")
        import jax
        from fastmatch_tpu.matching.verify import verify_matches

        vr = verify_matches(jax.random.PRNGKey(0), kp_a, kp_b, m,
                            model=args.verify, thr_px=args.verify_thr)
        m = vr.matches
        report["verified"] = bool(vr.ok)
        report["model_inliers"] = int(vr.n_inliers)
    xy_a = None if kp_a is None else np.array(kp_a.xy)
    xy_b = None if kp_b is None else np.array(kp_b.xy)
    valid = np.asarray(m.valid) & np.asarray(da.mask)
    idx = np.asarray(m.idx)
    out = np.stack([np.where(valid)[0], idx[valid]], axis=1)
    if args.out:
        if xy_a is not None and xy_b is not None:
            # image inputs: also export matched pixel coordinates
            np.savez(args.out, pairs=out, xy_a=xy_a[out[:, 0]],
                     xy_b=xy_b[out[:, 1]])
        else:
            np.save(args.out, out)
    print(json.dumps({"n_matches": int(valid.sum()), "out": args.out, **report}))


def cmd_flow(args):
    """KLT tracking between two images: detect Shi-Tomasi corners on A,
    track them into B (features/klt.py), optional geometric verification
    through the same verify_matches path the descriptor matcher uses."""
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.core.containers import Keypoints, Matches
    from fastmatch_tpu.features.klt import KLTConfig, track_pair
    from fastmatch_tpu.utils.imageio import load_gray

    cfg = KLTConfig(levels=args.levels, win=args.win)
    img_a, img_b = load_gray(args.a), load_gray(args.b)
    p0, p1, status, err = track_pair(jnp.asarray(img_a), jnp.asarray(img_b),
                                     cfg, capacity=args.capacity)
    report = {"n_corners": int(np.asarray(status).shape[0]),
              "n_tracked": int(np.asarray(status).sum())}
    if args.verify != "none":
        from fastmatch_tpu.matching.verify import verify_matches

        cap = p0.shape[0]
        mk = lambda xy: Keypoints(
            xy=xy, scale=jnp.ones(cap), angle=jnp.zeros(cap),
            score=jnp.zeros(cap), mask=status)
        m = Matches(idx=jnp.arange(cap, dtype=jnp.int32),
                    dist=jnp.where(status, err, 0.0), valid=status)
        vr = verify_matches(jax.random.PRNGKey(0), mk(p0), mk(p1), m,
                            model=args.verify, thr_px=args.verify_thr)
        status = vr.matches.valid
        report["verified"] = bool(vr.ok)
        report["model_inliers"] = int(vr.n_inliers)
    st = np.asarray(status)
    if args.out:
        np.savez(args.out, xy_a=np.asarray(p0)[st], xy_b=np.asarray(p1)[st],
                 err=np.asarray(err)[st])
    mean_err = float(np.asarray(err)[st].mean()) if st.any() else 0.0
    print(json.dumps({**report, "n_final": int(st.sum()),
                      "mean_residual": round(mean_err, 5), "out": args.out}))


def cmd_stereo(args):
    """Dense rectified-stereo depth (dense/stereo.py): two images + either
    a known baseline (already-rectified rig) or a relative pose npz
    (R (3,3), t (3,)) to rectify first. Outputs disparity/depth npz and
    optionally a dense PLY point cloud."""
    import jax.numpy as jnp
    from fastmatch_tpu.dense.stereo import (StereoConfig,
                                            depth_from_disparity,
                                            disparity_to_points,
                                            rectify_pair, stereo_disparity)
    from fastmatch_tpu.utils.imageio import load_gray

    left = load_gray(args.left)
    right = load_gray(args.right)
    h, w = left.shape
    fx = args.focal if args.focal else 1.2 * max(h, w)
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
    baseline = args.baseline
    if args.pose:
        pose = np.load(args.pose)
        la, rb, info = rectify_pair(jnp.asarray(left), jnp.asarray(right),
                                    K, pose["R"], pose["t"])
        left, right = np.asarray(la), np.asarray(rb)
        baseline = info["baseline"] * (args.baseline or 1.0)
    elif baseline is None:
        raise ValueError("need --baseline (rectified rig) or --pose npz")
    cfg = StereoConfig(max_disp=args.max_disp, win=args.win)
    disp, valid = stereo_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    depth = depth_from_disparity(disp, valid, fx, baseline)
    v = np.asarray(valid)
    report = {"valid_frac": round(float(v.mean()), 4),
              "median_depth": round(float(np.median(np.asarray(depth)[v])), 4)
              if v.any() else None}
    if args.out:
        np.savez(args.out, disparity=np.asarray(disp), valid=v,
                 depth=np.asarray(depth))
        report["out"] = args.out
    if args.export_ply:
        from fastmatch_tpu.utils.export import save_ply

        pts, inten = disparity_to_points(disp, valid, K, baseline, image=left,
                                         stride=args.stride,
                                         max_depth=args.max_depth)
        save_ply(args.export_ply, pts,
                 colors=np.repeat((inten * 255).astype(np.uint8)[:, None], 3,
                                  axis=1))
        report["ply"] = args.export_ply
        report["n_points"] = int(len(pts))
    print(json.dumps(report))


def _load_features(args, cfg):
    """Feature sequence from a .npz dump or an image directory (native
    threaded prefetch + on-device SIFT). Returns (feats, camera)."""
    import glob
    import jax.numpy as jnp
    from fastmatch_tpu.core.camera import Pinhole

    if args.input.endswith(".npz"):
        data = np.load(args.input)
        n = int(data["n_frames"])
        feats = [
            (data[f"xy_{i}"], data[f"desc_{i}"], data[f"mask_{i}"]) for i in range(n)
        ]
        w, h = data["image_size"]
    else:
        # Native threaded prefetch: decode of frame k+1..k+8 overlaps the
        # device-side detection of frame k. All frames are delivered at the
        # first frame's shape (static-shape detector). Frame 0 is decoded
        # host-side once (it defines the shape) and NOT re-decoded by the
        # loader; a frame the loader skips (decode error) is a hard error —
        # silently dropping it would shift every later pose/timestamp.
        from fastmatch_tpu.utils.imageio import FrameLoader, load_gray
        from fastmatch_tpu.features.sift import detect_and_describe

        paths = sorted(glob.glob(args.input + "/*"))
        if len(paths) < 2:
            raise ValueError(
                f"{args.input}: need at least 2 frames, found {len(paths)}"
            )

        def detect(im):
            kps, descs = detect_and_describe(jnp.asarray(im), cfg.sift)
            return (np.array(kps.xy), np.array(descs.data), np.array(descs.mask))

        first = load_gray(paths[0])
        h, w = first.shape
        feats = [detect(first)]
        expected = 1
        with FrameLoader(paths[1:], size=(w, h)) as frames:
            for idx, im in frames:
                if idx + 1 != expected:
                    raise IOError(f"failed to decode {paths[expected]}")
                feats.append(detect(im))
                expected += 1
        if expected != len(paths):
            raise IOError(f"failed to decode {paths[expected]}")
    return feats, _make_camera(args, (w, h))


def _make_camera(args, size):
    """--focal/--camera-model/--dist -> camera object (center at w/2, h/2)."""
    from fastmatch_tpu.core.camera import Pinhole

    w, h = size
    fx = args.focal
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]], np.float32)
    dist = tuple(float(x) for x in args.dist.split(",")) if getattr(
        args, "dist", "") else ()
    if getattr(args, "camera_model", "pinhole") == "fisheye":
        from fastmatch_tpu.core.camera import Fisheye

        return Fisheye.from_K(K, dist)
    return Pinhole.from_K(K, dist)


def _add_camera_args(sp):
    sp.add_argument("--focal", type=float, default=500.0)
    sp.add_argument("--camera-model", choices=("pinhole", "fisheye"),
                    default="pinhole",
                    help="pinhole = Brown-Conrady distortion "
                         "(k1,k2,k3,p1,p2); fisheye = equidistant "
                         "theta-polynomial (k1,k2,k3,k4)")
    sp.add_argument("--dist", default="",
                    help="comma-separated distortion coefficients, e.g. "
                         "'-0.28,0.07' (pinhole k1,k2[,k3[,p1,p2]] or "
                         "fisheye k1[,k2[,k3[,k4]]])")


def _run_selfcal(rec, cam, cfg, rounds: int, metrics):
    """--selfcal N: in-place intrinsics refinement post-pass; returns the
    refined camera + a JSON-able summary."""
    from fastmatch_tpu.ba.calibrate import self_calibrate

    cam2, hist = self_calibrate(rec, cam, cfg, rounds=rounds,
                                metrics=metrics)
    vec = cam2.intrinsics_vector()
    return cam2, {
        "fx": round(float(vec[0]), 3), "fy": round(float(vec[1]), 3),
        "cx": round(float(vec[2]), 3), "cy": round(float(vec[3]), 3),
        "dist": [round(float(v), 6) for v in vec[4:]],
        "mean_px2": round(hist[-1][0], 6),
    }


def _run_exports(args, rec, cam):
    """--export-ply / --export-colmap on reconstruct and slam."""
    if getattr(args, "export_ply", None):
        from fastmatch_tpu.utils.export import save_ply

        save_ply(args.export_ply, rec.points[rec.pt_mask])
    if getattr(args, "export_colmap", None):
        from fastmatch_tpu.utils.export import save_colmap_text

        # The CLI always centers the principal point (w/2, h/2).
        size = (int(round(2 * float(cam.cx))),
                int(round(2 * float(cam.cy))))
        save_colmap_text(args.export_colmap, rec, cam, image_size=size)
    if getattr(args, "export_kitti", None):
        from fastmatch_tpu.utils.export import save_kitti_trajectory

        save_kitti_trajectory(args.export_kitti, rec)


def _run_gps(args, rec, cfg, metrics, frame_seq=None):
    """--gps: georegistration post-pass (pipeline/georegister.py)."""
    from fastmatch_tpu.pipeline.georegister import georegister

    data = np.load(args.gps)
    return georegister(rec, data["frames"], data["xyz"], cfg,
                       weight=args.gps_weight, prior_delta=args.gps_delta,
                       frame_seq=frame_seq, metrics=metrics)


def _add_gps_args(sp):
    sp.add_argument("--gps", metavar="NPZ",
                    help="georegister the map to GPS camera centers: npz "
                    "with 'frames' (sequence indices) and 'xyz' ((K, 3) "
                    "world positions); sim(3) alignment + GPS-anchored "
                    "pose graph + anchored BA")
    sp.add_argument("--gps-weight", type=float, default=10.0,
                    help="GPS prior information scale")
    sp.add_argument("--gps-delta", type=float, default=None,
                    help="robust width (meters) for GPS priors — set to "
                    "downweight outlier fixes (geman kernel)")


def _add_export_args(sp):
    sp.add_argument("--export-ply",
                    help="write the sparse point cloud as ASCII PLY")
    sp.add_argument("--export-colmap", metavar="DIR",
                    help="write a COLMAP sparse text model "
                         "(cameras/images/points3D.txt) into DIR")
    sp.add_argument("--export-kitti",
                    help="write the trajectory in KITTI odometry format "
                         "(3x4 cam-to-world per line)")


def cmd_reconstruct(args):
    from fastmatch_tpu.pipeline.reconstruct import reconstruct

    cfg = _load_config(args)
    feats, cam = _load_features(args, cfg)
    metrics = None
    if args.metrics:
        from fastmatch_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger(path=args.metrics)
    from fastmatch_tpu.utils.metrics import profile_trace

    with profile_trace(args.profile_dir):
        if getattr(args, "mode", "incremental") == "global":
            from fastmatch_tpu.pipeline.global_sfm import global_reconstruct

            rec = global_reconstruct(feats, cam, cfg, metrics=metrics,
                                     window=args.window)
        else:
            rec = reconstruct(feats, cam, cfg, metrics=metrics)
    selfcal = None
    if args.selfcal:
        cam, selfcal = _run_selfcal(rec, cam, cfg, args.selfcal, metrics)
    gps = None
    if args.gps:
        gps = _run_gps(args, rec, cfg, metrics)
    if metrics:
        metrics.close()
    centers = rec.camera_centers()
    if args.out:
        np.savez(
            args.out, centers=centers, R=rec.R[: rec.n_frames],
            t=rec.t[: rec.n_frames], points=rec.points[rec.pt_mask],
        )
    if args.checkpoint:
        from fastmatch_tpu.pipeline.checkpoint import save_map

        save_map(rec, args.checkpoint)
    _run_exports(args, rec, cam)
    print(
        json.dumps(
            {
                "n_frames": rec.n_frames,
                "n_points": int(rec.pt_mask.sum()),
                "n_obs": rec.n_obs,
                "out": args.out,
                **({"selfcal": selfcal} if selfcal else {}),
                **({"gps": gps} if gps else {}),
            }
        )
    )


def cmd_vo(args):
    """KLT visual odometry over an image directory (pipeline/vo.py)."""
    import glob
    import jax.numpy as jnp
    from fastmatch_tpu.features.klt import KLTConfig
    from fastmatch_tpu.pipeline.vo import VOConfig, visual_odometry
    from fastmatch_tpu.utils.imageio import FrameLoader, load_gray

    cfg = _load_config(args)
    paths = sorted(glob.glob(args.input + "/*"))
    if len(paths) < 2:
        raise ValueError(f"{args.input}: need >= 2 frames, got {len(paths)}")
    first = load_gray(paths[0])
    h, w = first.shape
    cam = _make_camera(args, (w, h))
    vo = VOConfig(capacity=args.capacity,
                  bootstrap_px=args.bootstrap_px, kf_px=args.kf_px,
                  klt=KLTConfig(levels=args.levels))
    metrics = None
    if args.metrics:
        from fastmatch_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger(path=args.metrics)

    def frames():
        yield first
        with FrameLoader(paths[1:], size=(w, h)) as fl:
            for _, img in fl:
                yield img

    if args.right:
        # Rectified stereo rig: metric VO, no bootstrap/scale gauge
        # (pipeline/stereo_vo.py).
        from fastmatch_tpu.pipeline.stereo_vo import (
            StereoVOConfig, stereo_visual_odometry)

        rpaths = sorted(glob.glob(args.right + "/*"))
        if len(rpaths) != len(paths):
            raise ValueError(
                f"--right: {len(rpaths)} frames vs {len(paths)} left")
        rfirst = load_gray(rpaths[0])

        def rframes():
            yield rfirst
            with FrameLoader(rpaths[1:], size=(w, h)) as fl:
                for _, img in fl:
                    yield img

        svo = StereoVOConfig(capacity=args.capacity,
                             klt=KLTConfig(levels=args.levels))
        rec = stereo_visual_odometry(frames(), rframes(), cam,
                                     args.baseline, cfg, svo,
                                     metrics=metrics)
    elif args.engine == "scan":
        # Scan mode needs the full stack up front (one device upload).
        from fastmatch_tpu.pipeline.vo_scan import visual_odometry_scan

        rec = visual_odometry_scan(list(frames()), cam, cfg, vo,
                                   metrics=metrics)
    else:
        rec = visual_odometry(frames(), cam, cfg, vo, metrics=metrics)
    if metrics:
        metrics.close()
    centers = rec.camera_centers()
    if args.out:
        np.savez(args.out, centers=centers, R=rec.R[: rec.n_frames],
                 t=rec.t[: rec.n_frames], points=rec.points[rec.pt_mask])
    _run_exports(args, rec, cam)
    n_kf = sum(1 for s in rec.frame_stats if s.get("kf"))
    n_fail = sum(1 for s in rec.frame_stats if s.get("pnp_failed"))
    print(json.dumps({"n_frames": rec.n_frames, "n_keyframes": n_kf,
                      "n_points": int(rec.pt_mask.sum()),
                      "n_obs": rec.n_obs, "pnp_failures": n_fail,
                      "out": args.out}))


def cmd_densify(args):
    """Dense mapping (dense/densify.py): stereo-sweep selected frame pairs
    of a posed sequence, fuse into one world-frame colored cloud."""
    import glob
    from fastmatch_tpu.dense.densify import densify
    from fastmatch_tpu.dense.stereo import StereoConfig
    from fastmatch_tpu.utils.export import save_ply
    from fastmatch_tpu.utils.imageio import FrameLoader, load_gray

    traj = np.load(args.traj)
    R, t = traj["R"], traj["t"]
    sparse = traj["points"] if "points" in traj.files else None
    paths = sorted(glob.glob(args.input + "/*"))
    if len(paths) < R.shape[0]:
        raise ValueError(f"{len(paths)} images < {R.shape[0]} poses")
    first = load_gray(paths[0])
    h, w = first.shape
    images = [first]
    with FrameLoader(paths[1:R.shape[0]], size=(w, h)) as fl:
        for _, img in fl:
            images.append(img)
    fx = args.focal
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]])
    pts, inten, rep = densify(
        images, R, t, K, sparse_points=sparse,
        cfg=StereoConfig(max_disp=args.max_disp, win=args.win),
        stride=args.stride, voxel=args.voxel)
    if args.export_ply:
        save_ply(args.export_ply, pts,
                 colors=np.repeat((np.clip(inten, 0, 1)
                                   * 255).astype(np.uint8)[:, None], 3, 1))
        rep["ply"] = args.export_ply
    print(json.dumps(rep))


def cmd_vialign(args):
    """Visual-inertial metric upgrade (sensors/imu.py): align a monocular
    trajectory npz (vo/reconstruct/slam --out) with IMU sample runs and
    write the metric, gravity-aligned version."""
    import jax
    import jax.numpy as jnp
    from fastmatch_tpu.sensors.imu import preintegrate, vi_align

    traj = np.load(args.traj)
    R_wc, t = traj["R"].astype(np.float32), traj["t"].astype(np.float32)
    F = R_wc.shape[0]
    imu = np.load(args.imu)
    gyro, accel, dts = (imu["gyro"].astype(np.float32),
                        imu["accel"].astype(np.float32),
                        imu["dt"].astype(np.float32))
    interval = imu["interval"].astype(np.int64)  # sample -> frame interval i
    if interval.max() != F - 2:
        raise ValueError(
            f"imu intervals cover 0..{interval.max()}, trajectory needs "
            f"0..{F - 2}")
    cap = int(np.bincount(interval, minlength=F - 1).max())
    g_b = np.zeros((F - 1, cap, 3), np.float32)
    a_b = np.zeros((F - 1, cap, 3), np.float32)
    d_b = np.zeros((F - 1, cap), np.float32)
    m_b = np.zeros((F - 1, cap), bool)
    fill = np.zeros(F - 1, np.int64)
    for s, i in enumerate(interval):
        k = fill[i]
        g_b[i, k], a_b[i, k], d_b[i, k] = gyro[s], accel[s], dts[s]
        m_b[i, k] = True
        fill[i] += 1
    pres = jax.vmap(preintegrate)(jnp.asarray(g_b), jnp.asarray(a_b),
                                  jnp.asarray(d_b), jnp.asarray(m_b))
    centers = -np.einsum("fji,fj->fi", R_wc, t)
    s, g, v, resid = vi_align(
        jnp.asarray(R_wc.transpose(0, 2, 1)),
        jnp.asarray(centers.astype(np.float32)), pres, g_mag=args.g)
    s = float(s)
    g_np = np.asarray(g, np.float64)
    a = g_np / np.linalg.norm(g_np)
    b = np.array([0.0, 0.0, -1.0])
    vx = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(vx) < 1e-12:
        R_g = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        K = np.array([[0, -vx[2], vx[1]], [vx[2], 0, -vx[0]],
                      [-vx[1], vx[0], 0]])
        R_g = np.eye(3) + K + K @ K / (1.0 + c)
    R_new = np.einsum("fij,kj->fik", R_wc, R_g).astype(np.float32)
    t_new = (s * t).astype(np.float32)
    out = {"R": R_new, "t": t_new,
           "centers": -np.einsum("fji,fj->fi", R_new, t_new)}
    if "points" in traj.files:
        out["points"] = (s * (traj["points"] @ R_g.T)).astype(np.float32)
    np.savez(args.out, **out)
    print(json.dumps({"scale": round(s, 6),
                      "gravity": [round(float(x), 4) for x in g_np],
                      "resid": round(float(resid), 6), "out": args.out}))


def _parse_mesh(spec: str) -> dict:
    """'bank=4' / 'data=2,bank=4' -> {'n_data': 2, 'n_bank': 4}."""
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in ("data", "bank") or not v.strip().isdigit():
            raise SystemExit(f"bad --mesh spec {spec!r}; use e.g. "
                             "'bank=4' or 'data=2,bank=4'")
        out["n_" + k] = int(v)
    return out


def cmd_slam(args):
    from fastmatch_tpu.pipeline.slam import SlamConfig, slam

    cfg = _load_config(args)
    scfg = SlamConfig(
        window=args.window,
        loop_gap=args.loop_gap,
        loop_min_votes=args.loop_min_votes,
    )
    feats, cam = _load_features(args, cfg)
    metrics = None
    if args.metrics:
        from fastmatch_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger(path=args.metrics)
    engine = args.engine
    if engine == "auto":
        import jax

        engine = "device" if jax.default_backend() != "cpu" else "host"
    if args.mesh:
        # Config-5 product path: sharded retrieval + distributed BA +
        # overlap + periodic checkpoint on a (data, bank) mesh.
        from fastmatch_tpu.dist.pipeline import DistConfig, slam_distributed

        dcfg = DistConfig(
            **_parse_mesh(args.mesh),
            checkpoint_dir=args.checkpoint,
            checkpoint_interval=args.checkpoint_interval,
            overlap=not args.no_overlap,
        )
        out = slam_distributed(feats, cam, cfg, scfg, dcfg, metrics=metrics,
                               resume_from=args.resume)
    elif engine == "device":
        from fastmatch_tpu.pipeline.slam_device import slam_device

        out = slam_device(feats, cam, cfg, scfg, metrics=metrics)
    elif engine == "scan":
        # Offline mapping: the whole sequence as ONE compiled lax.scan —
        # no per-frame dispatch, no in-loop closure (pipeline/slam_scan.py).
        from fastmatch_tpu.pipeline.slam_scan import slam_scan

        out = slam_scan(feats, cam, cfg, scfg, metrics=metrics)
    elif engine == "chunked":
        # Near-online: K-frame compiled scans with online loop closure
        # between chunks (correction latency < K frames).
        from fastmatch_tpu.pipeline.slam_scan import slam_chunked

        out = slam_chunked(feats, cam, cfg, scfg, chunk=args.chunk,
                           metrics=metrics)
    else:
        out = slam(feats, cam, cfg, scfg, metrics=metrics)
    rec = out.rec
    selfcal = None
    if args.selfcal:
        cam, selfcal = _run_selfcal(rec, cam, cfg, args.selfcal, metrics)
    gps = None
    if args.gps:
        gps = _run_gps(args, rec, cfg, metrics, frame_seq=out.frame_seq)
    if metrics:
        metrics.close()
    if args.out:
        np.savez(
            args.out, centers=rec.camera_centers(), R=rec.R[: rec.n_frames],
            t=rec.t[: rec.n_frames], points=rec.points[rec.pt_mask],
        )
    if args.trajectory:
        _write_tum(args.trajectory, rec)
    if args.plot:
        from fastmatch_tpu.utils.viz import plot_trajectory

        plot_trajectory(rec.camera_centers(), args.plot)
    if args.checkpoint:
        from fastmatch_tpu.pipeline.checkpoint import save_map

        save_map(rec, args.checkpoint)
    _run_exports(args, rec, cam)
    print(
        json.dumps(
            {
                "n_frames": rec.n_frames,
                "n_points": int(rec.pt_mask.sum()),
                "loop_closures": len(out.loop_edges),
                "pgo_runs": out.pgo_runs,
                "out": args.out,
                **({"selfcal": selfcal} if selfcal else {}),
                **({"gps": gps} if gps else {}),
            }
        )
    )


def _write_tum(path, rec):
    """Dump the trajectory in TUM format (ts tx ty tz qx qy qz qw) —
    consumable by datasets.load_tum_trajectory and standard ATE tooling."""
    def quat_xyzw(R):
        t = np.trace(R)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                             (R[1, 0] - R[0, 1]) / s, 0.25 * s])
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        q[3] = (R[k, j] - R[j, k]) / s
        return q

    with open(path, "w") as fh:
        fh.write("# ts tx ty tz qx qy qz qw\n")
        for f in range(rec.n_frames):
            Rwc = rec.R[f].T  # camera-to-world
            c = -Rwc @ rec.t[f]
            q = quat_xyzw(Rwc)
            fh.write(f"{float(f):.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
                     f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def _load_traj(path: str) -> np.ndarray:
    """(N, 3) camera centers from an --out npz (``centers``) or a
    TUM-format text trajectory."""
    if path.endswith(".npz"):
        return np.load(path)["centers"]
    from fastmatch_tpu.datasets import load_tum_trajectory

    return load_tum_trajectory(path)[1]


def cmd_evaluate(args):
    cfg = _load_config(args)
    if args.dataset == "traj":
        # Trajectory evaluation: ATE (sim3-aligned absolute error) + RPE
        # (per-step drift) of an estimated trajectory vs ground truth.
        import jax.numpy as jnp
        from fastmatch_tpu.utils.evaluation import ate_rmse, rpe_trans

        est = _load_traj(args.est)
        gt = _load_traj(args.gt)
        if len(est) != len(gt):
            raise ValueError(f"length mismatch: est {len(est)} vs gt "
                             f"{len(gt)} frames (trajectories must be "
                             "frame-aligned)")
        ate = float(ate_rmse(jnp.asarray(est), jnp.asarray(gt)))
        rpe_rmse, rpe_med = rpe_trans(jnp.asarray(est), jnp.asarray(gt),
                                      delta=args.rpe_delta)
        print(json.dumps({"n_frames": int(len(est)), "ate_rmse": ate,
                          "rpe_rmse": float(rpe_rmse),
                          "rpe_median": float(rpe_med),
                          "rpe_delta": args.rpe_delta}))
        return
    from fastmatch_tpu.datasets import (
        evaluate_pairs,
        load_vgg_dataset,
        synthesize_warped_pair,
    )
    if args.dataset == "synth":
        pairs = [synthesize_warped_pair(seed) for seed in range(args.n_synth)]
    else:
        pairs = load_vgg_dataset(args.dataset)
    size = (args.resize, args.resize) if args.resize else None
    results, agg = evaluate_pairs(
        pairs, sift_cfg=cfg.sift, ratio=cfg.matching.ratio, tol=args.tol,
        backend=cfg.matching.backend, size=size, plot_dir=args.plot_dir,
    )
    for r in results:
        print(json.dumps(r))
    print(json.dumps({"aggregate": agg}))


def cmd_locate(args):
    """Localize frames against a prebuilt map (kidnapped-robot query):
    the ANN big-bank product path for city-scale maps, exact matcher below
    the crossover (pipeline/localize.py); --retrieval K switches to the
    hierarchical path (VLAD place recognition -> match only the retrieved
    keyframes' landmarks, pipeline/retrieval.py)."""
    cfg = _load_config(args)
    feats, cam = _load_features(args, cfg)
    if args.retrieval > 0:
        from fastmatch_tpu.pipeline.retrieval import (
            build_keyframe_db, localize_hierarchical, map_from_checkpoint)

        md = map_from_checkpoint(args.map)
        db = build_keyframe_db(md, n_words=args.vocab_words)

        def _localize(xy, d, m):
            return localize_hierarchical(md, db, xy, d, m, cam,
                                         topk=args.retrieval,
                                         thr_px=args.thr_px)
        mode = {"retrieval": args.retrieval}
    else:
        from fastmatch_tpu.pipeline.localize import (
            localize, map_index_from_checkpoint)

        index = map_index_from_checkpoint(
            args.map, ann_threshold=args.ann_threshold)

        def _localize(xy, d, m):
            return localize(index, xy, d, m, cam, thr_px=args.thr_px)
        mode = {"ann": index.ivf is not None}
    frames = range(len(feats)) if args.frame < 0 else [args.frame]
    n_ok = 0
    for k in frames:
        xy, d, m = feats[k]
        r = _localize(xy, d, m)
        ok = bool(r.ok)
        n_ok += ok
        print(json.dumps({
            "frame": int(k), "ok": ok,
            "n_matches": int(r.n_matches), "n_inliers": int(r.n_inliers),
            "R": np.asarray(r.R).tolist() if ok else None,
            "t": np.asarray(r.t).tolist() if ok else None,
        }))
    print(json.dumps({"localized": n_ok, "of": len(list(frames)), **mode}))
    return 0 if n_ok else 1


def cmd_merge(args):
    """Merge two saved maps into one (pipeline/merge.py): cross-localize
    map B's keyframes in map A via the VLAD retrieval stack, recover the
    Sim(3) gauge between the sessions, dedup shared landmarks, optional
    joint BA; writes a merged map checkpoint."""
    from fastmatch_tpu.pipeline.checkpoint import save_map
    from fastmatch_tpu.pipeline.merge import merge_maps, rec_from_checkpoint

    w, h = args.width, args.height
    K = np.array([[args.focal, 0, w / 2], [0, args.focal, h / 2],
                  [0, 0, 1.0]], np.float32)
    from fastmatch_tpu.core.camera import Pinhole

    cam = Pinhole.from_K(K)
    rec_a = rec_from_checkpoint(args.map_a, cam)
    rec_b = rec_from_checkpoint(args.map_b, cam)
    merged, info = merge_maps(
        rec_a, rec_b, thr_px=args.thr_px, topk=args.retrieval,
        stride=args.stride, refine=not args.no_refine)
    if args.out:
        save_map(merged, args.out)
        info["out"] = args.out
    _run_exports(args, merged, cam)
    info["n_frames"] = int(merged.n_frames)
    info["n_points"] = int(merged.n_points)
    print(json.dumps(info))
    return 0


def cmd_serve(args):
    """Serve localization queries over a prebuilt map (pipeline/serve.py):
    map + IVF index built once, query path compiled before the socket
    opens, then stdlib HTTP until interrupted."""
    from fastmatch_tpu.core.camera import Pinhole
    from fastmatch_tpu.pipeline.serve import serve

    w, h = args.width, args.height
    K = np.array([[args.focal, 0, w / 2], [0, args.focal, h / 2],
                  [0, 0, 1.0]], np.float32)
    dist = tuple(float(x) for x in args.dist.split(",")) if args.dist else ()
    if args.camera_model == "fisheye":
        from fastmatch_tpu.core.camera import Fisheye

        cam = Fisheye.from_K(K, dist)
    else:
        cam = Pinhole.from_K(K, dist)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "map": args.map}), flush=True)
    serve(args.map, cam, host=args.host, port=args.port,
          ann_threshold=args.ann_threshold, thr_px=args.thr_px)


def cmd_bench(args):
    import runpy
    import os

    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
        run_name="__main__",
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="fastmatch-tpu")
    p.add_argument("--config", help="YAML/JSON config file")
    p.add_argument("--set", action="append", help="dotted config override k=v")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("info")
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("match")
    sp.add_argument("a")
    sp.add_argument("b")
    sp.add_argument("--out")
    sp.add_argument("--verify", default="none",
                    choices=["none", "fundamental", "homography"],
                    help="geometric verification filter (image inputs only; "
                         "essential needs intrinsics — use the library API)")
    sp.add_argument("--method", choices=("ratio", "mirror"), default="ratio",
                    help="ratio = Lowe top-2 + cross-check; mirror = "
                         "joint-distinctiveness mutual matching "
                         "(matching/mirror.py, no ratio test)")
    sp.add_argument("--mirror-tau", type=float, default=1.0,
                    help="mirror self-distance gate scale")
    sp.add_argument("--feature", choices=("sift", "orb"), default="sift",
                    help="descriptor family (image inputs): sift = float "
                         "L2 matching; orb = FAST+rBRIEF 256-bit binary, "
                         "Hamming matching on the MXU (features/orb.py)")
    sp.add_argument("--verify-thr", type=float, default=3.0,
                    help="inlier threshold in pixels for --verify")
    sp.set_defaults(fn=cmd_match)

    sp = sub.add_parser(
        "flow", help="KLT: Shi-Tomasi corners on A tracked into B "
        "(features/klt.py) — the small-baseline front-end")
    sp.add_argument("a")
    sp.add_argument("b")
    sp.add_argument("--out", help=".npz of (xy_a, xy_b, err) for live tracks")
    sp.add_argument("--capacity", type=int, default=1024,
                    help="corner capacity (power of two)")
    sp.add_argument("--levels", type=int, default=3)
    sp.add_argument("--win", type=int, default=11)
    sp.add_argument("--verify", default="none",
                    choices=["none", "fundamental", "homography"],
                    help="geometric verification filter on the tracks")
    sp.add_argument("--verify-thr", type=float, default=3.0)
    sp.set_defaults(fn=cmd_flow)

    sp = sub.add_parser(
        "stereo", help="dense rectified-stereo depth (dense/stereo.py): "
        "ZNCC shift-sweep cost volume, subpixel WTA, LR check")
    sp.add_argument("left")
    sp.add_argument("right")
    sp.add_argument("--baseline", type=float,
                    help="rig baseline in world units (rectified inputs)")
    sp.add_argument("--pose", help=".npz with R (3,3), t (3,): rectify "
                    "the pair first (t scale sets the depth unit unless "
                    "--baseline also given as a scale factor)")
    sp.add_argument("--focal", type=float, help="fx in px (default 1.2*max(h,w))")
    sp.add_argument("--max-disp", type=int, default=64)
    sp.add_argument("--win", type=int, default=9)
    sp.add_argument("--out", help="output .npz (disparity, valid, depth)")
    sp.add_argument("--export-ply", help="dense colored point cloud PLY")
    sp.add_argument("--stride", type=int, default=2,
                    help="PLY subsample stride")
    sp.add_argument("--max-depth", type=float, default=float("inf"))
    sp.set_defaults(fn=cmd_stereo)

    sp = sub.add_parser(
        "vo", help="KLT visual odometry over an image dir (pipeline/vo.py):"
        " flow-tracked landmarks + PnP, keyframed triangulation + BA")
    sp.add_argument("input", help="image directory (sorted lexically)")
    _add_camera_args(sp)
    sp.add_argument("--capacity", type=int, default=512,
                    help="track slots (KLT compile shape)")
    sp.add_argument("--levels", type=int, default=3, help="KLT pyramid levels")
    sp.add_argument("--bootstrap-px", type=float, default=20.0)
    sp.add_argument("--kf-px", type=float, default=12.0)
    sp.add_argument("--engine", choices=("host", "scan"), default="host",
                    help="host: per-frame driver loop; scan: the whole "
                    "post-bootstrap sequence as ONE compiled lax.scan "
                    "(pipeline/vo_scan.py)")
    sp.add_argument("--right", metavar="DIR",
                    help="rectified right-image directory: METRIC stereo "
                    "VO (pipeline/stereo_vo.py) — landmarks lifted via "
                    "dense stereo, no bootstrap, no scale drift")
    sp.add_argument("--baseline", type=float, default=0.12,
                    help="stereo baseline (world units) for --right")
    sp.add_argument("--out", help="trajectory/points .npz")
    sp.add_argument("--metrics", help="JSONL metrics path")
    _add_export_args(sp)
    sp.set_defaults(fn=cmd_vo)

    sp = sub.add_parser(
        "densify", help="dense mapping (dense/densify.py): stereo-sweep "
        "frame pairs of a posed sequence into a fused world cloud")
    sp.add_argument("input", help="image directory (sorted lexically)")
    sp.add_argument("--traj", required=True,
                    help=".npz from vo/reconstruct --out (R, t[, points])")
    sp.add_argument("--focal", type=float, default=500.0)
    sp.add_argument("--max-disp", type=int, default=64)
    sp.add_argument("--win", type=int, default=9)
    sp.add_argument("--stride", type=int, default=2)
    sp.add_argument("--voxel", type=float,
                    help="fusion grid (world units; default depth/200)")
    sp.add_argument("--export-ply", help="output PLY path")
    sp.set_defaults(fn=cmd_densify)

    sp = sub.add_parser(
        "vialign", help="visual-inertial metric upgrade (sensors/imu.py): "
        "align a monocular trajectory with IMU runs -> metric, "
        "gravity-aligned npz")
    sp.add_argument("--traj", required=True,
                    help="trajectory .npz (R, t[, points]) from vo/"
                    "reconstruct/slam --out")
    sp.add_argument("--imu", required=True,
                    help=".npz with gyro (N,3), accel (N,3) raw specific "
                    "force, dt (N,), interval (N,) mapping each sample to "
                    "frame interval i (frames i -> i+1)")
    sp.add_argument("--g", type=float, default=9.81,
                    help="gravity magnitude (m/s^2)")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_vialign)

    sp = sub.add_parser("reconstruct")
    sp.add_argument("input", help="image dir or features .npz")
    _add_camera_args(sp)
    sp.add_argument("--mode", choices=["incremental", "global"],
                    default="incremental",
                    help="incremental SfM (default) or global SfM "
                    "(rotation + translation averaging over the view "
                    "graph, one global BA — pipeline/global_sfm.py)")
    sp.add_argument("--window", type=int, default=8,
                    help="global mode: match each frame against the "
                    "next N frames (view-graph density; keep >= 4 for "
                    "parallel rigidity)")
    sp.add_argument("--out")
    sp.add_argument("--checkpoint")
    sp.add_argument("--metrics", help="write JSONL metrics here")
    sp.add_argument("--profile-dir",
                    help="capture a jax.profiler trace here (tensorboard)")
    sp.add_argument("--selfcal", type=int, default=0, metavar="N",
                    help="self-calibration post-pass: N rounds of "
                    "intrinsics refinement alternated with global BA "
                    "(ba/calibrate.py); refined intrinsics reported in "
                    "the JSON output")
    _add_gps_args(sp)
    _add_export_args(sp)
    sp.set_defaults(fn=cmd_reconstruct)

    sp = sub.add_parser("slam")
    sp.add_argument("input", help="image dir or features .npz")
    _add_camera_args(sp)
    sp.add_argument("--window", type=int, default=8)
    sp.add_argument("--loop-gap", type=int, default=12)
    sp.add_argument("--loop-min-votes", type=int, default=25)
    sp.add_argument("--engine",
                    choices=("auto", "device", "host", "scan", "chunked"),
                    default="auto",
                    help="device = one fused jitted step/frame (default on "
                    "TPU); host = round-1 orchestrated loop; scan = whole "
                    "sequence as ONE compiled scan (offline); chunked = "
                    "K-frame scans with online loop closure between "
                    "chunks (near-online at scan speed)")
    sp.add_argument("--chunk", type=int, default=16,
                    help="with --engine chunked: frames per compiled scan "
                    "(loop-closure latency bound)")
    sp.add_argument("--mesh",
                    help="multi-chip config-5 pipeline, e.g. 'bank=4' or "
                    "'data=1,bank=8': ring-sharded retrieval + distributed "
                    "BA + overlap on a (data, bank) device mesh")
    sp.add_argument("--no-overlap", action="store_true",
                    help="with --mesh: disable retrieval/BA overlap "
                    "(serial schedule, identical results)")
    sp.add_argument("--checkpoint-interval", type=int, default=0,
                    help="with --mesh: snapshot TrackState every N accepted "
                    "frames into --checkpoint (resumable via --resume)")
    sp.add_argument("--resume",
                    help="with --mesh: resume from a --checkpoint dir "
                    "(bit-deterministic continuation)")
    sp.add_argument("--out")
    sp.add_argument("--plot", help="write a top-down trajectory PNG here")
    sp.add_argument("--trajectory", help="write TUM-format trajectory here")
    sp.add_argument("--checkpoint")
    sp.add_argument("--metrics", help="write JSONL metrics here")
    sp.add_argument("--selfcal", type=int, default=0, metavar="N",
                    help="self-calibration post-pass: N rounds of "
                    "intrinsics refinement alternated with global BA")
    _add_gps_args(sp)
    _add_export_args(sp)
    sp.set_defaults(fn=cmd_slam)

    sp = sub.add_parser("locate")
    sp.add_argument("map", help="map checkpoint dir (slam/reconstruct "
                    "--checkpoint output)")
    sp.add_argument("input", help="feature .npz or image directory")
    _add_camera_args(sp)
    sp.add_argument("--frame", type=int, default=-1,
                    help="localize only this frame (-1 = all)")
    sp.add_argument("--thr-px", type=float, default=2.0)
    sp.add_argument("--ann-threshold", type=int, default=None,
                    help="bank rows above which the IVF index is used "
                    "(default: measured ~100k crossover; 0 forces IVF)")
    sp.add_argument("--retrieval", type=int, default=0, metavar="K",
                    help="hierarchical mode: retrieve top-K keyframes by "
                    "VLAD place recognition, match only their landmarks "
                    "(0 = flat search over the whole bank)")
    sp.add_argument("--vocab-words", type=int, default=64,
                    help="VLAD vocabulary size for --retrieval")
    sp.set_defaults(fn=cmd_locate)

    sp = sub.add_parser("merge")
    sp.add_argument("map_a", help="map checkpoint dir (kept gauge)")
    sp.add_argument("map_b", help="map checkpoint dir (re-gauged into A)")
    sp.add_argument("--out", help="merged map checkpoint dir")
    sp.add_argument("--focal", type=float, default=500.0)
    sp.add_argument("--width", type=int, default=640)
    sp.add_argument("--height", type=int, default=480)
    sp.add_argument("--thr-px", type=float, default=2.0)
    sp.add_argument("--retrieval", type=int, default=4, metavar="K",
                    help="keyframes retrieved per cross-localization")
    sp.add_argument("--stride", type=int, default=1,
                    help="localize every Nth frame of map B")
    sp.add_argument("--no-refine", action="store_true",
                    help="skip the joint BA over the merged map")
    _add_export_args(sp)
    sp.set_defaults(fn=cmd_merge)

    sp = sub.add_parser("serve")
    sp.add_argument("map", help="map checkpoint dir (slam/reconstruct "
                    "--checkpoint output)")
    _add_camera_args(sp)
    sp.add_argument("--width", type=int, default=640)
    sp.add_argument("--height", type=int, default=480)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8080)
    sp.add_argument("--thr-px", type=float, default=2.0)
    sp.add_argument("--ann-threshold", type=int, default=None,
                    help="bank rows above which the IVF index is used")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("evaluate")
    sp.add_argument(
        "dataset",
        help="Oxford-VGG sequence dir (img1..imgN + H1to*p), 'synth', or "
        "'traj' (trajectory ATE/RPE vs ground truth: --est/--gt)",
    )
    sp.add_argument("--n-synth", type=int, default=3)
    sp.add_argument("--tol", type=float, default=3.0)
    sp.add_argument("--resize", type=int, default=0)
    sp.add_argument("--plot-dir",
                    help="render per-pair match figures + a summary "
                    "precision/recall chart here (utils/viz.py)")
    sp.add_argument("--est", help="traj mode: estimated trajectory "
                    "(--out .npz with 'centers', or TUM text)")
    sp.add_argument("--gt", help="traj mode: ground-truth trajectory "
                    "(same formats)")
    sp.add_argument("--rpe-delta", type=int, default=1,
                    help="traj mode: RPE frame distance")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("bench")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
