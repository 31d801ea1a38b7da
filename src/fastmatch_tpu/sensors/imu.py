"""IMU preintegration and visual-inertial alignment as XLA ops.

Extends the engine to the visual-inertial setting: gyro/accel samples
between keyframes are PREINTEGRATED into relative-motion pseudo-
measurements (Forster et al.'s on-manifold formulation), and a linear
alignment step recovers the metric scale, gravity direction, and
per-keyframe velocities that a monocular SfM/SLAM map cannot observe
(core/lie.py Sim3 handles the scale re-anchoring). No reference
counterpart exists — the mount is empty (SURVEY.md §0); this is the
standard sensor-fusion companion of the BASELINE.json:5 SLAM north star.

TPU-first mapping:

- **Preintegration is one `lax.scan`** over the sample stream (midpoint
  integration entirely in SO3 x R^3 x R^3); keyframe intervals of
  varying sample counts are handled by a samples mask, not dynamic
  shapes, and a batch of intervals vmaps.
- **Bias Jacobians ride the same scan**: d(dR)/d(bg), d(dv)/d(b.),
  d(dp)/d(b.) accumulate in closed form alongside the state, so factors
  can be bias-corrected at solve time without re-integration (the
  Forster trick — re-integration per LM iteration would serialize the
  optimizer on host round trips).
- **vi_align is one dense least squares**: unknowns (scale s, gravity g,
  velocities v_i) are linear in the preintegration constraints given
  camera poses; the normal equations build as one einsum batch and
  solve with a (3F+4, 3F+4) Cholesky — MXU work, no iteration. Gravity
  magnitude is then renormalized to ``g_mag`` (soft constraint, the
  standard two-step VI initialization).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fastmatch_tpu.core.lie import SO3, hat


class ImuPreintegration(NamedTuple):
    """Preintegrated motion over one keyframe interval (body frame of the
    interval's FIRST keyframe). Leading batch axes allowed."""

    dR: jnp.ndarray      # (3, 3) rotation delta
    dv: jnp.ndarray      # (3,) velocity delta (gravity-free)
    dp: jnp.ndarray      # (3,) position delta (gravity-free)
    dt: jnp.ndarray      # () total duration
    # bias Jacobians (first-order correction around the integration bias)
    dR_dbg: jnp.ndarray  # (3, 3)  d log(dR) / d gyro-bias
    dv_dbg: jnp.ndarray  # (3, 3)
    dv_dba: jnp.ndarray  # (3, 3)
    dp_dbg: jnp.ndarray  # (3, 3)
    dp_dba: jnp.ndarray  # (3, 3)


@functools.partial(jax.jit, static_argnames=())
def preintegrate(gyro: jnp.ndarray, accel: jnp.ndarray, dts: jnp.ndarray,
                 mask: jnp.ndarray | None = None,
                 bias_g: jnp.ndarray | None = None,
                 bias_a: jnp.ndarray | None = None) -> ImuPreintegration:
    """Integrate an IMU sample run into a relative-motion measurement.

    gyro/accel: (N, 3) body-frame samples (rad/s, m/s^2 INCLUDING the
    gravity reaction — i.e. raw accelerometer readings); dts: (N,)
    per-sample durations; mask: (N,) live samples (False rows are
    no-ops — fixed-capacity keyframe intervals). Biases are subtracted
    before integration; the returned Jacobians correct factors for small
    bias updates without re-integrating.

    Batch of intervals: vmap over a leading axis of every argument.
    """
    if mask is None:
        mask = jnp.ones(gyro.shape[0], bool)
    if bias_g is None:
        bias_g = jnp.zeros(3)
    if bias_a is None:
        bias_a = jnp.zeros(3)
    w = (gyro - bias_g) * mask[:, None]
    a = (accel - bias_a) * mask[:, None]
    dts = dts * mask

    def step(c, x):
        dR, dv, dp, t, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba = c
        wi, ai, dt = x
        Rinc = SO3.exp(wi * dt)
        # Midpoint-free (Euler on the manifold, the Forster convention):
        # accel rotated by the PRE-update dR.
        acc_w = dR @ ai
        dp_new = dp + dv * dt + 0.5 * acc_w * dt * dt
        dv_new = dv + acc_w * dt
        # Bias Jacobians (first order, same recursion as the state):
        A = dR @ hat(ai)
        dp_dbg_n = dp_dbg + dv_dbg * dt - 0.5 * A @ dR_dbg * dt * dt
        dp_dba_n = dp_dba + dv_dba * dt - 0.5 * dR * dt * dt
        dv_dbg_n = dv_dbg - A @ dR_dbg * dt
        dv_dba_n = dv_dba - dR * dt
        # d log(dR)/dbg recursion: Rinc^T dR_dbg - Jr(w dt) dt
        Jr = _right_jacobian(wi * dt)
        dR_dbg_n = Rinc.T @ dR_dbg - Jr * dt
        dR_new = dR @ Rinc
        return (dR_new, dv_new, dp_new, t + dt,
                dR_dbg_n, dv_dbg_n, dv_dba_n, dp_dbg_n, dp_dba_n), None

    I3 = jnp.eye(3)
    Z3 = jnp.zeros((3, 3))
    init = (I3, jnp.zeros(3), jnp.zeros(3), jnp.zeros(()),
            Z3, Z3, Z3, Z3, Z3)
    (dR, dv, dp, t, dR_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba), _ = \
        jax.lax.scan(step, init, (w, a, dts))
    return ImuPreintegration(dR=dR, dv=dv, dp=dp, dt=t, dR_dbg=dR_dbg,
                             dv_dbg=dv_dbg, dv_dba=dv_dba, dp_dbg=dp_dbg,
                             dp_dba=dp_dba)


def _right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO3 right Jacobian Jr(w) (series-stable near 0)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    W = hat(w)
    small = th2 < 1e-12
    c1 = jnp.where(small, 0.5, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-24))
    c2 = jnp.where(small, 1.0 / 6.0,
                   (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-24))
    return jnp.eye(3) - c1 * W + c2 * (W @ W)


def predict(Ri, pi, vi, pre: ImuPreintegration, g: jnp.ndarray):
    """Propagate keyframe state i through a preintegrated interval.

    Ri: (3, 3) body->world, pi/vi: (3,) world. Returns (Rj, pj, vj).
    """
    dt = pre.dt
    Rj = Ri @ pre.dR
    vj = vi + g * dt + Ri @ pre.dv
    pj = pi + vi * dt + 0.5 * g * dt * dt + Ri @ pre.dp
    return Rj, pj, vj


def apply_vi_alignment(rec, pres: ImuPreintegration, g_mag: float = 9.81):
    """Metric-upgrade a monocular Reconstruction in place from IMU data.

    ``pres``: ImuPreintegration batch over consecutive FRAME intervals
    (leading axis rec.n_frames - 1; camera frame == body frame). Runs
    vi_align on the reconstruction's poses, then applies the ONE global
    similarity that makes the map metric and gravity-aligned (new world:
    scale in meters, gravity along -z): X' = s * R_g X, per-pose
    R' = R R_g^T, t' = s t — projections are preserved exactly (every
    x_cam scales by s, a no-op on pixels).

    Returns dict(scale, gravity, resid) for reporting; velocities are
    recomputed in the new frame on demand via vi_align if needed.
    """
    import numpy as np

    F = rec.n_frames
    R_wc = np.asarray(rec.R[:F])                   # world->cam
    R_wb = jnp.asarray(R_wc.transpose(0, 2, 1))    # body(cam)->world
    centers = -np.einsum("fji,fj->fi", R_wc, np.asarray(rec.t[:F]))
    s, g, v, resid = vi_align(R_wb, jnp.asarray(centers.astype(np.float32)),
                              pres, g_mag=g_mag)
    s = float(s)
    g_np = np.asarray(g, np.float64)
    # Minimal rotation taking the estimated gravity to (0, 0, -g_mag).
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
    rec.R[:F] = np.einsum("fij,kj->fik", R_wc, R_g).astype(np.float32)
    rec.t[:F] = (s * np.asarray(rec.t[:F])).astype(np.float32)
    live = rec.pt_mask
    rec.points[live] = (s * (np.asarray(rec.points[live]) @ R_g.T)).astype(
        np.float32)
    return dict(scale=s, gravity=[float(x) for x in g_np],
                resid=float(resid))


def vi_align(R_wb: jnp.ndarray, p_cam: jnp.ndarray, pres: ImuPreintegration,
             g_mag: float = 9.81):
    """Monocular visual-inertial initialization: solve scale, gravity, and
    velocities from camera poses + preintegrated IMU intervals.

    R_wb: (F, 3, 3) body-to-world rotations of the keyframes (from the
    vision pipeline, already in the body frame); p_cam: (F, 3) keyframe
    positions in the UNSCALED monocular frame; pres: ImuPreintegration
    batch with leading axis F-1 (interval i -> i+1).

    Returns (s, g, v (F, 3), resid): metric scale s (p_metric = s *
    p_cam), world gravity g (renormalized to g_mag), per-keyframe
    velocities, and the post-solve RMS residual of the constraint system.

    Linear system per interval (unknowns s, g, v_i all linear):
        s*p_{i+1} = s*p_i + v_i dt + 0.5 g dt^2 + R_i dp_i
        v_{i+1}   = v_i + g dt + R_i dv_i
    """
    F = p_cam.shape[0]
    dts = pres.dt                        # (F-1,)
    n_unk = 1 + 3 + 3 * F                # s, g, v_0..v_{F-1}
    I3 = jnp.eye(3)

    def vcol(i):
        return 4 + 3 * i

    # Assemble dense (6*(F-1), n_unk); F is static under jit/trace.
    A = jnp.zeros((6 * (F - 1), n_unk))
    b = jnp.zeros(6 * (F - 1))
    for i in range(F - 1):
        dt = dts[i]
        r0 = 6 * i
        # position rows
        A = A.at[r0:r0 + 3, 0].set(p_cam[i + 1] - p_cam[i])
        A = A.at[r0:r0 + 3, 1:4].set(-0.5 * dt * dt * I3)
        A = A.at[r0:r0 + 3, vcol(i):vcol(i) + 3].set(-dt * I3)
        b = b.at[r0:r0 + 3].set(R_wb[i] @ pres.dp[i])
        # velocity rows
        A = A.at[r0 + 3:r0 + 6, 1:4].set(-dt * I3)
        A = A.at[r0 + 3:r0 + 6, vcol(i):vcol(i) + 3].set(-I3)
        A = A.at[r0 + 3:r0 + 6, vcol(i + 1):vcol(i + 1) + 3].set(I3)
        b = b.at[r0 + 3:r0 + 6].set(R_wb[i] @ pres.dv[i])
    AtA = A.T @ A + 1e-8 * jnp.eye(n_unk)
    Atb = A.T @ b
    x = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(AtA), Atb)
    s = x[0]
    g = x[1:4]
    v = x[4:].reshape(F, 3)
    resid = jnp.sqrt(jnp.mean((A @ x - b) ** 2))
    # Renormalize gravity to the known magnitude (the scale/gravity
    # ambiguity along g is weakly observable on short runs).
    g = g * (g_mag / jnp.maximum(jnp.linalg.norm(g), 1e-9))
    return s, g, v, resid
