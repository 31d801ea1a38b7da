"""Self-calibration: intrinsics refinement against the reconstructed map.

The rest of the engine works in NORMALIZED image coordinates — intrinsics
are divided out at ingestion (core/camera.normalize_pixels) and BA never
sees them. That is the right TPU design for tracking (the per-frame step
stays model-agnostic and intrinsics-free), but it means calibration errors
are frozen in. This module closes that gap with a post-pass:

1. Recover the raw PIXEL observations from the stored normalized ones by
   pushing them through the current model's exact forward projection
   (``core/camera.project_pixels`` is the inverse of ``normalize_pixels``
   by construction — same polynomial, opposite direction).
2. LM over the packed (9,) intrinsics vector: residuals are pixel
   reprojection errors of the CURRENT map (poses/points held fixed per
   step); the 9-parameter Jacobian comes from one ``jax.jacfwd`` — a
   (O, 2, 9) tensor whose normal equations are a 9x9 solve, trivially
   dense and TPU-friendly. Frozen parameters (``free`` mask) get zeroed
   Jacobian columns + unit damping, so the solve stays well-posed.
3. Alternate with standard BA (block coordinate descent): refit
   intrinsics -> renormalize observations -> BA over poses/points ->
   repeat. Each block solve is the existing compiled machinery; the
   alternation is a short host loop.

Observability caveats (documented, tested): monocular sequences determine
focal length only through perspective effects — pure-forward or low-
parallax motion leaves fx near-gauge and the refinement will honestly
return it unchanged rather than inventing precision. Principal point and
tangential terms are the weakest; they default to frozen.

No reference counterpart (arnfred/Fast-Match is a 2D matching research
repo; calibration is out of its scope) — this is north-star SLAM/SfM
completeness (BASELINE.json:5 extensions).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fastmatch_tpu.ba.lm import ba_solve
from fastmatch_tpu.ba.problem import BAProblem, Observations
from fastmatch_tpu.core.camera import normalize_pixels, project_pixels
from fastmatch_tpu.core.lie import SE3

# Default free-parameter sets by model: focal + center + two radial
# terms. k3/p1/p2 (pinhole) and k3/k4 (fisheye) are near-unobservable on
# typical SLAM coverage and stay frozen unless the caller opts in.
_DEFAULT_FREE = {
    "pinhole": (0, 1, 2, 3, 4, 5),
    "fisheye": (0, 1, 2, 3, 4, 5),
}

_PARAM_NAMES = {
    "pinhole": ("fx", "fy", "cx", "cy", "k1", "k2", "k3", "p1", "p2"),
    "fisheye": ("fx", "fy", "cx", "cy", "k1", "k2", "k3", "k4", "-"),
}


class CalibResult(NamedTuple):
    vec: jnp.ndarray        # (9,) refined packed intrinsics
    cost0: jnp.ndarray      # mean squared pixel error before
    cost: jnp.ndarray       # ... and after
    iters: jnp.ndarray
    accepted: jnp.ndarray


class _CalState(NamedTuple):
    vec: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray
    it: jnp.ndarray
    accepted: jnp.ndarray
    done: jnp.ndarray


def param_indices(model: str, names) -> tuple:
    """Map parameter names (e.g. ("fx", "k1")) to packed-vector indices."""
    table = _PARAM_NAMES[model]
    return tuple(table.index(n) for n in names)


@partial(jax.jit, static_argnames=("model", "free", "max_iters",
                                   "huber_px", "axis_name"))
def refine_intrinsics(
    R: jnp.ndarray,          # (C, 3, 3) world->camera rotations
    t: jnp.ndarray,          # (C, 3)
    points: jnp.ndarray,     # (P, 3)
    obs_cam: jnp.ndarray,    # (O,) int32
    obs_pt: jnp.ndarray,     # (O,) int32
    uv_px: jnp.ndarray,      # (O, 2) PIXEL observations
    obs_mask: jnp.ndarray,   # (O,) bool
    vec0: jnp.ndarray,       # (9,) packed intrinsics start
    model: str = "pinhole",
    free: tuple = None,
    max_iters: int = 12,
    huber_px: float = 2.0,
    axis_name: str | None = None,
) -> CalibResult:
    """LM over the packed intrinsics vector with the map held fixed.

    Residuals: ``project_pixels(x/z, vec) - uv_px`` per live observation
    (cheirality-gated: rows with z <= 0 get zero weight), Huber-weighted
    in pixels. The 9x9 normal equations are psum-reduced over
    ``axis_name`` when set, so observation-sharded distributed refinement
    reuses this function unchanged (same pattern as dist/dist_ba.py).
    """
    free = _DEFAULT_FREE[model] if free is None else free
    fmask = jnp.zeros(9, jnp.float32).at[jnp.asarray(free)].set(1.0)

    Xc = jnp.einsum("oij,oj->oi", R[obs_cam], points[obs_pt]) + t[obs_cam]
    z = Xc[..., 2]
    w_geom = (obs_mask & (z > 1e-6)).astype(jnp.float32)
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    xn = Xc[..., :2] / zs[..., None]

    def residuals(vec):
        return project_pixels(xn, vec, model) - uv_px

    def weighted_cost(r):
        e2 = jnp.sum(r * r, axis=-1)
        if huber_px and huber_px > 0:
            d2 = jnp.float32(huber_px * huber_px)
            rho = jnp.where(e2 <= d2, e2,
                            2.0 * jnp.sqrt(d2 * jnp.maximum(e2, 1e-12)) - d2)
            w_rob = jnp.where(
                e2 <= d2, 1.0,
                jnp.sqrt(d2 / jnp.maximum(e2, 1e-12)))
        else:
            rho, w_rob = e2, jnp.ones_like(e2)
        csum = jnp.sum(w_geom * rho)
        cnt = jnp.sum(w_geom)
        if axis_name is not None:
            csum = jax.lax.psum(csum, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
        return csum / jnp.maximum(cnt, 1.0), w_geom * w_rob

    def normal_eq(vec):
        r = residuals(vec)
        J = jax.jacfwd(residuals)(vec)              # (O, 2, 9)
        _, w = weighted_cost(r)
        J = J * fmask                                # freeze columns
        A = jnp.einsum("o,oik,oil->kl", w, J, J)
        g = jnp.einsum("o,oik,oi->k", w, J, r)
        if axis_name is not None:
            A = jax.lax.psum(A, axis_name)
            g = jax.lax.psum(g, axis_name)
        return A, g

    cost0, _ = weighted_cost(residuals(vec0))

    def body(s: _CalState) -> _CalState:
        A, g = normal_eq(s.vec)
        # Marquardt damping on free params; frozen rows get identity so
        # the 9x9 stays SPD and their update is exactly zero (g is zero
        # there because the J columns are zeroed).
        diag = jnp.diag(A) * fmask
        damp = s.lam * jnp.maximum(diag, 1e-6) + (1.0 - fmask)
        step = jnp.linalg.solve(A + jnp.diag(damp), g) * fmask
        new_vec = s.vec - step
        new_cost, _ = weighted_cost(residuals(new_vec))
        accept = new_cost < s.cost
        vec = jnp.where(accept, new_vec, s.vec)
        lam = jnp.clip(jnp.where(accept, s.lam * 0.5, s.lam * 4.0),
                       1e-9, 1e6)
        rel = jnp.abs(s.cost - new_cost) / jnp.maximum(s.cost, 1e-12)
        return _CalState(vec, lam,
                         jnp.where(accept, new_cost, s.cost),
                         s.it + 1,
                         s.accepted + accept.astype(jnp.int32),
                         accept & (rel < 1e-9))

    init = _CalState(vec0, jnp.float32(1e-3), cost0, jnp.int32(0),
                     jnp.int32(0), jnp.bool_(False))
    fin = jax.lax.while_loop(
        lambda s: (s.it < max_iters) & ~s.done, body, init)
    return CalibResult(vec=fin.vec, cost0=cost0, cost=fin.cost,
                       iters=fin.it, accepted=fin.accepted)


def recover_pixels(obs_uv_norm: jnp.ndarray, vec: jnp.ndarray,
                   model: str) -> jnp.ndarray:
    """Stored normalized observations -> the raw pixels they came from
    (exact forward projection through the model that normalized them)."""
    return project_pixels(obs_uv_norm, vec, model)


def calibrate_map(
    R, t, points, obs_cam, obs_pt, uv_px, obs_mask,
    cam_mask, pt_mask, fixed_cams,
    vec0, model="pinhole", free=None, rounds: int = 3,
    huber_px: float = 2.0, ba_kwargs: dict | None = None,
):
    """Alternating self-calibration: intrinsics LM <-> pose/point BA.

    Block coordinate descent over ({intrinsics}, {poses, points}): each
    round refits the packed vector against the current map, renormalizes
    the pixel observations with it, and runs one standard BA. Both block
    solves decrease the SAME pixel-reprojection objective (BA minimizes it
    in normalized coords, a fixed positive rescale per round), so the
    alternation is monotone in practice; ``rounds`` is a short host loop
    over already-compiled solves.

    Returns (vec, R, t, points, history) where history is a list of
    (cal_cost_px2, ba_cost) per round.
    """
    ba_kwargs = dict(ba_kwargs or {})
    vec = jnp.asarray(vec0, jnp.float32)
    history = []
    for _ in range(rounds):
        res = refine_intrinsics(R, t, points, obs_cam, obs_pt, uv_px,
                                obs_mask, vec, model=model, free=free,
                                huber_px=huber_px)
        vec = res.vec
        uv_n = normalize_pixels(uv_px, vec, model)
        prob = BAProblem(
            poses=SE3(jnp.asarray(R), jnp.asarray(t)),
            points=jnp.asarray(points),
            obs=Observations(jnp.asarray(obs_cam), jnp.asarray(obs_pt),
                             uv_n, jnp.asarray(obs_mask)),
            cam_mask=jnp.asarray(cam_mask),
            pt_mask=jnp.asarray(pt_mask),
            fixed_cams=jnp.asarray(fixed_cams),
        )
        ba = ba_solve(prob, **ba_kwargs)
        R, t, points = ba.poses.R, ba.poses.t, ba.points
        history.append((float(res.cost), float(ba.cost)))
    return vec, R, t, points, history


def self_calibrate(rec, camera, cfg, rounds: int = 3, free=None,
                   metrics=None):
    """Product-level post-pass over a host Reconstruction (the object
    reconstruct()/slam() return): refine intrinsics against the final
    map, update poses/points/observations in place, and return the
    refined camera (same model class, new parameters).

    The Reconstruction stores normalized observations; pixels are
    recovered exactly through the current model first (see module
    docstring). ``cfg``: the PipelineConfig used to build the map (BA
    budgets + Huber width are reused)."""
    model = getattr(camera, "model", "pinhole")
    vec0 = jnp.asarray(camera.intrinsics_vector())
    fixed = np.zeros_like(rec.pose_mask)
    fixed[:2] = True
    # Live observations are an append-ordered prefix of the capacity
    # table; a power-of-two bucket slice drops the padding before upload
    # (same rationale as run_ba's compact_obs, done in numpy here).
    B = 512
    while B < rec.n_obs:
        B *= 2
    B = min(B, rec.obs_mask.shape[0])
    uv_px = recover_pixels(jnp.asarray(rec.obs_uv[:B]), vec0, model)
    vec, R, t, X, history = calibrate_map(
        jnp.asarray(rec.R), jnp.asarray(rec.t), jnp.asarray(rec.points),
        jnp.asarray(rec.obs_cam[:B]), jnp.asarray(rec.obs_pt[:B]),
        uv_px, jnp.asarray(rec.obs_mask[:B]),
        jnp.asarray(rec.pose_mask), jnp.asarray(rec.pt_mask),
        jnp.asarray(fixed & rec.pose_mask),
        vec0, model=model, free=free, rounds=rounds,
        huber_px=cfg.ba.huber_px,
        ba_kwargs=dict(max_iters=cfg.ba.max_iters,
                       pcg_iters=cfg.ba.pcg_iters,
                       huber_delta_static=cfg.ba.huber_px
                       / float(vec0[0])),
    )
    rec.R = np.array(R)
    rec.t = np.array(t)
    rec.points = np.array(X)
    rec.obs_uv = rec.obs_uv.copy()
    rec.obs_uv[:B] = np.array(normalize_pixels(uv_px, vec, model))
    vec_np = np.asarray(vec)
    if metrics:
        metrics.log("self_calibrate", rounds=rounds,
                    cost_px2=history[-1][0],
                    vec=[float(v) for v in vec_np])
    names = _PARAM_NAMES[model]
    kw = {n: float(vec_np[i]) for i, n in enumerate(names) if n != "-"}
    return type(camera)(**kw), history
