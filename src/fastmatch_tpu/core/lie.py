"""SO(3)/SE(3) Lie-group operations, vectorization-friendly.

All functions are pure, broadcast over arbitrary leading batch axes, and are
safe under ``jit`` / ``vmap`` / ``grad``: the small-angle branches use the
"double-where" pattern so no NaN leaks through gradients at theta -> 0.

Representation choices (TPU-first):
- rotations are 3x3 matrices (dense, MXU-friendly; no quaternion
  renormalization drift inside long ``lax.while_loop`` optimizer bodies);
- SE(3) is (R, t); tangent vectors are twists ``[v, omega]`` (translation
  first, rotation second), matching the Jacobian column layout used by the
  bundle adjustment and pose-graph layers.

Used by: geometry (L4), ba (L5), posegraph (L6). Capability spec:
BASELINE.json configs 3-5 (pose estimation, incremental BA, pose-graph SLAM).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


class SO3:
    """Static namespace of SO(3) ops on 3x3 rotation matrices."""

    @staticmethod
    def exp(w: jnp.ndarray) -> jnp.ndarray:
        """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
        theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
        small = theta2 < _EPS
        # Double-where: sqrt gets a safe argument so the *unselected* branch
        # stays NaN-free under grad (d sqrt/dx -> inf at 0).
        theta2_safe = jnp.where(small, 1.0, theta2)
        theta = jnp.sqrt(theta2_safe)
        W = hat(w)
        W2 = W @ W
        # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks.
        a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
        b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
        return eye + a * W + b * W2

    @staticmethod
    def log(R: jnp.ndarray) -> jnp.ndarray:
        """(..., 3, 3) rotation -> (..., 3) axis-angle (|w| <= pi).

        theta comes from atan2(|skew part|, (trace-1)/2), which is well
        conditioned everywhere; near pi the axis is recovered from the
        symmetric part (R + R^T)/2 - cos*I = (1-cos) aa^T instead of the
        vanishing skew part.
        """
        w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
        sn2 = jnp.sum(w_skew * w_skew, axis=-1)
        trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
        cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
        # Near-identity detection must avoid theta (whose sqrt has a NaN grad
        # at 0 and would leak through jnp.where under autodiff): sn2 small
        # AND cos > 0 (sn2 is also small near pi).
        small = (sn2 < 1e-12) & (cos_t > 0.0)
        sn2_safe = jnp.where(small, 1.0, sn2)  # double-where for grad safety
        sin_norm = jnp.sqrt(sn2_safe)
        theta = jnp.arctan2(sin_norm, cos_t)
        near_pi = theta > 2.7  # ~0.86*pi: switch before sin(theta) degrades
        # Generic branch: (theta / sin(theta)) * w_skew; near identity
        # theta ~ sin ~ sqrt(sn2), so scale ~ 1 + sn2/6 (theta-free Taylor).
        scale = jnp.where(small, 1.0 + sn2 / 6.0, theta / sin_norm)
        w_generic = scale[..., None] * w_skew
        # Near-pi branch: B = (R + R^T)/2 - cos*I = (1 - cos) aa^T; take the
        # column with the largest diagonal (best-conditioned), normalize, and
        # align its sign with the (still nonzero for theta < pi) skew part.
        S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
        B = S - cos_t[..., None, None] * jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
        diagB = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
        k = jnp.argmax(diagB, axis=-1)
        col = jnp.take_along_axis(jnp.swapaxes(B, -1, -2), k[..., None, None], axis=-2)[..., 0, :]
        cn2 = jnp.sum(col * col, axis=-1, keepdims=True)
        axis = col / jnp.sqrt(jnp.where(cn2 < _EPS * _EPS, 1.0, cn2))
        sign = jnp.where(jnp.sum(axis * w_skew, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
        w_pi = theta[..., None] * axis * sign
        return jnp.where(near_pi[..., None], w_pi, w_generic)

    @staticmethod
    def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
        """SO(3) left Jacobian J_l(w): (..., 3) -> (..., 3, 3)."""
        theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
        small = theta2 < _EPS
        theta2_safe = jnp.where(small, 1.0, theta2)
        theta = jnp.sqrt(theta2_safe)
        W = hat(w)
        W2 = W @ W
        b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
        c = jnp.where(
            small,
            1.0 / 6.0 - theta2 / 120.0,
            (theta - jnp.sin(theta)) / (theta2_safe * theta),
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
        return eye + b * W + c * W2


class SE3(NamedTuple):
    """Rigid transform: x_world = R @ x_local + t.

    R: (..., 3, 3) rotation; t: (..., 3) translation. Twists are
    ``[v, omega]`` with translation first.
    """

    R: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=()) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,))
        return SE3(R, t)

    @staticmethod
    def exp(twist: jnp.ndarray) -> "SE3":
        """(..., 6) twist [v, omega] -> SE3."""
        v, w = twist[..., :3], twist[..., 3:]
        R = SO3.exp(w)
        V = SO3.left_jacobian(w)
        t = jnp.einsum("...ij,...j->...i", V, v)
        return SE3(R, t)

    def log(self) -> jnp.ndarray:
        """SE3 -> (..., 6) twist [v, omega]."""
        w = SO3.log(self.R)
        V = SO3.left_jacobian(w)
        v = jnp.linalg.solve(V, self.t[..., None])[..., 0]
        return jnp.concatenate([v, w], axis=-1)

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply ``other`` first)."""
        R = self.R @ other.R
        t = jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t
        return SE3(R, t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform (..., 3) points (batch axes broadcast)."""
        return jnp.einsum("...ij,...j->...i", self.R, points) + self.t

    def retract(self, twist: jnp.ndarray) -> "SE3":
        """Left-multiplicative update: exp(twist) ∘ self (the BA/PGO retraction)."""
        return SE3.exp(twist).compose(self)


def _sim3_W(w: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) translation mixer W(w, sigma) = integral_0^1 e^{sigma u} exp(u w^) du.

    Closed form W = C I + A w^ + B (w^)^2 with coefficients depending on
    theta = |w| and sigma (derived by integrating the Rodrigues expansion of
    exp(u w^) against e^{sigma u}; verified against numeric quadrature in
    tests/test_core.py). Small-theta / small-sigma regimes use Taylor
    fallbacks with the module's double-where pattern (no NaN under grad).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    t_small = theta2 < _EPS
    s_small = sigma * sigma < _EPS
    theta2_safe = jnp.where(t_small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    sigma_safe = jnp.where(s_small, 1.0, sigma)
    # expm1/half-angle forms throughout: the naive (e^sigma - 1), (1 - cos)
    # and (1 - s*cos) differences lose ~sigma^-1 * ulp relative accuracy in
    # f32 for small-but-not-tiny arguments (measured 1e-4 log/exp roundtrip
    # error at sigma ~ 2e-4 before this), far above the Taylor thresholds.
    em1 = jnp.expm1(sigma)                       # e^sigma - 1, accurate
    s = em1 + 1.0
    one_m_cos = 2.0 * jnp.sin(0.5 * theta) ** 2  # 1 - cos(theta), accurate
    c = sigma * sigma + theta2
    c_safe = jnp.where(t_small & s_small, 1.0, c)

    # C = int e^{sigma u} du = expm1(sigma)/sigma
    C = jnp.where(s_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  em1 / sigma_safe)
    # A = (1/theta) int e^{sigma u} sin(u theta) du
    a_sin = s * jnp.sin(theta)
    # 1 - s*cos(theta) = (1 - cos) - expm1(sigma)*cos  (no 1-vs-1 subtraction)
    one_m_b = one_m_cos - em1 * jnp.cos(theta)
    A_gen = (a_sin * sigma + one_m_b * theta) / (theta * c_safe)
    A_tsmall = jnp.where(
        s_small, 0.5 + sigma / 3.0,
        # int e^{sigma u} u du = (sigma*s - expm1(sigma)) / sigma^2
        (sigma * s - em1) / (sigma_safe * sigma_safe))
    A = jnp.where(t_small, A_tsmall, A_gen)
    # B = (1/theta^2) int e^{sigma u} (1 - cos(u theta)) du = (C - I_cos)/theta^2
    I_cos_gen = (-one_m_b * sigma + a_sin * theta) / c_safe
    B_gen = (C - I_cos_gen) / theta2_safe
    B_tsmall = jnp.where(
        s_small, 1.0 / 6.0 + sigma / 8.0,
        # int e^{sigma u} u^2/2 du = (s*(sigma^2/2 - sigma) + expm1)/sigma^3
        (s * (0.5 * sigma * sigma - sigma) + em1)
        / (sigma_safe * sigma_safe * sigma_safe))
    B = jnp.where(t_small, B_tsmall, B_gen)

    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return (C[..., None, None] * eye + A[..., None, None] * W
            + B[..., None, None] * W2)


class Sim3(NamedTuple):
    """Similarity transform: x_world = s * R @ x_local + t.

    R: (..., 3, 3); t: (..., 3); s: (...,) positive scale. Tangent vectors
    are (..., 7) ``[rho, omega, sigma]`` — translation, rotation, log-scale
    — extending the SE3 twist layout with a trailing scale slot (so the
    first 6 columns of Sim3 Jacobians line up with SE3's).

    The monocular-SLAM drift group: a camera-only reconstruction is
    determined up to similarity, so loop-closure corrections that must
    absorb scale drift live in Sim(3), not SE(3) (posegraph/sim3.py).
    """

    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray

    @staticmethod
    def identity(batch_shape=()) -> "Sim3":
        return Sim3(jnp.broadcast_to(jnp.eye(3), batch_shape + (3, 3)),
                    jnp.zeros(batch_shape + (3,)),
                    jnp.ones(batch_shape))

    @staticmethod
    def from_se3(T: SE3, s=None) -> "Sim3":
        if s is None:
            s = jnp.ones(T.t.shape[:-1], T.t.dtype)
        return Sim3(T.R, T.t, jnp.asarray(s))

    def se3(self) -> SE3:
        """Drop scale (fold NOTHING — callers rescale t/points explicitly)."""
        return SE3(self.R, self.t)

    @staticmethod
    def exp(tangent: jnp.ndarray) -> "Sim3":
        """(..., 7) [rho, omega, sigma] -> Sim3."""
        rho, w, sigma = tangent[..., :3], tangent[..., 3:6], tangent[..., 6]
        R = SO3.exp(w)
        W = _sim3_W(w, sigma)
        t = jnp.einsum("...ij,...j->...i", W, rho)
        return Sim3(R, t, jnp.exp(sigma))

    def log(self) -> jnp.ndarray:
        """Sim3 -> (..., 7) [rho, omega, sigma]."""
        w = SO3.log(self.R)
        sigma = jnp.log(self.s)
        W = _sim3_W(w, sigma)
        rho = jnp.linalg.solve(W, self.t[..., None])[..., 0]
        return jnp.concatenate([rho, w, sigma[..., None]], axis=-1)

    def compose(self, other: "Sim3") -> "Sim3":
        """self ∘ other (apply ``other`` first)."""
        R = self.R @ other.R
        t = self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t
        return Sim3(R, t, self.s * other.s)

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        inv_s = 1.0 / self.s
        return Sim3(Rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t),
                    inv_s)

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        return (self.s[..., None]
                * jnp.einsum("...ij,...j->...i", self.R, points) + self.t)

    def retract(self, tangent: jnp.ndarray) -> "Sim3":
        """Left-multiplicative update exp(tangent) ∘ self."""
        return Sim3.exp(tangent).compose(self)


def se3_adjoint(g: SE3) -> jnp.ndarray:
    """Adjoint matrix Ad_g: (..., 6, 6) for twist order [v, omega]."""
    R, t = g.R, g.t
    top = jnp.concatenate([R, hat(t) @ R], axis=-1)
    zeros = jnp.zeros_like(R)
    bot = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
