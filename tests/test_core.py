"""L0 unit tests: Lie ops, camera, containers (SURVEY.md §5.2 "Unit" tier)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastmatch_tpu.core.lie import SE3, SO3, hat, vee, se3_adjoint
from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.core.containers import descriptors_from_numpy, pad_to_capacity


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # Norms uniform in (0, 3.0) — inside the principal branch |w| < pi.
        d = rng.standard_normal((64, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        w = d * rng.uniform(0.01, 3.0, size=(64, 1))
        R = SO3.exp(jnp.asarray(w))
        w2 = SO3.log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=5e-4)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-10, 0, 0], [0.0, 0, 0]])
        R = SO3.exp(w)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-8)

    def test_exp_is_rotation(self, rng):
        w = jnp.asarray(rng.standard_normal((32, 3)) * 3.0)
        R = SO3.exp(w)
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        w = (np.pi - 1e-6) * axis
        R = SO3.exp(jnp.asarray(w[None]))
        w2 = np.asarray(SO3.log(R))[0]
        np.testing.assert_allclose(np.abs(w2 @ axis), np.pi - 1e-6, atol=1e-3)

    def test_left_jacobian_fd(self, rng):
        # J_l(w) column k ~ d/de log-coords of exp(w + e ek) exp(w)^-1... use
        # the defining identity exp(w + dw) ~ exp(J_l dw) exp(w).
        w = jnp.asarray(rng.standard_normal(3))
        J = SO3.left_jacobian(w)
        eps = 1e-5
        for k in range(3):
            dw = jnp.zeros(3).at[k].set(eps)
            lhs = SO3.exp(w + dw)
            rhs = SO3.exp(J @ dw) @ SO3.exp(w)
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)

    def test_grad_no_nan_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(SO3.exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        tw = rng.standard_normal((32, 6))
        # Keep the rotation part inside the principal branch.
        wn = np.linalg.norm(tw[:, 3:], axis=1, keepdims=True)
        tw[:, 3:] *= np.minimum(1.0, 2.8 / np.maximum(wn, 1e-9))
        g = SE3.exp(jnp.asarray(tw))
        np.testing.assert_allclose(np.asarray(g.log()), tw, atol=1e-3)

    def test_compose_inverse(self, rng):
        a = SE3.exp(jnp.asarray(rng.standard_normal((8, 6))))
        b = a.compose(a.inverse())
        np.testing.assert_allclose(np.asarray(b.t), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        g = SE3.exp(jnp.asarray(rng.standard_normal(6)))
        p = jnp.asarray(rng.standard_normal((16, 3)))
        out = g.apply(p)
        expected = (np.asarray(g.R) @ np.asarray(p).T).T + np.asarray(g.t)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_adjoint_identity(self, rng):
        # Ad_g twist == log(g exp(twist) g^-1) for small twists
        g = SE3.exp(jnp.asarray(rng.standard_normal(6) * 0.5))
        tw = jnp.asarray(rng.standard_normal(6) * 1e-3)
        lhs = se3_adjoint(g) @ tw
        rhs = g.compose(SE3.exp(tw)).compose(g.inverse()).log()
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_hat_vee(self, rng):
        w = jnp.asarray(rng.standard_normal((5, 3)))
        np.testing.assert_allclose(np.asarray(vee(hat(w))), np.asarray(w))


class TestCamera:
    def test_project_center(self):
        cam = Pinhole.from_K(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))
        uv = cam.project(jnp.array([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [320.0, 240.0])

    def test_project_unproject(self, rng):
        cam = Pinhole.from_K(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))
        pts = jnp.asarray(np.abs(rng.standard_normal((32, 3))) + np.array([0, 0, 1.0]))
        uv = cam.project(pts)
        rays = cam.unproject(uv)
        scaled = rays * pts[..., 2:3]
        np.testing.assert_allclose(np.asarray(scaled), np.asarray(pts), rtol=1e-5)


class TestContainers:
    def test_pad_and_mask(self, rng):
        d = rng.standard_normal((100, 128)).astype(np.float32)
        desc = descriptors_from_numpy(d, capacity=256)
        assert desc.capacity == 256
        assert int(desc.count()) == 100
        np.testing.assert_array_equal(np.asarray(desc.data[:100]), d)
        np.testing.assert_array_equal(np.asarray(desc.data[100:]), 0.0)

    def test_truncation(self, rng):
        d = rng.standard_normal((300, 128)).astype(np.float32)
        desc = descriptors_from_numpy(d, capacity=256)
        assert int(desc.count()) == 256

    def test_pad_shape_error(self):
        with pytest.raises(ValueError):
            descriptors_from_numpy(np.zeros((5, 64), np.float32))

    def test_pad_to_capacity_mask(self):
        arr = np.ones((3, 2), np.float32)
        p, m = pad_to_capacity(arr, 8)
        assert p.shape == (8, 2) and m.sum() == 3


class TestDistortion:
    def test_project_unproject_roundtrip(self):
        import numpy as np
        cam = Pinhole(fx=500.0, fy=480.0, cx=320.0, cy=240.0,
                      k1=-0.25, k2=0.08)
        rng = np.random.default_rng(0)
        pts = np.column_stack([
            rng.uniform(-1.0, 1.0, (200, 2)), rng.uniform(1.0, 5.0, 200),
        ]).astype(np.float32)
        pix = cam.project(jnp.asarray(pts))
        rays = cam.unproject(pix)
        xn_gt = pts[:, :2] / pts[:, 2:3]
        err = np.abs(np.asarray(rays)[:, :2] - xn_gt).max()
        assert err < 1e-5, f"undistortion fixed point off by {err}"

    def test_zero_distortion_is_identity(self):
        import numpy as np
        cam = Pinhole(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
        pix = jnp.asarray(np.array([[10.0, 20.0], [600.0, 400.0]], np.float32))
        rays = cam.unproject(pix)
        expect = (np.asarray(pix) - [320.0, 240.0]) / 500.0
        np.testing.assert_allclose(np.asarray(rays)[:, :2], expect, atol=1e-7)


class TestBatchedLinalg:
    """Fixed-iteration factorizations vs LAPACK references (test oracle)."""

    def test_svd3_reconstruction(self, rng):
        from fastmatch_tpu.core.batched_linalg import svd3
        M = rng.standard_normal((300, 3, 3)).astype(np.float32)
        M[100:200] = M[100:200] @ np.diag([1.0, 1e-3, 1e-6]).astype(np.float32)
        U, S, Vt = svd3(jnp.asarray(M))
        recon = np.asarray(U) * np.asarray(S)[..., None, :] @ np.asarray(Vt)
        assert np.abs(recon - M).max() < 1e-5
        s_ref = np.linalg.svd(M, compute_uv=False)
        assert np.abs(np.asarray(S) - s_ref).max() < 1e-5
        orth = np.asarray(U) @ np.swapaxes(np.asarray(U), -1, -2) - np.eye(3)
        assert np.abs(orth).max() < 2e-6

    def test_svd3_rank_deficient_u_completion(self, rng):
        from fastmatch_tpu.core.batched_linalg import svd3
        u, _, vt = np.linalg.svd(
            rng.standard_normal((50, 3, 3)).astype(np.float32))
        E = u @ (np.array([1.0, 1.0, 0.0], np.float32)[None, :, None] * vt)
        U, S, Vt = svd3(jnp.asarray(E))
        assert np.abs(np.asarray(S)[:, 2]).max() < 1e-6
        orth = np.asarray(U) @ np.swapaxes(np.asarray(U), -1, -2) - np.eye(3)
        assert np.abs(orth).max() < 2e-6, "U must stay a full basis at rank 2"

    def test_smallest_eigvec_matches_eigh(self, rng):
        from fastmatch_tpu.core.batched_linalg import smallest_eigvecs
        A = rng.standard_normal((500, 8, 9)).astype(np.float32)
        A[:, :, 8] = 1.0  # DLT-style homogeneous column -> spread spectrum
        ATA = np.einsum("kpi,kpj->kij", A, A)
        _, vecs = np.linalg.eigh(ATA)
        V = np.asarray(smallest_eigvecs(jnp.asarray(ATA)))
        dots = np.abs(np.einsum("ki,ki->k", V[..., 0], vecs[..., 0]))
        assert dots.min() > 0.999

    def test_smallest_eigvecs_k2_nullspace(self, rng):
        from fastmatch_tpu.core.batched_linalg import smallest_eigvecs
        # Exact 2-dim nullspace (7-point structure): A is (7, 9).
        A = rng.standard_normal((200, 7, 9)).astype(np.float32)
        ATA = jnp.asarray(np.einsum("kpi,kpj->kij", A, A))
        V = np.asarray(smallest_eigvecs(ATA, k=2))
        # Residual: both columns must be annihilated by A.
        res = np.abs(np.einsum("kpi,kij->kpj", A, V)).max()
        assert res < 1e-3
        # Orthonormal columns.
        g = np.swapaxes(V, -1, -2) @ V - np.eye(2)
        assert np.abs(g).max() < 1e-5

    def test_polar3(self, rng):
        from fastmatch_tpu.core.batched_linalg import polar3
        M = rng.standard_normal((100, 3, 3)).astype(np.float32)
        R = np.asarray(polar3(jnp.asarray(M)))
        assert np.abs(np.linalg.det(R) - 1).max() < 1e-5
        assert np.abs(R @ np.swapaxes(R, -1, -2) - np.eye(3)).max() < 2e-6
