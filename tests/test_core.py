"""Unit tests for core numerics (SURVEY.md §4 'Unit (numerics)' tier)."""

import numpy as np
import jax.numpy as jnp
import pytest

from larvio_tpu.core import (
    quat_identity,
    quat_inverse,
    quat_multiply,
    quat_normalize,
    quat_to_rotation,
    rotation_to_quat,
    small_angle_quat,
    quat_integrate_rk4,
    skew,
    so3_exp,
    so3_log,
    project,
    undistort_normalize,
)
from larvio_tpu.core.chi2 import chi2_inv95
from larvio_tpu.config import CameraConfig


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)
    return q.astype(np.float32)


class TestQuaternion:
    def test_identity_rotation(self):
        R = quat_to_rotation(quat_identity())
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_multiply_composes_rotations(self, rng):
        q1, q2 = random_quats(rng, 2)
        R12 = quat_to_rotation(quat_multiply(q1, q2))
        np.testing.assert_allclose(
            R12, quat_to_rotation(q1) @ quat_to_rotation(q2), atol=1e-5
        )

    def test_inverse(self, rng):
        (q,) = random_quats(rng, 1)
        qi = quat_multiply(q, quat_inverse(q))
        np.testing.assert_allclose(np.abs(qi[3]), 1.0, atol=1e-6)

    def test_rotation_roundtrip(self, rng):
        q = random_quats(rng, 64)
        R = quat_to_rotation(q)
        q2 = rotation_to_quat(R)
        # sign-canonicalized match
        np.testing.assert_allclose(np.asarray(q2), q, atol=2e-5)

    def test_rotation_is_orthonormal(self, rng):
        q = random_quats(rng, 16)
        R = np.asarray(quat_to_rotation(q))
        np.testing.assert_allclose(
            R @ np.transpose(R, (0, 2, 1)), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)

    def test_small_angle(self):
        dtheta = np.array([1e-3, -2e-3, 0.5e-3], np.float32)
        q = small_angle_quat(dtheta)
        R = quat_to_rotation(q)
        # JPL: R(q(dtheta)) ≈ I - skew(dtheta) for global->local convention
        np.testing.assert_allclose(R, np.eye(3) - np.asarray(skew(dtheta)), atol=1e-5)

    def test_rk4_constant_rate(self):
        # constant body rate about z for 1s in 100 steps: total angle = |w|
        w = np.array([0.0, 0.0, 0.3], np.float32)
        q = quat_identity()
        for _ in range(100):
            q = quat_integrate_rk4(q, w, w, 0.01)
        R = quat_to_rotation(q)
        # JPL global->local: dC/dt = -skew(w) C  =>  C(1s) = exp(-skew(w))
        np.testing.assert_allclose(np.asarray(so3_log(R)), -w, atol=1e-4)


class TestSO3:
    def test_skew_cross(self, rng):
        v, u = rng.normal(size=(2, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(skew(v)) @ u, np.cross(v, u), atol=1e-6)

    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
        back = np.asarray(so3_log(so3_exp(phi)))
        np.testing.assert_allclose(back, phi, atol=1e-4)

    def test_exp_small(self):
        phi = np.array([1e-9, 0, 0], np.float32)
        np.testing.assert_allclose(np.asarray(so3_exp(phi)), np.eye(3), atol=1e-7)


class TestCamera:
    @pytest.mark.parametrize("model", ["radtan", "equidistant"])
    def test_project_undistort_roundtrip(self, rng, model):
        coeffs = {
            "radtan": (-0.28, 0.07, 1.9e-4, 1.8e-5),
            "equidistant": (-0.013, 0.021, -0.020, 0.006),
        }[model]
        cam = CameraConfig(distortion_model=model, distortion_coeffs=coeffs)
        xy = rng.uniform(-0.5, 0.5, size=(256, 2)).astype(np.float32)
        uv = project(jnp.asarray(xy), cam)
        back = undistort_normalize(uv, cam)
        np.testing.assert_allclose(np.asarray(back), xy, atol=2e-4)

    def test_matches_opencv_radtan(self, rng):
        cv2 = pytest.importorskip("cv2")
        cam = CameraConfig()
        uv = rng.uniform([60, 60], [690, 420], size=(128, 2)).astype(np.float32)
        K = np.array(
            [
                [cam.intrinsics[0], 0, cam.intrinsics[2]],
                [0, cam.intrinsics[1], cam.intrinsics[3]],
                [0, 0, 1],
            ]
        )
        ref = cv2.undistortPoints(
            uv.reshape(-1, 1, 2), K, np.array(cam.distortion_coeffs)
        ).reshape(-1, 2)
        ours = np.asarray(undistort_normalize(jnp.asarray(uv), cam))
        # OpenCV's 5-iteration solver itself carries ~1e-3 error at the image
        # corners for EuRoC-strength distortion; only require agreement at
        # that level, and verify we are the *exact* inverse below.
        np.testing.assert_allclose(ours, ref, atol=2e-3)
        roundtrip = np.asarray(project(jnp.asarray(ours), cam))
        assert np.abs(roundtrip - uv).max() < 0.01  # px

    def test_matches_opencv_equidistant(self, rng):
        cv2 = pytest.importorskip("cv2")
        coeffs = (-0.013, 0.021, -0.020, 0.006)
        cam = CameraConfig(
            distortion_model="equidistant",
            distortion_coeffs=coeffs,
            intrinsics=(278.0, 277.0, 320.0, 240.0),
            width=640,
            height=480,
        )
        uv = rng.uniform([60, 60], [580, 420], size=(128, 2)).astype(np.float32)
        K = np.array(
            [
                [cam.intrinsics[0], 0, cam.intrinsics[2]],
                [0, cam.intrinsics[1], cam.intrinsics[3]],
                [0, 0, 1],
            ]
        )
        ref = cv2.fisheye.undistortPoints(
            uv.reshape(1, -1, 2).astype(np.float64), K, np.array(coeffs)
        ).reshape(-1, 2)
        ours = np.asarray(undistort_normalize(jnp.asarray(uv), cam))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestChi2:
    def test_known_values(self):
        # chi2_{0.95} quantiles: dof 1 -> 3.841, 2 -> 5.991, 10 -> 18.307
        got = np.asarray(chi2_inv95(jnp.array([1, 2, 10])))
        np.testing.assert_allclose(got, [3.841, 5.991, 18.307], rtol=5e-3)


class TestInvQuadform:
    def test_matches_exact_solve_across_conditioning(self, rng):
        """Newton-Schulz gate quadform vs exact solve: <0.1% relative error
        for conditioning up to ~1e4 (the gate's operating envelope)."""
        from larvio_tpu.core.linalg import inv_quadform

        n = 40
        for cond in (10.0, 1e2, 1e3, 1e4, 3e4):
            for trial in range(3):
                Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
                lam = np.logspace(0, np.log10(cond), n)
                S = (Q * lam) @ Q.T + 1e-3 * np.eye(n)
                S = S.astype(np.float32)
                r = rng.normal(size=n).astype(np.float32)
                exact = float(r @ np.linalg.solve(S.astype(np.float64), r))
                got = float(inv_quadform(jnp.asarray(S), jnp.asarray(r)))
                assert abs(got - exact) / exact < 1e-3, (cond, got, exact)

    def test_padded_zero_rows(self, rng):
        """S rows from zero-padded H (diagonal sigma^2 only) must not break it."""
        from larvio_tpu.core.linalg import inv_quadform

        n, k = 40, 7
        H = np.zeros((n, 30), np.float32)
        H[:k] = rng.normal(size=(k, 30)).astype(np.float32)
        S = H @ H.T * 0.01 + 1.2e-3 * np.eye(n, dtype=np.float32)
        r = np.zeros(n, np.float32)
        r[:k] = rng.normal(size=k).astype(np.float32)
        exact = float(r @ np.linalg.solve(S.astype(np.float64), r))
        got = float(inv_quadform(jnp.asarray(S), jnp.asarray(r)))
        assert abs(got - exact) / max(exact, 1e-9) < 1e-3

    def test_guarded_beyond_convergence_radius(self, rng):
        """kappa ~ 1e6 and indefinite inputs: the guard must return either an
        accurate finite gamma or +inf (reject) — never silent garbage
        (VERDICT r2 #6)."""
        from larvio_tpu.core.linalg import inv_quadform

        n = 40
        # (a) extreme conditioning: finite results must be accurate to 25%
        for cond in (1e5, 1e6):
            for trial in range(3):
                Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
                lam = np.logspace(0, np.log10(cond), n)
                S = ((Q * lam) @ Q.T).astype(np.float32)
                S = 0.5 * (S + S.T)
                r = rng.normal(size=n).astype(np.float32)
                exact = float(r @ np.linalg.solve(S.astype(np.float64), r))
                got = float(inv_quadform(jnp.asarray(S), jnp.asarray(r)))
                assert np.isinf(got) or abs(got - exact) / exact < 0.25, (
                    cond, got, exact
                )
        # (b) indefinite S (f32-corrupted covariance): must reject, not return
        # a plausible-looking number
        Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        lam = np.logspace(0, 3, n)
        lam[0] = -1.0  # negative eigenvalue
        S = ((Q * lam) @ Q.T).astype(np.float32)
        S = 0.5 * (S + S.T)
        r = rng.normal(size=n).astype(np.float32)
        got = float(inv_quadform(jnp.asarray(S), jnp.asarray(r)))
        assert np.isinf(got), got
        # (c) NaN-poisoned S: reject
        S_nan = S.copy()
        S_nan[3, 5] = np.nan
        got = float(inv_quadform(jnp.asarray(S_nan), jnp.asarray(r)))
        assert np.isinf(got), got
