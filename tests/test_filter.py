"""Unit tests for the MSCKF filter internals (SURVEY.md §4 test pyramid)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig, FilterConfig, FrontendConfig
from larvio_tpu.core.linalg import householder_eliminate, joseph_update, qr_compress
from larvio_tpu.models.state import init_filter_state, initial_covariance, state_dim, CLONE_BASE


@pytest.fixture(scope="module")
def cfg():
    # sqrt_form pinned OFF: this module asserts Joseph-path covariance-block
    # semantics directly on fs.P (clone block mirroring, prune row zeroing,
    # P equivalence of the propagation paths). Under the sqrt default fs.P
    # holds a factor S with P = S S^T, whose rows legitimately differ.
    # Sqrt-path parity is pinned end-to-end by tests/test_sqrt_filter.py.
    return VioConfig(
        filter=FilterConfig(max_clones=6, max_update_features=8, sqrt_form=False),
        frontend=FrontendConfig(max_features=16),
    )


class TestHouseholderNullspace:
    """The masked Householder elimination must equal the dense unpadded math."""

    def test_projects_out_feature_jacobian(self, rng):
        m, n_valid = 12, 8
        A = rng.normal(size=(m, 3)).astype(np.float32)
        A[n_valid:] = 0.0  # padding rows (compacted to the back)
        B = rng.normal(size=(m, 10)).astype(np.float32)
        B[n_valid:] = 0.0
        r = rng.normal(size=m).astype(np.float32)
        r[n_valid:] = 0.0

        Bp, rp, keep, (A_top, B_top, r_top) = jax.jit(
            householder_eliminate, static_argnums=3
        )(jnp.asarray(A), jnp.asarray(B), jnp.asarray(r), 3)
        Bp, rp = np.asarray(Bp), np.asarray(rp)

        # 1) information equivalence: B'^T B' == dense nullspace projection
        Av, Bv, rv = A[:n_valid], B[:n_valid], r[:n_valid]
        q, _ = np.linalg.qr(Av, mode="complete")
        N = q[:, 3:]  # left nullspace basis of the valid block
        ref_H = N.T @ Bv
        ref_r = N.T @ rv
        np.testing.assert_allclose(Bp.T @ Bp, ref_H.T @ ref_H, atol=1e-3)
        np.testing.assert_allclose(Bp.T @ rp, ref_H.T @ ref_r, atol=1e-3)
        # 2) padding rows contributed nothing and eliminated rows are zeroed
        assert np.all(Bp[:3] == 0.0)
        # 3) the eliminated range rows reproduce the full information:
        #    [A_top|B_top] is the R-factor part; A_top upper-triangular
        A_top = np.asarray(A_top)
        assert abs(A_top[1, 0]) < 1e-4 and abs(A_top[2, 0]) < 1e-4 and abs(A_top[2, 1]) < 1e-4
        full_info = np.asarray(B_top).T @ np.asarray(B_top) + Bp.T @ Bp
        np.testing.assert_allclose(full_info, B[:n_valid].T @ B[:n_valid], atol=2e-3)

    def test_zero_rows_untouched(self, rng):
        # a feature with only 2 valid obs (4 rows) -> all info eliminated
        A = np.zeros((8, 3), np.float32)
        B = np.zeros((8, 5), np.float32)
        r = np.zeros(8, np.float32)
        A[:4] = rng.normal(size=(4, 3))
        B[:4] = rng.normal(size=(4, 5))
        r[:4] = rng.normal(size=4)
        Bp, rp, _, _ = householder_eliminate(jnp.asarray(A), jnp.asarray(B), jnp.asarray(r), 3)
        # rows 4+ were zero and must remain exactly zero
        np.testing.assert_array_equal(np.asarray(Bp)[4:], 0.0)
        np.testing.assert_array_equal(np.asarray(rp)[4:], 0.0)


class TestQRCompress:
    def test_equivalent_information(self, rng):
        H = rng.normal(size=(40, 12)).astype(np.float32)
        H[25:] = 0.0  # padding
        r = rng.normal(size=40).astype(np.float32)
        r[25:] = 0.0
        Hc, rc = qr_compress(jnp.asarray(H), jnp.asarray(r))
        Hc, rc = np.asarray(Hc), np.asarray(rc)
        np.testing.assert_allclose(Hc.T @ Hc, H.T @ H, atol=2e-3)
        np.testing.assert_allclose(Hc.T @ rc, H.T @ r, atol=2e-3)


class TestJosephUpdate:
    def test_matches_textbook_kf(self, rng):
        D, n = 8, 5
        A = rng.normal(size=(D, D))
        P = (A @ A.T + np.eye(D)).astype(np.float32)
        H = rng.normal(size=(n, D)).astype(np.float32)
        r = rng.normal(size=n).astype(np.float32)
        var = 0.3
        dx, P_new = joseph_update(jnp.asarray(P), jnp.asarray(H), jnp.asarray(r), var)
        S = H @ P @ H.T + var * np.eye(n)
        K = P @ H.T @ np.linalg.inv(S)
        np.testing.assert_allclose(np.asarray(dx), K @ r, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(P_new), P - K @ H @ P, rtol=2e-2, atol=5e-4
        )

    def test_zero_rows_are_noop(self, rng):
        D = 6
        P = np.diag(rng.uniform(0.1, 1.0, D)).astype(np.float32)
        H = np.zeros((4, D), np.float32)
        r = np.zeros(4, np.float32)
        dx, P_new = joseph_update(jnp.asarray(P), jnp.asarray(H), jnp.asarray(r), 0.1)
        np.testing.assert_allclose(np.asarray(dx), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(P_new), P, atol=1e-6)


class TestPropagationJacobian:
    """Phi must match finite differences of the nominal integrator."""

    def test_phi_finite_difference(self, cfg, rng):
        from larvio_tpu.models.propagation import ImuBatch, propagate
        from larvio_tpu.models.update import inject_error

        cfg_nofej = VioConfig(
            # sqrt_form off: Phi is extracted from covariance propagation
            # (P0 = I => P' = Phi Phi^T + Q), which reads fs.P as a covariance
            filter=FilterConfig(max_clones=6, max_update_features=8,
                                use_fej=False, sqrt_form=False),
            frontend=FrontendConfig(max_features=16),
        )
        fs = init_filter_state(cfg_nofej)
        fs = fs.replace(
            initialized=jnp.asarray(True),
            v=jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
            bg=jnp.asarray([0.01, -0.01, 0.02], jnp.float32),
            ba=jnp.asarray([0.05, 0.02, -0.03], jnp.float32),
            P=initial_covariance(cfg_nofej),
        )
        S = cfg_nofej.filter.imu_slots_per_frame
        t = np.zeros(S, np.float32)
        t[:5] = np.arange(5) * 0.005
        w = np.tile(np.array([0.2, -0.3, 0.4], np.float32), (S, 1))
        a = np.tile(np.array([0.5, 0.3, 9.6], np.float32), (S, 1))
        valid = np.zeros(S, bool)
        valid[:5] = True
        imu = ImuBatch(t=jnp.asarray(t), w=jnp.asarray(w), a=jnp.asarray(a), valid=jnp.asarray(valid))
        t_img = jnp.asarray(0.02, jnp.float32)

        def nominal(dx15):
            D = state_dim(cfg_nofej)
            dx = jnp.zeros(D, jnp.float32).at[:15].set(dx15)
            fs_p = inject_error(cfg_nofej, fs, dx)
            out = propagate(cfg_nofej, fs_p, imu, t_img)
            # error of propagated state w.r.t. unperturbed propagation
            base = propagate(cfg_nofej, fs, imu, t_img)
            from larvio_tpu.core.quaternion import quat_multiply, quat_inverse
            from larvio_tpu.core.so3 import so3_log
            from larvio_tpu.core.quaternion import quat_to_rotation
            dq = quat_multiply(out.q, quat_inverse(base.q))
            # JPL left-error: R(dq) = I - skew(dtheta)  =>  log gives -dtheta
            dtheta = -so3_log(quat_to_rotation(dq))
            return jnp.concatenate(
                [dtheta, out.bg - base.bg, out.v - base.v, out.ba - base.ba, out.p - base.p]
            )

        J_fd = np.zeros((15, 15), np.float32)
        eps = 1e-4
        for i in range(15):
            e = np.zeros(15, np.float32)
            e[i] = eps
            J_fd[:, i] = (np.asarray(nominal(jnp.asarray(e))) - np.asarray(nominal(jnp.asarray(-e)))) / (2 * eps)

        # extract Phi from covariance propagation: P0 = I  =>  P' = Phi Phi^T + Q
        # instead, recompute Phi directly via the internal helper
        from larvio_tpu.models.propagation import _phi_and_Q
        # propagate nominal once to get endpoint values
        base = propagate(cfg_nofej, fs, imu, t_img)
        # build the product of per-sample Phis by propagating an identity cov
        # with zero noise: run propagate with noise zeroed via cfg? Simpler:
        # compare FD against covariance-implied Phi using P0 = eye, Q small.
        big_eye = jnp.eye(state_dim(cfg_nofej), dtype=jnp.float32)
        fs_eye = fs.replace(P=big_eye)
        out_eye = propagate(cfg_nofej, fs_eye, imu, t_img)
        # P' = Phi Phi^T + Q; Q is small relative to 1 -> Phi Phi^T ~ P'
        PhiPhiT = np.asarray(out_eye.P)[:15, :15]
        np.testing.assert_allclose(PhiPhiT, J_fd @ J_fd.T, atol=5e-3)


class TestTriangulation:
    def test_recovers_point(self, cfg, rng):
        from larvio_tpu.models.triangulation import CameraWindow, triangulate_feature

        C = cfg.filter.max_clones
        p_true = np.array([1.0, 0.5, 6.0])
        # cameras along a baseline looking +z
        R_cw = np.tile(np.eye(3), (C, 1, 1)).astype(np.float32)
        p_cw = np.zeros((C, 3), np.float32)
        p_cw[:, 0] = np.linspace(0, 1.0, C)
        valid = np.ones(C, bool)
        uv = ((p_true - p_cw) / (p_true[2] - p_cw[:, 2])[:, None])[:, :2].astype(np.float32)
        uv += rng.normal(0, 5e-4, uv.shape).astype(np.float32)
        cams = CameraWindow(R_cw=jnp.asarray(R_cw), p_cw=jnp.asarray(p_cw), valid=jnp.asarray(valid))
        res = triangulate_feature(
            cfg, cams, jnp.arange(C, dtype=jnp.int32), jnp.asarray(uv), jnp.asarray(valid)
        )
        assert bool(res.valid)
        np.testing.assert_allclose(np.asarray(res.p_w), p_true, atol=2e-2)

    def test_rejects_zero_baseline(self, cfg):
        from larvio_tpu.models.triangulation import CameraWindow, triangulate_feature

        C = cfg.filter.max_clones
        R_cw = np.tile(np.eye(3), (C, 1, 1)).astype(np.float32)
        p_cw = np.zeros((C, 3), np.float32)  # all cameras at the same spot
        valid = np.ones(C, bool)
        uv = np.tile(np.array([0.1, 0.2], np.float32), (C, 1))
        cams = CameraWindow(R_cw=jnp.asarray(R_cw), p_cw=jnp.asarray(p_cw), valid=jnp.asarray(valid))
        res = triangulate_feature(
            cfg, cams, jnp.arange(C, dtype=jnp.int32), jnp.asarray(uv), jnp.asarray(valid)
        )
        assert not bool(res.valid)


class TestAugmentation:
    def test_clone_covariance_blocks(self, cfg):
        from larvio_tpu.models.augmentation import augment_state

        fs = init_filter_state(cfg)
        fs = fs.replace(P=initial_covariance(cfg), initialized=jnp.asarray(True))
        fs2, slot = augment_state(cfg, fs, jnp.asarray(True), jnp.zeros(3, jnp.float32))
        s = int(slot)
        off = CLONE_BASE + 6 * s
        P = np.asarray(fs2.P)
        # clone theta block mirrors the imu theta block; p block mirrors p
        np.testing.assert_allclose(P[off:off+3, off:off+3], np.asarray(fs.P)[0:3, 0:3], atol=1e-6)
        np.testing.assert_allclose(P[off+3:off+6, off+3:off+6], np.asarray(fs.P)[12:15, 12:15], atol=1e-6)
        np.testing.assert_allclose(P[off:off+3, 0:3], np.asarray(fs.P)[0:3, 0:3], atol=1e-6)
        assert bool(fs2.clones.valid[s])

    def test_masked_noop(self, cfg):
        from larvio_tpu.models.augmentation import augment_state

        fs = init_filter_state(cfg)
        fs2, slot = augment_state(cfg, fs, jnp.asarray(False), jnp.zeros(3, jnp.float32))
        assert int(slot) == -1
        np.testing.assert_array_equal(np.asarray(fs2.P), np.asarray(fs.P))
        assert not bool(np.any(fs2.clones.valid))


class TestPropagationParallelEquivalence:
    """The production associative-scan propagation must match the sequential
    per-sample reference (_propagate_sequential) on the same ImuBatch,
    including the clamped / padded / interpolated edge cases (VERDICT r2 #10).

    Both integrate the same nominal model to O(dt^3) per step but with
    different quadratures (joint RK4 vs linear-q RK4 + Simpson), so the match
    is to f32-and-truncation tolerance, not bitwise.
    """

    def _state(self, cfg, rng, n_clones=3):
        from larvio_tpu.core.quaternion import quat_normalize

        fs = init_filter_state(cfg)
        D = state_dim(cfg)
        A = rng.normal(size=(D, D)).astype(np.float32) * 0.05
        P = A @ A.T + 0.01 * np.eye(D, dtype=np.float32)
        q = quat_normalize(jnp.asarray(rng.normal(size=4), jnp.float32))
        fs = fs.replace(
            initialized=jnp.asarray(True),
            q=q, q_null=q,
            v=jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32),
            p=jnp.asarray(rng.normal(size=3), jnp.float32),
            bg=jnp.asarray(rng.normal(size=3) * 0.01, jnp.float32),
            ba=jnp.asarray(rng.normal(size=3) * 0.05, jnp.float32),
            P=jnp.asarray(P),
            time=jnp.asarray(1.0, jnp.float32),
        )
        fs = fs.replace(v_null=fs.v, p_null=fs.p)
        return fs

    def _imu(self, cfg, rng, n_valid, t0=1.0, dt=0.005):
        from larvio_tpu.models.propagation import ImuBatch

        S = cfg.filter.imu_slots_per_frame
        t = np.zeros(S, np.float32)
        t[:n_valid] = t0 + np.arange(n_valid) * dt
        w = rng.normal(size=(S, 3)).astype(np.float32) * 0.3
        a = (np.array([0.0, 0.0, 9.81]) + rng.normal(size=(S, 3)) * 0.5).astype(np.float32)
        valid = np.zeros(S, bool)
        valid[:n_valid] = True
        return ImuBatch(t=jnp.asarray(t), w=jnp.asarray(w), a=jnp.asarray(a),
                        valid=jnp.asarray(valid))

    def _compare(self, cfg, fs, imu, t_img, atol_state=5e-5, atol_P=3e-3):
        # atol_P is relative to max|P|: the two quadratures produce nominal
        # states differing ~1e-5 and the FEJ fix-up multiplies state deltas by
        # g (w = skew(v_null - v_new) @ g_w), so P blocks agree to ~1e-3
        from larvio_tpu.models.propagation import (
            _propagate_parallel,
            _propagate_sequential,
        )

        out_p = jax.jit(lambda f, i, t: _propagate_parallel(cfg, f, i, t))(fs, imu, t_img)
        out_s = jax.jit(lambda f, i, t: _propagate_sequential(cfg, f, i, t))(fs, imu, t_img)
        np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(out_s.q), atol=atol_state)
        np.testing.assert_allclose(np.asarray(out_p.v), np.asarray(out_s.v), atol=atol_state * 10)
        np.testing.assert_allclose(np.asarray(out_p.p), np.asarray(out_s.p), atol=atol_state * 10)
        np.testing.assert_allclose(np.asarray(out_p.time), np.asarray(out_s.time), atol=1e-6)
        Pp, Ps = np.asarray(out_p.P), np.asarray(out_s.P)
        scale = np.max(np.abs(Ps)) + 1e-9
        np.testing.assert_allclose(Pp / scale, Ps / scale, atol=atol_P)
        return out_p, out_s

    def test_full_batch(self, cfg, rng):
        fs = self._state(cfg, rng)
        imu = self._imu(cfg, rng, n_valid=10)
        self._compare(cfg, fs, imu, jnp.asarray(1.045, jnp.float32))

    def test_clamped_interpolated_endpoint(self, cfg, rng):
        # target mid-way through the 4th interval: the last sample must be
        # linearly interpolated and the remaining slots exact no-ops
        fs = self._state(cfg, rng)
        imu = self._imu(cfg, rng, n_valid=10)
        self._compare(cfg, fs, imu, jnp.asarray(1.0175, jnp.float32))

    def test_all_padding_is_noop(self, cfg, rng):
        fs = self._state(cfg, rng)
        imu = self._imu(cfg, rng, n_valid=0)
        out_p, out_s = self._compare(cfg, fs, imu, jnp.asarray(1.05, jnp.float32))
        # also a strict no-op against the input state
        np.testing.assert_allclose(np.asarray(out_p.q), np.asarray(fs.q), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_p.p), np.asarray(fs.p), atol=1e-6)

    def test_target_before_first_sample(self, cfg, rng):
        # t_img + td earlier than every sample: all intervals clamp to zero
        fs = self._state(cfg, rng)
        imu = self._imu(cfg, rng, n_valid=8)
        out_p, out_s = self._compare(cfg, fs, imu, jnp.asarray(0.995, jnp.float32))
        np.testing.assert_allclose(np.asarray(out_p.v), np.asarray(fs.v), atol=1e-6)

    def test_nonzero_td_shifts_target(self, cfg, rng):
        fs = self._state(cfg, rng).replace(td=jnp.asarray(0.012, jnp.float32))
        imu = self._imu(cfg, rng, n_valid=10)
        out_p, out_s = self._compare(cfg, fs, imu, jnp.asarray(1.03, jnp.float32))
        np.testing.assert_allclose(np.asarray(out_p.time), 1.042, atol=1e-6)

    def test_fej_phi_matches(self, rng):
        # with FEJ on and nulls lagging the estimate, the OC fix-up rows of
        # the accumulated Phi must agree between the two implementations
        cfg_fej = VioConfig(
            filter=FilterConfig(max_clones=6, max_update_features=8,
                                use_fej=True, sqrt_form=False),
            frontend=FrontendConfig(max_features=16),
        )
        fs = self._state(cfg_fej, rng)
        # nulls deliberately differ from the estimate (post-update situation)
        fs = fs.replace(v_null=fs.v + 0.05, p_null=fs.p + 0.02)
        imu = self._imu(cfg_fej, rng, n_valid=10)
        self._compare(cfg_fej, fs, imu, jnp.asarray(1.045, jnp.float32))
