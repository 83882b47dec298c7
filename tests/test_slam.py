"""Hybrid SLAM-feature tests: delayed-init consistency + e2e engagement.

The slam parameterization is anchored inverse depth (models/slam.py); the
consistency check therefore compares inverse-depth errors against the
inverse-depth covariance block.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig, FilterConfig, FrontendConfig
from larvio_tpu.core.quaternion import quat_to_rotation
from larvio_tpu.models.msckf import _consume_blocks
from larvio_tpu.models.state import init_filter_state, slam_offset, state_dim
from larvio_tpu.models.update import apply_update
from larvio_tpu.models import slam as slam_mod


class TestDelayedInit:
    def test_monte_carlo_consistency(self, rng):
        """Promoted feature estimate must match its reported covariance."""
        cfg = VioConfig(
            filter=FilterConfig(
                max_clones=8, max_slam_features=2, slam_promote_obs=6,
                max_update_features=4, tri_translation_threshold=0.1,
                slam_max_init_rho_sigma=3.0,  # accept for the statistics check
                sqrt_form=False,  # reads fs.P covariance blocks directly
            ),
            frontend=FrontendConfig(max_features=8),
        )
        C, D = 8, state_dim(cfg)
        sig = cfg.noise.observation_noise
        anchor = C - 1  # newest clone
        errs, sigmas = [], []
        for trial in range(8):
            fs = init_filter_state(cfg)
            p_cl = np.zeros((C, 3), np.float32)
            p_cl[:, 0] = np.linspace(0, 1.4, C)
            fs = fs.replace(
                initialized=jnp.asarray(True),
                clones=fs.clones.replace(
                    valid=jnp.ones(C, bool), frame=jnp.arange(C, dtype=jnp.int32),
                    p=jnp.asarray(p_cl), p_null=jnp.asarray(p_cl), q_null=fs.clones.q,
                ),
                P=jnp.eye(D, dtype=jnp.float32) * 1e-6,
            )
            p_true = np.array([0.5, 0.3, 7.0], np.float32)
            R_ci = np.asarray(quat_to_rotation(fs.q_ci))
            t_ci = np.asarray(fs.t_ci)
            obs_uv = np.zeros((8, C, 2), np.float32)
            for j in range(C):
                pc = R_ci @ (p_true - p_cl[j]) + t_ci
                obs_uv[3, j] = pc[:2] / pc[2] + rng.normal(0, sig, 2)
            obs_valid = np.zeros((8, C), bool)
            obs_valid[3] = True
            fs = fs.replace(
                obs=fs.obs.replace(
                    uv=jnp.asarray(obs_uv), valid=jnp.asarray(obs_valid),
                    track_id=jnp.full(8, -1, jnp.int32).at[3].set(42),
                )
            )
            cand = jnp.zeros(8, bool).at[3].set(True)
            blocks, consumed, idx, tri, sel = _consume_blocks(cfg, fs, cand)
            H = blocks.H.reshape(-1, D)
            r = blocks.r.reshape(-1)
            fs2, dx, _ = apply_update(cfg, fs, H, r, sig**2, enable=jnp.asarray(True))
            fs3 = slam_mod.promote_features(
                cfg, fs2, blocks, tri, idx, sel, dx,
                anchor_slot=jnp.asarray(anchor),
            )
            sl = np.flatnonzero(np.asarray(fs3.slam.valid))
            if len(sl) == 0:
                continue
            s0 = int(sl[0])
            assert int(fs3.slam.anchor_slot[s0]) == anchor
            off = slam_offset(cfg, s0)
            Pff = np.asarray(fs3.P)[off : off + 3, off : off + 3]
            # truth in anchored inverse-depth coordinates
            pcA = R_ci @ (p_true - p_cl[anchor]) + t_ci
            idp_true = np.array([pcA[0] / pcA[2], pcA[1] / pcA[2], 1.0 / pcA[2]])
            errs.append(np.asarray(fs3.slam.idp[s0]) - idp_true)
            sigmas.append(np.sqrt(np.diag(Pff)))
            # sanity: the implied world point is in the right region (the
            # tight check is the statistical one below — depth sigma for this
            # geometry is ~1.2 m, so metric error up to a few meters is fine)
            p_w = np.asarray(slam_mod.slam_world_points(cfg, fs3))[s0]
            assert np.linalg.norm(p_w - p_true) < 5.0
        assert len(errs) >= 5
        errs, sigmas = np.array(errs), np.array(sigmas)
        norm = np.abs(errs) / np.maximum(sigmas, 1e-9)
        # consistent (and not wildly conservative): errors within a few sigma
        assert norm.mean() < 1.5
        assert norm.max() < 4.0
        # covariance must be PSD
        assert (sigmas > 0).all()


class TestReanchor:
    def test_reanchor_preserves_world_point_and_covariance(self, rng):
        """Re-anchoring is a coordinate change: the implied world point and
        its covariance (including state correlations) must be invariant."""
        C, S = 6, 3
        cfg = VioConfig(
            filter=FilterConfig(max_clones=C, max_slam_features=S,
                                max_update_features=2, imu_slots_per_frame=4,
                                sqrt_form=False),  # reads fs.P blocks directly
            frontend=FrontendConfig(max_features=8),
        )
        from larvio_tpu.models.state import clone_offset, init_filter_state, slam_offset, state_dim

        D = state_dim(cfg)
        fs = init_filter_state(cfg)
        p_cl = rng.normal(0, 0.3, (C, 3)).astype(np.float32)
        p_cl[:, 0] += np.linspace(0, 1.0, C)
        fs = fs.replace(
            initialized=jnp.asarray(True),
            clones=fs.clones.replace(
                valid=jnp.ones(C, bool), frame=jnp.arange(C, dtype=jnp.int32),
                p=jnp.asarray(p_cl), p_null=jnp.asarray(p_cl), q_null=fs.clones.q,
            ),
        )
        # feature anchored at clone 1 (which we will prune)
        anchor = 1
        p_true = np.array([0.4, -0.2, 5.0], np.float32)
        R_ci = np.asarray(quat_to_rotation(fs.q_ci))
        t_ci = np.asarray(fs.t_ci)
        pcA = R_ci @ (p_true - p_cl[anchor]) + t_ci
        idp = np.array([pcA[0] / pcA[2], pcA[1] / pcA[2], 1 / pcA[2]], np.float32)
        fs = fs.replace(
            slam=fs.slam.replace(
                idp=fs.slam.idp.at[0].set(jnp.asarray(idp)),
                idp_null=fs.slam.idp_null.at[0].set(jnp.asarray(idp)),
                anchor_slot=fs.slam.anchor_slot.at[0].set(anchor),
                track_slot=fs.slam.track_slot.at[0].set(2),
                track_id=fs.slam.track_id.at[0].set(9),
                valid=fs.slam.valid.at[0].set(True),
            )
        )
        # random correlated PSD covariance over [imu..clones..slam0]; zero the
        # extrinsic block (the transform neglects ext cross terms by design)
        A = rng.normal(0, 0.02, (D, D)).astype(np.float32)
        P = A @ A.T + 1e-6 * np.eye(D, dtype=np.float32)
        P[15:22, :] = 0.0
        P[:, 15:22] = 0.0
        fs = fs.replace(P=jnp.asarray(P))

        def world_cov(fs_):
            s0 = 0
            a = int(fs_.slam.anchor_slot[s0])
            from larvio_tpu.models.slam import _world_point_and_jac

            R_A = quat_to_rotation(fs_.clones.q[a])[None]
            p_A = np.asarray(fs_.clones.p[a])[None]
            p_w, J_idp, J_thA, _, _, _ = _world_point_and_jac(
                fs_.slam.idp[s0][None], R_A, jnp.asarray(p_A), quat_to_rotation(fs_.q_ci), fs_.t_ci
            )
            J_idp, J_thA = np.asarray(J_idp[0]), np.asarray(J_thA[0])
            fo, ao = slam_offset(cfg, s0), clone_offset(a)
            sel = np.r_[fo : fo + 3, ao : ao + 6]
            J = np.concatenate([J_idp, J_thA, np.eye(3, dtype=np.float32)], axis=1)
            Pm = np.asarray(fs_.P)
            return np.asarray(p_w[0]), J @ Pm[np.ix_(sel, sel)] @ J.T, sel, J, Pm

        p0, cov0, sel0, J0, Pm0 = world_cov(fs)
        fs2 = slam_mod.reanchor_on_prune(
            cfg, fs, jnp.asarray(anchor), jnp.asarray(0), jnp.asarray(True)
        )
        assert bool(fs2.slam.valid[0])
        new_anchor = int(fs2.slam.anchor_slot[0])
        assert new_anchor == C - 1  # newest surviving clone
        p1, cov1, sel1, J1, Pm1 = world_cov(fs2)
        np.testing.assert_allclose(p1, p0, atol=1e-5)
        np.testing.assert_allclose(cov1, cov0, rtol=2e-2, atol=1e-7)
        # cross-covariance with an untouched state block (e.g. IMU velocity)
        # must also be preserved through the world-point chain
        cross0 = J0 @ Pm0[np.ix_(sel0, np.arange(6, 9))]
        cross1 = J1 @ Pm1[np.ix_(sel1, np.arange(6, 9))]
        np.testing.assert_allclose(cross1, cross0, rtol=2e-2, atol=1e-7)


@pytest.mark.slow
class TestRhoInflation:
    """slam_init_rho_inflation=k must scale ONLY the promoted landmark's
    inverse-depth variance by (1 + k^2), in both covariance representations
    (consistency-aware delayed init, ROADMAP r3 #4)."""

    def _promote_rho_var(self, sqrt_form, k_rho, rng):
        C = 8
        cfg = VioConfig(
            filter=FilterConfig(
                max_clones=C, max_slam_features=2, slam_promote_obs=6,
                max_update_features=4, tri_translation_threshold=0.1,
                slam_max_init_rho_sigma=3.0, sqrt_form=sqrt_form,
                slam_init_rho_inflation=k_rho,
            ),
            frontend=FrontendConfig(max_features=8),
        )
        D = state_dim(cfg)
        sig = cfg.noise.observation_noise
        fs = init_filter_state(cfg)
        p_cl = np.zeros((C, 3), np.float32)
        p_cl[:, 0] = np.linspace(0, 1.4, C)
        fs = fs.replace(
            initialized=jnp.asarray(True),
            clones=fs.clones.replace(
                valid=jnp.ones(C, bool), frame=jnp.arange(C, dtype=jnp.int32),
                p=jnp.asarray(p_cl), p_null=jnp.asarray(p_cl), q_null=fs.clones.q,
            ),
            P=jnp.eye(D, dtype=jnp.float32) * 1e-6,
        )
        p_true = np.array([0.5, 0.3, 7.0], np.float32)
        R_ci = np.asarray(quat_to_rotation(fs.q_ci))
        t_ci = np.asarray(fs.t_ci)
        obs_uv = np.zeros((8, C, 2), np.float32)
        for j in range(C):
            pc = R_ci @ (p_true - p_cl[j]) + t_ci
            obs_uv[3, j] = pc[:2] / pc[2] + rng.normal(0, sig, 2)
        obs_valid = np.zeros((8, C), bool)
        obs_valid[3] = True
        fs = fs.replace(
            obs=fs.obs.replace(
                uv=jnp.asarray(obs_uv), valid=jnp.asarray(obs_valid),
                track_id=jnp.full(8, -1, jnp.int32).at[3].set(42),
            )
        )
        cand = jnp.zeros(8, bool).at[3].set(True)
        blocks, consumed, idx, tri, sel = _consume_blocks(cfg, fs, cand)
        H = blocks.H.reshape(-1, D)
        r = blocks.r.reshape(-1)
        fs2, dx, _ = apply_update(cfg, fs, H, r, sig**2, enable=jnp.asarray(True))
        fs3 = slam_mod.promote_features(
            cfg, fs2, blocks, tri, idx, sel, dx, anchor_slot=jnp.asarray(C - 1)
        )
        sl = np.flatnonzero(np.asarray(fs3.slam.valid))
        assert len(sl) == 1
        off = slam_offset(cfg, int(sl[0]))
        P = np.asarray(fs3.P)
        if sqrt_form:
            var = np.array([np.sum(P[off + i] ** 2) for i in range(3)])
        else:
            var = np.diagonal(P)[off : off + 3]
        return var

    @pytest.mark.parametrize("sqrt_form", [False, True])
    def test_inflates_rho_only(self, sqrt_form, rng):
        k = 2.0
        base = self._promote_rho_var(sqrt_form, 0.0, np.random.default_rng(7))
        infl = self._promote_rho_var(sqrt_form, k, np.random.default_rng(7))
        # bearing variances untouched, rho variance scaled by 1 + k^2
        np.testing.assert_allclose(infl[:2], base[:2], rtol=1e-5)
        np.testing.assert_allclose(infl[2] / base[2], 1.0 + k * k, rtol=1e-4)


class TestHybridEndToEnd:
    def test_promotes_at_default_config(self):
        """Engagement gate (VERDICT r1 #4): at DEFAULT thresholds on the
        standard 15 s sim, several features must be promoted and tracked."""
        from larvio_tpu.api import run_feature_sequence
        from larvio_tpu.data.evaluate import ate_rmse
        from larvio_tpu.data.sim import SimConfig, Simulator

        cfg = VioConfig()  # no relaxed thresholds
        sc = SimConfig(duration=15.0, pixel_noise=0.002)
        data = Simulator(sc, cfg).generate()
        vs, outs = run_feature_sequence(cfg, data)
        m = outs.initialized.astype(bool)
        assert int(outs.did_reset.sum()) == 0
        assert ate_rmse(outs.p[m], data["gt_p"][m]) < 0.05
        assert int(np.asarray(outs.n_slam).max()) >= 3  # promotion engaged
        assert np.all(np.isfinite(outs.p))

    def test_close_range_promotes_and_tracks(self):
        from larvio_tpu.api import run_feature_sequence
        from larvio_tpu.data.evaluate import ate_rmse
        from larvio_tpu.data.sim import SimConfig, Simulator

        cfg = VioConfig()
        sc = SimConfig(
            duration=15.0, pixel_noise=0.002, landmark_z=(4.0, 8.0),
            radius=(2.5, 2.0, 0.6),
        )
        data = Simulator(sc, cfg).generate()
        vs, outs = run_feature_sequence(cfg, data)
        m = outs.initialized.astype(bool)
        assert int(outs.did_reset.sum()) == 0
        assert ate_rmse(outs.p[m], data["gt_p"][m]) < 0.05
        assert int(np.asarray(outs.n_slam).max()) >= 1  # promotion engaged
        assert np.all(np.isfinite(outs.p))

    def test_hybrid_no_worse_than_pure_msckf(self):
        from larvio_tpu.api import run_feature_sequence
        from larvio_tpu.data.evaluate import ate_rmse
        from larvio_tpu.data.sim import SimConfig, Simulator

        sc = SimConfig(duration=15.0, pixel_noise=0.002, gyro_noise=0.005,
                       acc_noise=0.05)
        cfg_h = VioConfig()
        cfg_p = VioConfig(filter=FilterConfig(max_slam_features=0))
        d = Simulator(sc, cfg_h).generate()
        _, oh = run_feature_sequence(cfg_h, d)
        _, op = run_feature_sequence(cfg_p, d)
        mh = oh.initialized.astype(bool)
        mp = op.initialized.astype(bool)
        ate_h = ate_rmse(oh.p[mh], d["gt_p"][mh])
        ate_p = ate_rmse(op.p[mp], d["gt_p"][mp])
        assert ate_h < max(1.5 * ate_p, ate_p + 0.02), (ate_h, ate_p)

    def test_distant_landmarks_no_worse_than_pure_msckf(self):
        """Inverse depth's reason to exist: far features (z 20-40 m) must not
        hurt the hybrid filter (a world-xyz parameterization conditions so
        poorly there that promotion had to be starved off)."""
        from larvio_tpu.api import run_feature_sequence
        from larvio_tpu.data.evaluate import ate_rmse
        from larvio_tpu.data.sim import SimConfig, Simulator

        sc = SimConfig(duration=15.0, pixel_noise=0.002, landmark_z=(20.0, 40.0))
        cfg_h = VioConfig()
        cfg_p = VioConfig(filter=FilterConfig(max_slam_features=0))
        d = Simulator(sc, cfg_h).generate()
        _, oh = run_feature_sequence(cfg_h, d)
        _, op = run_feature_sequence(cfg_p, d)
        mh = oh.initialized.astype(bool)
        mp = op.initialized.astype(bool)
        assert int(oh.did_reset.sum()) == 0
        ate_h = ate_rmse(oh.p[mh], d["gt_p"][mh])
        ate_p = ate_rmse(op.p[mp], d["gt_p"][mp])
        assert np.all(np.isfinite(oh.p))
        assert ate_h < max(1.5 * ate_p, ate_p + 0.02), (ate_h, ate_p)
