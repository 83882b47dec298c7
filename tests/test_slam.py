"""Hybrid SLAM-feature tests: delayed-init consistency + e2e engagement."""

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
                slam_max_init_sigma=3.0,  # accept for the statistics check
            ),
            frontend=FrontendConfig(max_features=8),
        )
        C, D = 8, state_dim(cfg)
        sig = cfg.noise.observation_noise
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
            fs2, dx = apply_update(cfg, fs, H, r, sig**2, enable=jnp.asarray(True))
            fs3 = slam_mod.promote_features(cfg, fs2, blocks, tri, idx, sel, dx)
            sl = np.flatnonzero(np.asarray(fs3.slam.valid))
            if len(sl) == 0:
                continue
            s0 = int(sl[0])
            off = slam_offset(cfg, s0)
            Pff = np.asarray(fs3.P)[off : off + 3, off : off + 3]
            errs.append(np.asarray(fs3.slam.p_w[s0]) - p_true)
            sigmas.append(np.sqrt(np.diag(Pff)))
        assert len(errs) >= 5
        errs, sigmas = np.array(errs), np.array(sigmas)
        norm = np.abs(errs) / np.maximum(sigmas, 1e-9)
        # consistent (and not wildly conservative): errors within a few sigma
        assert norm.mean() < 1.5
        assert norm.max() < 4.0
        # covariance must be PSD
        assert (sigmas > 0).all()


@pytest.mark.slow
class TestHybridEndToEnd:
    def test_close_range_promotes_and_tracks(self):
        from larvio_tpu.api import run_feature_sequence
        from larvio_tpu.data.evaluate import ate_rmse
        from larvio_tpu.data.sim import SimConfig, Simulator

        # promotion thresholds relaxed so the machinery engages deterministically
        cfg = VioConfig(
            filter=FilterConfig(slam_promote_obs=12, slam_max_init_sigma=1.5)
        )
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
