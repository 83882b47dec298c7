"""Square-root covariance path (SURVEY.md §7 hard part #2; VERDICT r2 #3).

`FilterConfig.sqrt_form=True` stores a factor S with P = S S^T and rebuilds
it through stacked-factor compression (core/linalg.psd_factor) instead of
Joseph multiply-and-add. Pinned here:

  * psd_factor reproduces M M^T to f32 accuracy and keeps zero rows zero
  * the sqrt filter matches the Joseph filter's trajectory and covariance
  * the f32 fragility class is GONE: at exactly-matched observation noise
    (0.002 — the setting the Joseph path's collapse guard exists for) the
    sqrt filter runs a 20-seed NEES batch with zero resets and calibrated
    velocity NEES
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig, FilterConfig, FrontendConfig, NoiseConfig
from larvio_tpu.api import run_feature_sequence
from larvio_tpu.core.linalg import psd_factor
from larvio_tpu.data.evaluate import ate_rmse
from larvio_tpu.data.sim import SimConfig, Simulator


class TestPsdFactor:
    def test_reproduces_gram(self, rng):
        for cond in (1.0, 1e3, 1e6):
            n, w = 40, 55
            U, _ = np.linalg.qr(rng.normal(size=(n, n)))
            sv = np.logspace(0, -0.5 * np.log10(cond), n)
            M = (U * sv) @ rng.normal(size=(n, w)).astype(np.float64)
            M = (M / np.abs(M).max()).astype(np.float32)
            S = np.asarray(psd_factor(jnp.asarray(M)))
            G = (M.astype(np.float64) @ M.T.astype(np.float64))
            G2 = S.astype(np.float64) @ S.T.astype(np.float64)
            scale = np.abs(G).max()
            # f32 two-pass factorization: entries to ~1e-5 relative; the
            # pass-2 jitter adds <= ~1e-6 relative on the diagonal
            np.testing.assert_allclose(G2 / scale, G / scale, atol=5e-5)

    def test_zero_rows_stay_zero(self, rng):
        n, w = 30, 40
        M = rng.normal(size=(n, w)).astype(np.float32)
        M[[3, 7, 20], :] = 0.0
        S = np.asarray(psd_factor(jnp.asarray(M)))
        imp = S @ S.T
        for i in (3, 7, 20):
            assert np.abs(imp[i, :]).max() < 1e-12
            assert np.abs(imp[:, i]).max() < 1e-12

    def test_nan_containment(self, rng):
        M = rng.normal(size=(20, 25)).astype(np.float32)
        M[2, 3] = np.nan
        S = np.asarray(psd_factor(jnp.asarray(M)))
        # falls back to a finite diagonal factor, never emits NaN
        assert np.all(np.isfinite(S) | (S == S))  # no NaN anywhere
        assert not np.any(np.isnan(S))


SMALL = dict(
    filter=dict(max_clones=8, max_update_features=12, imu_slots_per_frame=24),
    frontend=dict(max_features=48),
)


def _small_cfg(sqrt):
    return VioConfig(
        filter=FilterConfig(sqrt_form=sqrt, **SMALL["filter"]),
        frontend=FrontendConfig(**SMALL["frontend"]),
    )


class TestSqrtEquivalence:
    @pytest.fixture(scope="class")
    def runs(self):
        out = {}
        for sqrt in (False, True):
            cfg = _small_cfg(sqrt)
            sim = Simulator(
                SimConfig(duration=12.0, pixel_noise=0.002, gyro_noise=0.005,
                          acc_noise=0.05, gyro_bias=(0.01, -0.02, 0.015),
                          acc_bias=(0.05, -0.03, 0.08), n_landmarks=400),
                cfg,
            )
            data = sim.generate()
            vs, outs = run_feature_sequence(cfg, data)
            out[sqrt] = (cfg, data, vs, outs)
        return out

    def test_trajectory_parity(self, runs):
        _, data, _, o_j = runs[False]
        _, _, _, o_s = runs[True]
        m = np.asarray(o_j.initialized).astype(bool)
        ate_j = ate_rmse(np.asarray(o_j.p)[m], data["gt_p"][m])
        ate_s = ate_rmse(np.asarray(o_s.p)[m], data["gt_p"][m])
        # the reduced 8-clone window drifts more than the default config;
        # the gate here is parity, not absolute accuracy
        assert ate_j < 0.2 and ate_s < 0.2, (ate_j, ate_s)
        # the two algebras integrate the same information: ATE within 30%
        # of each other (identical modulo f32 ordering)
        assert abs(ate_s - ate_j) < 0.3 * max(ate_j, 0.01), (ate_j, ate_s)
        assert int(np.asarray(o_s.did_reset).sum()) == 0

    def test_covariance_parity(self, runs):
        # the reported 1-sigma envelopes must agree to ~25% at steady state —
        # same Riccati fixed point reached through different algebra
        _, _, _, o_j = runs[False]
        _, _, _, o_s = runs[True]
        for fld in ("p_std", "v_std"):
            a = np.asarray(getattr(o_j, fld))[-60:]
            b = np.asarray(getattr(o_s, fld))[-60:]
            ratio = b / np.maximum(a, 1e-6)
            med = np.median(ratio)
            assert 0.75 < med < 1.35, (fld, med)

    def test_implied_covariance_psd(self, runs):
        # the whole point: the implied covariance can never go indefinite.
        # Check the final factor state of the sqrt run.
        cfg, _, vs, _ = runs[True]
        S = np.asarray(vs.filter.P, np.float64)
        eig = np.linalg.eigvalsh(S @ S.T)
        # PSD by construction up to the roundoff of THIS f64 gram product
        # (~1e-16 * ||P||); the Joseph failure mode this replaces produced
        # order-1e-3 NEGATIVE diagonals
        assert eig.min() >= -1e-12 * max(eig.max(), 1.0)
        d = np.sum(np.asarray(vs.filter.P) ** 2, axis=1)
        assert np.all(np.isfinite(d)) and np.all(d >= 0.0)


@pytest.mark.slow
class TestSqrtExactNoiseNees:
    def test_exact_noise_no_collapse_and_calibrated_velocity(self):
        """The f32 fragility class at exactly-matched observation noise
        (0.002 = the sim's pixel noise) is ELIMINATED by the sqrt path.

        Measured head-to-head on this exact 20-seed batch (BASELINE.md r3):
          Joseph @0.002: 2 resets, worst-seed error 1.9 m, velocity NEES ~10
          sqrt   @0.002: 0 resets, worst-seed error 0.6 m, velocity NEES ~1.1

        r4-r5 closed the residual position overconfidence at the root
        (VERDICT r3 ask #1, r4 ask #1): the FEJ-frozen short-baseline
        triangulation bias of freshly-promoted landmarks drove
        horizontal-position NEES to ~20 at exact noise. The shipped fix is
        SELECTION PRESSURE, not a maturity gate: a small slam slot budget
        (max_slam_features=6) with count-ranked candidate selection admits
        only the best-observed (longest-baseline) tracks, plus the
        one-window lifetime cap (slam_max_lifetime=20) to relinearize
        through honest delayed re-init. (r4's full-window count gate had
        the same feature-level numbers but starved image-level promotion —
        the r4 bench regression; r5's span-gate probes were non-monotonic
        cliffs. Both deleted — see config.py max_slam_features.)
        Measured at the r5 defaults (TPU, tools/diag_nees.py, includes the
        per-observation outlier trim — config.tri_trim_k):
          nees_p [0.55, 0.54, 0.47], quarters [0.55, 0.49, 0.53, 0.61]
          nees_v [0.32, 0.33, 0.32], worst err 0.305 m, ATE-like 0.098 m.
        The gates pin: no resets, finite everywhere, CALIBRATED velocity
        AND position NEES (< 3), worst-seed error < 0.6 m (~2x margin).
        """
        from larvio_tpu.api import make_frame_inputs
        from larvio_tpu.parallel.fleet import init_fleet_state, run_fleet_sequence

        cfg = VioConfig(
            filter=FilterConfig(sqrt_form=True),
            noise=NoiseConfig(observation_noise=0.002),
        )
        N_SEEDS = 20
        datas = [
            Simulator(
                SimConfig(duration=10.0, pixel_noise=0.002, gyro_noise=0.005,
                          acc_noise=0.05, seed=s),
                cfg,
            ).generate()
            for s in range(N_SEEDS)
        ]
        stacked = {k: np.stack([d[k] for d in datas], axis=1) for k in datas[0]}
        feats, imu = make_frame_inputs(stacked)
        vs = init_fleet_state(cfg, N_SEEDS)
        vs, outs = run_fleet_sequence(cfg, vs, feats, imu)
        outs = jax.tree.map(np.asarray, outs)

        # the collapse class is gone: zero resets, everything finite
        assert int(outs.did_reset.sum()) == 0
        assert np.all(np.isfinite(outs.p))

        m = outs.initialized.astype(bool)
        sel = m.copy()
        sel[: 5 * 20] = False
        gt = stacked["gt_p"]
        # velocity NEES: observable — must actually calibrate (measured 1.1)
        t = stacked["t_img"]
        gt_v = np.gradient(gt, axis=0) / np.gradient(t, axis=0)[..., None]
        err_v = outs.v - gt_v
        nees_v = (err_v**2 / np.maximum(outs.v_std, 1e-6) ** 2)[sel].mean(axis=0)
        assert np.all(nees_v < 3.0), nees_v
        assert np.all(nees_v > 0.05), nees_v
        # position: CALIBRATED (measured [0.55, 0.54, 0.47] at the r5
        # defaults; was ~10 at r3 defaults, Joseph >700 here)
        err_p = outs.p - gt
        nees_p = (err_p**2 / np.maximum(outs.p_std, 1e-6) ** 2)[sel].mean(axis=0)
        assert np.all(nees_p < 3.0), nees_p
        assert np.all(nees_p > 0.05), nees_p
        # worst-seed absolute error bounded (measured 0.305 m; Joseph 1.9 m)
        errs = np.linalg.norm(outs.p - gt, axis=-1)
        assert errs.max() < 0.6, errs.max()
