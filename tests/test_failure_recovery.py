"""Failure detection / recovery, exercised end-to-end (SURVEY.md §5; VERDICT
r2 #2: the reset channel existed but every test asserted ``resets == 0``).

Two claims are pinned here:

1. A catastrophic in-flight fault (1 s of NaN IMU — e.g. a dropped sensor
   bus) triggers the online reset, the filter re-bootstraps through the
   consume channel, and the post-recovery trajectory re-converges with
   bounded error and finite outputs (ref:onlineReset's role in LarVio).

2. One NaN-poisoned instance in a vmapped fleet batch CANNOT corrupt the
   other lanes: their trajectories are bit-identical to a clean batch
   (the containment claim at update.py apply_update).
"""

import numpy as np
import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig, FilterConfig, FrontendConfig
from larvio_tpu.api import make_frame_inputs, run_feature_sequence
from larvio_tpu.data.evaluate import ate_rmse
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.parallel.fleet import init_fleet_state, run_fleet_sequence


class TestOnlineResetRecovery:
    def _run(self, poison):
        cfg = VioConfig()
        sim = Simulator(
            SimConfig(duration=40.0, pixel_noise=0.002, gyro_noise=0.005,
                      acc_noise=0.05, gyro_bias=(0.01, -0.02, 0.015),
                      acc_bias=(0.05, -0.03, 0.08)),
            cfg,
        )
        data = sim.generate()
        bad = {k: v.copy() for k, v in data.items()}
        poison(bad)
        vs, outs = run_feature_sequence(cfg, bad)
        return cfg, data, vs, outs

    def test_nan_imu_fault_resets_and_reconverges(self):
        # frames 400-419 = 1 s of NaN accelerometer at t = 20 s
        cfg, data, vs, outs = self._run(
            lambda bad: bad["imu_a"].__setitem__(slice(400, 420), np.nan)
        )
        resets = np.asarray(outs.did_reset)
        # the guard fires (once per poisoned frame while the fault persists)
        assert resets.sum() >= 1
        assert resets[:400].sum() == 0, "no resets before the fault"
        assert resets[450:].sum() == 0, "no late resets after recovery"
        # every emitted output stays finite THROUGH the fault
        for name in ("q", "p", "v", "bg", "ba", "td"):
            assert np.all(np.isfinite(np.asarray(getattr(outs, name)))), name
        # covariance healthy at the end
        diagP = np.diagonal(np.asarray(vs.filter.P))
        assert np.all(np.isfinite(diagP))
        # re-convergence: the filter re-bootstraps from scratch mid-motion
        # (velocity restarts at 0 against a ~1.1 m/s true speed). Aligned ATE
        # over the final 10 s must come back to sub-half-meter, and the
        # velocity error to a small fraction of the true speed.
        p = np.asarray(outs.p)
        gt = data["gt_p"]
        assert ate_rmse(p[600:], gt[600:]) < 0.5
        gv = np.gradient(gt.astype(np.float64), 1.0 / 20.0, axis=0)
        verr = np.linalg.norm(np.asarray(outs.v)[700:] - gv[700:], axis=1)
        assert np.median(verr) < 0.35, float(np.median(verr))

    def test_attitude_survives_fault_untouched(self):
        # the gyro keeps integrating through an accel-only fault, so the
        # recovery must NOT re-open roll/pitch: tilt error right after the
        # recovery updates stays within a few degrees (without calibration
        # preservation the reset prior admits ~7 deg and the first updates
        # injected ~4 deg of tilt; with it the gravity leak stays bounded
        # and decays)
        from larvio_tpu.core.quaternion import quat_to_rotation

        cfg, data, vs, outs = self._run(
            lambda bad: bad["imu_a"].__setitem__(slice(400, 420), np.nan)
        )
        Rq = np.asarray(jax.vmap(quat_to_rotation)(jnp.asarray(outs.q)))
        Rt = data["gt_R"]
        ez = np.array([0.0, 0.0, 1.0])

        def tilt(k):
            return float(np.degrees(np.arccos(np.clip((Rq[k] @ ez) @ (Rt[k] @ ez), -1, 1))))

        assert tilt(399) < 0.5  # healthy before the fault
        assert max(tilt(k) for k in range(440, 520, 10)) < 5.0
        assert tilt(799) < 1.0  # decayed by the end


class TestGyroFaultRecovery:
    """The ATTITUDE-loss variant (VERDICT r3 #8): a NaN gyro bus kills q — the
    hardest reset, because the restart must re-learn monocular scale mid-motion
    from the accelerometer alone. Pins two mechanisms:

      * the reset re-seeds roll/pitch from the last finite accel sample
        (gravity direction; yaw restarts unobservable), and
      * the roll/pitch prior stays TIGHT (reset_accel_seed_rp_std) so the
        re-bootstrap cannot explain the scale-induced accel residual as tilt
        (at a 0.2 rad prior the restart locks in a ~2x scale error with ba
        absorbing the periodic residual; at 0.05 rad it recovers).
    """

    def test_nan_gyro_fault_reseeds_attitude_and_recovers_scale(self):
        from larvio_tpu.core.quaternion import quat_to_rotation

        cfg = VioConfig()
        sim = Simulator(
            SimConfig(duration=40.0, pixel_noise=0.002, gyro_noise=0.005,
                      acc_noise=0.05, gyro_bias=(0.01, -0.02, 0.015),
                      acc_bias=(0.05, -0.03, 0.08)),
            cfg,
        )
        data = sim.generate()
        bad = {k: v.copy() for k, v in data.items()}
        bad["imu_w"][400:420] = np.nan  # 1 s of NaN gyro at t = 20 s
        vs, outs = run_feature_sequence(cfg, bad)

        resets = np.asarray(outs.did_reset)
        assert resets.sum() >= 1
        assert resets[:400].sum() == 0, "no resets before the fault"
        assert resets[540:].sum() == 0, "no late resets after recovery"
        for name in ("q", "p", "v", "bg", "ba", "td"):
            assert np.all(np.isfinite(np.asarray(getattr(outs, name)))), name

        # the accel seed worked: tilt (gravity-direction error — yaw-free)
        # comes back to a few degrees right after the fault and decays
        Rq = np.asarray(jax.vmap(quat_to_rotation)(jnp.asarray(outs.q)))
        Rt = data["gt_R"]
        ez = np.array([0.0, 0.0, 1.0])

        def tilt(k):
            return float(np.degrees(np.arccos(
                np.clip((Rq[k] @ ez) @ (Rt[k] @ ez), -1, 1))))

        assert tilt(399) < 0.5  # healthy before the fault
        assert max(tilt(k) for k in range(430, 520, 10)) < 5.0
        assert tilt(799) < 2.0

        # monocular scale re-converges: speed (yaw-invariant) tracks truth.
        # The post-reset odometry yaw is arbitrary, so raw velocity cannot be
        # compared; speed can.
        gv = np.gradient(data["gt_p"].astype(np.float64), 1 / 20.0, axis=0)
        sp_err = np.abs(
            np.linalg.norm(np.asarray(outs.v), axis=1).astype(np.float64)
            - np.linalg.norm(gv, axis=1)
        )
        true_speed = np.median(np.linalg.norm(gv[700:], axis=1))
        assert np.median(sp_err[700:]) < 0.35 * true_speed, (
            float(np.median(sp_err[700:])), float(true_speed))


class TestFleetNaNLaneIsolation:
    def test_poisoned_lane_cannot_corrupt_the_batch(self):
        cfg = VioConfig(
            filter=FilterConfig(max_clones=8, max_update_features=12,
                                imu_slots_per_frame=24),
            frontend=FrontendConfig(max_features=48),
        )
        sim = Simulator(SimConfig(duration=6.0, pixel_noise=0.001, n_landmarks=400), cfg)
        data = sim.generate()
        feats, imu = make_frame_inputs(data)
        B = 3

        def batched(tree):
            return jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a[:, None], (a.shape[0], B, *a.shape[1:])
                ),
                tree,
            )

        featsB, imuB = batched(feats), batched(imu)
        # poison lane 1: NaN accelerometer for 1 s mid-sequence
        a = np.asarray(imuB.a).copy()
        a[40:60, 1] = np.nan
        imuB_bad = imuB._replace(a=jnp.asarray(a))

        vs_clean, outs_clean = run_fleet_sequence(
            cfg, init_fleet_state(cfg, B), featsB, imuB
        )
        vs_bad, outs_bad = run_fleet_sequence(
            cfg, init_fleet_state(cfg, B), featsB, imuB_bad
        )
        # the poisoned lane visibly faulted ...
        assert np.asarray(outs_bad.did_reset)[:, 1].sum() >= 1
        # ... yet stays finite (containment + reset sanitization)
        assert np.all(np.isfinite(np.asarray(outs_bad.p)[:, 1]))
        assert np.all(np.isfinite(np.asarray(vs_bad.filter.P)[1]))
        # and the OTHER lanes are bit-identical to the clean batch
        for lane in (0, 2):
            np.testing.assert_array_equal(
                np.asarray(outs_bad.p)[:, lane], np.asarray(outs_clean.p)[:, lane]
            )
            np.testing.assert_array_equal(
                np.asarray(outs_bad.q)[:, lane], np.asarray(outs_clean.q)[:, lane]
            )
            np.testing.assert_array_equal(
                np.asarray(vs_bad.filter.P)[lane], np.asarray(vs_clean.filter.P)[lane]
            )
        assert np.asarray(outs_bad.did_reset)[:, (0, 2)].sum() == 0
