"""Dynamic (in-motion) initialization tests (ref:Initializer/*, SURVEY.md §3.4)."""

import numpy as np
import pytest

from larvio_tpu.config import VioConfig
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.init import FlexibleInitializer
from larvio_tpu.init.alignment import linear_alignment, solve_gyro_bias
from larvio_tpu.init.preintegration import Preintegration


@pytest.fixture(scope="module")
def moving_sim():
    cfg = VioConfig()
    sc = SimConfig(duration=8.0, static_lead_in=0.0, pixel_noise=0.001,
                   gyro_bias=(0.01, -0.02, 0.015))
    return cfg, sc, Simulator(sc, cfg)


class TestAlignmentExact:
    def test_perfect_inputs_recover_scale_gravity_velocity(self):
        cfg = VioConfig()
        sim = Simulator(SimConfig(duration=6.0, static_lead_in=0.0), cfg)
        tk = np.linspace(1.0, 2.0, 11)
        R_cb = np.asarray(sim.R_ci)
        p_bc = -R_cb.T @ np.asarray(sim.t_ci)
        R_wb, p_cam = [], []
        for t in tk:
            p, R_wi = sim.pose(np.asarray(t))
            R_wb.append(R_wi.T)
            p_cam.append((p + R_wi.T @ p_bc) / 2.0)  # SfM scale 1/2
        preints = []
        for k in range(len(tk) - 1):
            ts = np.linspace(tk[k], tk[k + 1], 21)
            w, a = sim.imu_samples(ts)
            preints.append(Preintegration().integrate(ts, w, a))
        bg = solve_gyro_bias(R_wb, preints)
        assert np.abs(bg).max() < 1e-3
        ok, s, g, v = linear_alignment(R_wb, p_cam, preints, p_bc, cfg.gravity)
        assert ok
        assert abs(s - 2.0) < 0.01
        np.testing.assert_allclose(g, [0, 0, -cfg.gravity], atol=0.05)
        h = 1e-4
        p1, _ = sim.pose(np.asarray(tk[-1] + h))
        p0, _ = sim.pose(np.asarray(tk[-1] - h))
        np.testing.assert_allclose(R_wb[-1] @ v[-1], (p1 - p0) / (2 * h), atol=0.02)


class TestFlexible:
    def test_dispatches_dynamic_when_moving(self, moving_sim):
        cfg, sc, sim = moving_sim
        data = sim.generate()
        ini = FlexibleInitializer(cfg, window=12, min_parallax=0.05)
        res = None
        for k in range(len(data["t_img"])):
            ini.push(
                data["t_img"][k], data["ids"][k], data["uv"][k], data["fvalid"][k],
                data["imu_t"][k], data["imu_w"][k], data["imu_a"][k], data["imu_valid"][k],
            )
            res = ini.try_init()
            if res is not None:
                break
        assert res is not None and res.mode == "dynamic"
        # gyro bias recovered to a few mrad/s
        np.testing.assert_allclose(res.bg, [0.01, -0.02, 0.015], atol=0.02)
        assert np.isfinite(res.v).all()

    def test_dispatches_static_when_still(self):
        cfg = VioConfig()
        sc = SimConfig(duration=3.0, static_lead_in=3.0, gyro_noise=0.002, acc_noise=0.02)
        sim = Simulator(sc, cfg)
        data = sim.generate()
        ini = FlexibleInitializer(cfg, window=10)
        res = None
        for k in range(len(data["t_img"])):
            ini.push(
                data["t_img"][k], data["ids"][k], data["uv"][k], data["fvalid"][k],
                data["imu_t"][k], data["imu_w"][k], data["imu_a"][k], data["imu_valid"][k],
            )
            res = ini.try_init()
            if res is not None:
                break
        assert res is not None and res.mode == "static"
