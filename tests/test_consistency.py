"""Statistical consistency (NEES), robustness to outliers, fisheye e2e.

The NEES check is the filter-consistency tier SURVEY.md §4 calls for: with a
simulated trajectory the estimator's reported covariance must explain its own
errors (no overconfidence).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig, load_yaml
from larvio_tpu.data.evaluate import ate_rmse
from larvio_tpu.data.sim import SimConfig, Simulator


@pytest.mark.slow
class TestConsistency:
    def test_position_nees_bounded(self):
        from larvio_tpu.api import run_feature_sequence

        cfg = VioConfig()
        sc = SimConfig(duration=15.0, pixel_noise=0.002, gyro_noise=0.005,
                       acc_noise=0.05)
        data = Simulator(sc, cfg).generate()
        vs, outs = run_feature_sequence(cfg, data)
        m = np.asarray(outs.initialized, bool)
        err = np.asarray(outs.p)[m] - data["gt_p"][m]
        std = np.asarray(outs.p_std)[m]
        # diagonal-approximate NEES per axis, averaged over the run
        nees = (err**2 / np.maximum(std, 1e-6) ** 2).mean(axis=0)
        # consistent-ish: no gross overconfidence (NEES >> 3/axis) and the
        # covariance is not absurdly inflated either
        assert np.all(nees < 12.0), nees
        assert np.all(std[-1] > 1e-4)

    def test_outlier_injection_robustness(self):
        """Gross feature outliers (mismatched tracks) must not break the
        filter: Huber weighting + chi2 gating absorb them."""
        from larvio_tpu.api import run_feature_sequence

        cfg = VioConfig()
        sc = SimConfig(duration=15.0, pixel_noise=0.002)
        data = Simulator(sc, cfg).generate()
        rng = np.random.default_rng(3)
        # corrupt 3% of valid observations with large offsets (bad matches)
        mask = data["fvalid"] & (rng.random(data["fvalid"].shape) < 0.03)
        data["uv"] = data["uv"] + np.where(
            mask[..., None], rng.uniform(0.05, 0.2, data["uv"].shape) *
            rng.choice([-1.0, 1.0], data["uv"].shape), 0.0
        ).astype(np.float32)
        vs, outs = run_feature_sequence(cfg, data)
        m = np.asarray(outs.initialized, bool)
        assert int(np.asarray(outs.did_reset).sum()) == 0
        assert ate_rmse(np.asarray(outs.p)[m], data["gt_p"][m]) < 0.15


@pytest.mark.slow
def test_fisheye_image_pipeline_end_to_end():
    """UZH-FPV-style equidistant camera through the full image pipeline
    (BASELINE.json:10 config)."""
    from larvio_tpu.data.render import Renderer
    from larvio_tpu.models.propagation import ImuBatch
    from larvio_tpu.pipeline import FrameInput, init_pipeline_state, run_image_sequence

    cfg = load_yaml("configs/uzh_fpv.yaml")
    assert cfg.camera.distortion_model == "equidistant"
    sim = Simulator(SimConfig(duration=8.0, landmark_z=(4.0, 10.0)), cfg)
    data = sim.generate()
    rend = Renderer(cfg, np.asarray(sim.landmarks))
    R_ci, t_ci = np.asarray(sim.R_ci), np.asarray(sim.t_ci)
    imgs = []
    for t in data["t_img"]:
        p_w, R_wi = sim.pose(np.asarray(t))
        imgs.append(
            rend.render(
                jnp.asarray((R_ci @ R_wi).T, jnp.float32),
                jnp.asarray(p_w + R_wi.T @ (-R_ci.T @ t_ci), jnp.float32),
            )
        )
    frames = FrameInput(
        image=jnp.stack(imgs),
        imu=ImuBatch(
            t=jnp.asarray(data["imu_t"]), w=jnp.asarray(data["imu_w"]),
            a=jnp.asarray(data["imu_a"]), valid=jnp.asarray(data["imu_valid"]),
        ),
        t=jnp.asarray(data["t_img"]),
    )
    ps = init_pipeline_state(cfg)
    ps, outs = run_image_sequence(cfg, ps, frames)
    outs = jax.tree.map(np.asarray, outs)
    m = outs.initialized.astype(bool)
    assert int(outs.did_reset.sum()) == 0
    assert outs.n_tracks[m].mean() > 40
    assert ate_rmse(outs.p[m], data["gt_p"][m]) < 0.2
