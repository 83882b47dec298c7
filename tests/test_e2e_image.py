"""Image-level end-to-end test: rendered frames -> full pipeline -> ATE.

The complete TPU-native equivalent of the reference's dataset loop
(SURVEY.md §3.1): images + IMU in, trajectory out, everything jitted.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvio_tpu.config import VioConfig
from larvio_tpu.data.evaluate import ate_rmse
from larvio_tpu.data.render import render_sequence
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.models.propagation import ImuBatch
from larvio_tpu.pipeline import FrameInput, init_pipeline_state, run_image_sequence


@pytest.mark.slow
def test_image_pipeline_end_to_end():
    cfg = VioConfig()
    sim = Simulator(SimConfig(duration=8.0), cfg)
    data = sim.generate()
    imgs = render_sequence(cfg, sim, data["t_img"])

    frames = FrameInput(
        image=jnp.asarray(imgs),
        imu=ImuBatch(
            t=jnp.asarray(data["imu_t"]),
            w=jnp.asarray(data["imu_w"]),
            a=jnp.asarray(data["imu_a"]),
            valid=jnp.asarray(data["imu_valid"]),
        ),
        t=jnp.asarray(data["t_img"]),
    )
    ps = init_pipeline_state(cfg)
    ps, outs = run_image_sequence(cfg, ps, frames)
    outs = jax.tree.map(np.asarray, outs)

    m = outs.initialized.astype(bool)
    assert m.sum() > 100  # initialized early
    assert int(outs.did_reset.sum()) == 0
    assert outs.n_tracks[m].mean() > 80  # healthy track count
    ate = ate_rmse(outs.p[m], data["gt_p"][m])
    # 0.009 measured after the r4 two-point-RANSAC residual fix (the old
    # noise/flow-ratio residual killed most true inliers during motion)
    assert ate < 0.03, f"image-level ATE {ate:.3f}"


@pytest.mark.slow
def test_image_pipeline_noisy_bench_workload():
    """CPU-scale replica of bench.py's realistic-noise workload (VERDICT r4
    missing #2): EuRoC-grade IMU noise + biases + ~2/255 image sensor noise
    through the full image pipeline.

    This is the regression net the TPU bench cannot provide on CPU-only
    days: the r4 promotion-default regression (image-level slam starvation,
    bench ATE 0.1422 vs the 0.13 gate) was invisible to every CLEAN-pixel
    image test in the suite. Shorter than the bench (150 vs 400 frames) so
    the band differs; measured 0.0371 at the r5 defaults after the ORB
    descriptor-blur fix (pre-fix, the same workload ran ~0.10-0.14: sensor
    noise flipped ~28% of raw-image BRIEF bits, the descriptor gate killed
    >50% of true tracks at age 0, and the filter ran on churned 4-frame
    tracks). Gate 0.08 ~ 2x the measured value.
    """
    cfg = VioConfig()
    sim = Simulator(
        SimConfig(duration=7.5, gyro_noise=0.005, acc_noise=0.05,
                  gyro_bias=(0.01, -0.02, 0.015), acc_bias=(0.05, -0.03, 0.08)),
        cfg,
    )
    data = sim.generate()
    imgs = render_sequence(cfg, sim, data["t_img"])
    # image sensor noise, same scale as bench.py (0-255 gray levels)
    noise = jax.random.normal(jax.random.PRNGKey(0), imgs.shape, jnp.float32)
    images = jnp.asarray(imgs) + 2.0 * noise

    frames = FrameInput(
        image=images,
        imu=ImuBatch(
            t=jnp.asarray(data["imu_t"]),
            w=jnp.asarray(data["imu_w"]),
            a=jnp.asarray(data["imu_a"]),
            valid=jnp.asarray(data["imu_valid"]),
        ),
        t=jnp.asarray(data["t_img"]),
    )
    ps = init_pipeline_state(cfg)
    ps, outs = run_image_sequence(cfg, ps, frames)
    outs = jax.tree.map(np.asarray, outs)

    m = outs.initialized.astype(bool)
    assert m.sum() > 100
    assert int(outs.did_reset.sum()) == 0
    assert np.all(np.isfinite(outs.p))
    ate = ate_rmse(outs.p[m], data["gt_p"][m])
    assert ate < 0.08, f"noisy image-level ATE {ate:.4f}"


@pytest.mark.slow
def test_image_pipeline_moving_start_flexible():
    """Moving start through the scan-mode driver (VERDICT r1 #6): the
    two-phase run_image_sequence_flexible must dynamically initialize and
    converge — the pure scan path never initializes in-motion starts."""
    from larvio_tpu.pipeline import run_image_sequence_flexible

    cfg = VioConfig()
    sim = Simulator(SimConfig(duration=10.0, static_lead_in=0.0,
                              gyro_bias=(0.01, -0.02, 0.015)), cfg)
    data = sim.generate()
    imgs = render_sequence(cfg, sim, data["t_img"])
    frames = FrameInput(
        image=jnp.asarray(imgs),
        imu=ImuBatch(
            t=jnp.asarray(data["imu_t"]),
            w=jnp.asarray(data["imu_w"]),
            a=jnp.asarray(data["imu_a"]),
            valid=jnp.asarray(data["imu_valid"]),
        ),
        t=jnp.asarray(data["t_img"]),
    )
    ps = init_pipeline_state(cfg)
    ps, outs = run_image_sequence_flexible(cfg, ps, frames)
    outs = jax.tree.map(np.asarray, outs)
    m = outs.initialized.astype(bool)
    assert m.sum() > 175  # dynamic init fires within ~1.5 s (measured: 0.85 s)
    assert int(outs.did_reset.sum()) == 0
    ate = ate_rmse(outs.p[m], data["gt_p"][m])
    # VERDICT r3 #7 asked for <=0.3 (the feature-level gate); measured 0.012
    # after the r4 fixes (two-point-RANSAC residual units, static-init image
    # gate, host-stationary image evidence, min_parallax 0.12 -> 0.06)
    assert ate < 0.15, f"moving-start image-level ATE {ate:.3f}"
