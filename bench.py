"""Benchmark: full image-pipeline VIO throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

Metric: EuRoC-format frames/sec/chip through the COMPLETE pipeline (image ->
pyramid -> detect -> gyro-predicted LK -> ORB -> RANSAC -> hybrid-MSCKF),
whole sequence under one lax.scan on-device (BASELINE.json:2).

vs_baseline: the reference publishes no numbers (BASELINE.md); the anchor is
the stated target of 10x real-time at EuRoC's 20 Hz camera rate = 200 fps per
chip (BASELINE.json:5). vs_baseline = fps / 200, so 1.0 == target met.

Accuracy is asserted as a side condition (ATE gate) so the number can't be
bought by breaking the filter.
"""

import json
import sys
import time

import numpy as np


def main(fleet: int = 0, joseph: bool = False):
    import jax
    import jax.numpy as jnp

    from larvio_tpu.config import FilterConfig, VioConfig
    from larvio_tpu.data.evaluate import ate_rmse
    from larvio_tpu.data.render import Renderer
    from larvio_tpu.data.sim import SimConfig, Simulator
    from larvio_tpu.models.propagation import ImuBatch
    from larvio_tpu.pipeline import FrameInput, init_pipeline_state, run_image_sequence

    n_frames_target = 400  # 20 s @ 20 Hz
    # default config = square-root covariance (round 3 flip); --joseph benches
    # the r1/r2 Joseph-form baseline for A/B comparisons
    cfg = VioConfig(filter=FilterConfig(sqrt_form=False)) if joseph else VioConfig()
    # realistic-noise gate (VERDICT r2 #7): the fps number is conditioned on
    # accuracy under EuRoC-grade IMU noise + biases and image sensor noise —
    # a perf change that buys speed by degrading noise robustness fails here,
    # not only in the (slower) test suite
    sim = Simulator(
        SimConfig(duration=n_frames_target / 20.0, gyro_noise=0.005,
                  acc_noise=0.05, gyro_bias=(0.01, -0.02, 0.015),
                  acc_bias=(0.05, -0.03, 0.08)),
        cfg,
    )
    data = sim.generate()
    T = len(data["t_img"])

    # render on device (not timed)
    rend = Renderer(cfg, np.asarray(sim.landmarks))
    R_ci, t_ci = np.asarray(sim.R_ci), np.asarray(sim.t_ci)
    imgs = []
    for t in data["t_img"]:
        p_w, R_wi = sim.pose(np.asarray(t))
        R_cw = R_ci @ R_wi
        p_cam = p_w + R_wi.T @ (-R_ci.T @ t_ci)
        imgs.append(rend.render(jnp.asarray(R_cw.T, jnp.float32), jnp.asarray(p_cam, jnp.float32)))
    images = jnp.stack(imgs)
    # image sensor noise (0-255 scale): ~2 gray levels, the camera-side
    # counterpart of the feature-level pixel_noise=0.002 gates in tests/
    noise = jax.random.normal(jax.random.PRNGKey(0), images.shape, images.dtype)
    images = images + 2.0 * noise
    jax.block_until_ready(images)

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

    if fleet:
        # within-chip fleet: B independent instances vmapped through the SAME
        # image-level step (batched Pallas LK grid, VERDICT r1 #5). Aggregate
        # fps counts all instances' frames.
        from functools import partial

        B = fleet
        bframes = jax.tree.map(
            lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B, *a.shape[1:])),
            frames,
        )

        @partial(jax.jit, static_argnums=0, donate_argnums=1)
        def run_fleet(cfg, ps, bframes):
            from larvio_tpu.pipeline import pipeline_step

            def body(carry, frame):
                return jax.vmap(lambda p, f: pipeline_step(cfg, p, f))(carry, frame)

            return jax.lax.scan(body, ps, bframes)

        def fresh():
            one = init_pipeline_state(cfg)
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a[None], (B, *a.shape)), one
            )

        ps_out, outs = run_fleet(cfg, fresh(), bframes)
        jax.block_until_ready(outs.p)
        best = np.inf
        for _ in range(3):
            ps = fresh()
            t0 = time.perf_counter()
            ps_out, outs = run_fleet(cfg, ps, bframes)
            jax.block_until_ready(outs.p)
            best = min(best, time.perf_counter() - t0)
        fps = B * T / best
        outs = jax.tree.map(lambda a: a[:, 0], outs)  # instance 0 for the gate
    else:
        # compile (first run) — donated carry means a fresh state per run
        ps = init_pipeline_state(cfg)
        ps_out, outs = run_image_sequence(cfg, ps, frames)
        jax.block_until_ready(outs.p)

        # timed runs
        best = np.inf
        for _ in range(3):
            ps = init_pipeline_state(cfg)
            t0 = time.perf_counter()
            ps_out, outs = run_image_sequence(cfg, ps, frames)
            jax.block_until_ready(outs.p)
            best = min(best, time.perf_counter() - t0)

        fps = T / best

    # accuracy side-gate: the fps number is void if the filter is broken
    outs_np = jax.tree.map(np.asarray, outs)
    m = outs_np.initialized.astype(bool)
    ate = ate_rmse(outs_np.p[m], data["gt_p"][m])
    # measured band under the realistic-noise workload: 0.09-0.10 m (clean
    # pixels measured 0.03). 0.13 leaves margin for tunnel-run variance while
    # still failing on any real accuracy regression (the r2 update-merge class
    # of bug cost 3x).
    assert np.isfinite(ate) and ate < 0.13, f"accuracy gate failed: ATE {ate}"

    print(
        json.dumps(
            {
                "metric": (
                    "synthetic_euroc_image_pipeline_fps_per_chip"
                    if not fleet
                    else f"synthetic_euroc_fleet_b{fleet}_aggregate_fps_per_chip"
                ) + ("_joseph" if joseph else ""),
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 3),
                "detail": {
                    "frames": int(T),
                    "wall_s": round(best, 3),
                    "ate_m": round(float(ate), 4),
                    "noise": "imu(0.005/0.05)+bias+image(2/255)",
                    "realtime_factor": round(fps / 20.0, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    fleet = 0
    if len(sys.argv) > 2 and sys.argv[1] == "--fleet":
        fleet = int(sys.argv[2])
    sys.exit(main(fleet, joseph="--joseph" in sys.argv))
