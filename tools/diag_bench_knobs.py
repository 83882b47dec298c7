"""Image-level bench ATE/fps at slam promotion/lifetime knob settings.

Usage (repo root): python tools/diag_bench_knobs.py slam_promote_obs=18 ...
Reuses bench.py's exact sim/render/pipeline flow (realistic noise), prints
one JSON line with ate and fps for the knob combo.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main(kw):
    import jax
    import jax.numpy as jnp

    from larvio_tpu.config import FilterConfig, FrontendConfig, NoiseConfig, VioConfig
    from larvio_tpu.data.evaluate import ate_rmse
    from larvio_tpu.data.render import Renderer
    from larvio_tpu.data.sim import SimConfig, Simulator
    from larvio_tpu.models.propagation import ImuBatch
    from larvio_tpu.pipeline import FrameInput, init_pipeline_state, run_image_sequence

    all_kw = dict(kw)
    n_frames_target = int(kw.pop("frames", 400))
    # route fe_*-prefixed knobs to FrontendConfig, noise_* to NoiseConfig
    fe_kw = {k[3:]: kw.pop(k) for k in list(kw) if k.startswith("fe_")}
    nz_kw = {k[6:]: kw.pop(k) for k in list(kw) if k.startswith("noise_")}
    cfg = VioConfig(
        filter=FilterConfig(**kw),
        frontend=FrontendConfig(**fe_kw),
        noise=NoiseConfig(**nz_kw),
    )
    sim = Simulator(
        SimConfig(duration=n_frames_target / 20.0, gyro_noise=0.005,
                  acc_noise=0.05, gyro_bias=(0.01, -0.02, 0.015),
                  acc_bias=(0.05, -0.03, 0.08)),
        cfg,
    )
    data = sim.generate()
    T = len(data["t_img"])

    rend = Renderer(cfg, np.asarray(sim.landmarks))
    R_ci, t_ci = np.asarray(sim.R_ci), np.asarray(sim.t_ci)
    imgs = []
    for t in data["t_img"]:
        p_w, R_wi = sim.pose(np.asarray(t))
        R_cw = R_ci @ R_wi
        p_cam = p_w + R_wi.T @ (-R_ci.T @ t_ci)
        imgs.append(rend.render(jnp.asarray(R_cw.T, jnp.float32),
                                jnp.asarray(p_cam, jnp.float32)))
    images = jnp.stack(imgs)
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

    ps = init_pipeline_state(cfg)
    ps_out, outs = run_image_sequence(cfg, ps, frames)
    jax.block_until_ready(outs.p)
    best = np.inf
    for _ in range(2):
        ps = init_pipeline_state(cfg)
        t0 = time.perf_counter()
        ps_out, outs = run_image_sequence(cfg, ps, frames)
        jax.block_until_ready(outs.p)
        best = min(best, time.perf_counter() - t0)

    m = np.asarray(outs.initialized, bool)
    p = np.asarray(outs.p)[m]
    gt = np.asarray(data["gt_p"])[m]
    ate = float(ate_rmse(p, gt))
    print(json.dumps({
        "knobs": {k: str(v) for k, v in all_kw.items()}, "ate": round(ate, 4), "fps": round(T / best, 1),
        "resets": int(np.asarray(outs.did_reset).sum()),
        "n_slam": float(np.asarray(outs.n_slam)[m].mean()) if hasattr(outs, "n_slam") else None,
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = eval(v)
    main(kw)
