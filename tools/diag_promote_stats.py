"""Image-level promotion-eligibility statistics on the bench workload.

Host-loops pipeline_step over the bench sim (realistic noise) and reads the
observation table each frame: how many live (non-slam-owned) tracks exist at
each n_obs level, the window occupancy, and the per-frame count of tracks
that would pass various promotion-count thresholds. Answers: is obs=20
reachable at image level, and what starves it.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(kw):
    import jax
    import jax.numpy as jnp

    from larvio_tpu.config import FilterConfig, VioConfig
    from larvio_tpu.data.render import Renderer
    from larvio_tpu.data.sim import SimConfig, Simulator
    from larvio_tpu.models.propagation import ImuBatch
    from larvio_tpu.pipeline import FrameInput, init_pipeline_state, pipeline_step

    n_frames = int(kw.pop("frames", 300))
    cfg = VioConfig(filter=FilterConfig(**kw))
    sim = Simulator(
        SimConfig(duration=n_frames / 20.0, gyro_noise=0.005,
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

    from functools import partial

    step = jax.jit(partial(pipeline_step, cfg))
    ps = init_pipeline_state(cfg)

    obs_hist = np.zeros(cfg.filter.max_clones + 1, np.int64)  # n_obs histogram (live rows)
    per_thresh = {th: 0 for th in (8, 10, 12, 14, 16, 18, 19, 20)}
    span_thresh = {th: 0 for th in (20, 30, 40, 60)}
    depth_seq = []  # clone window temporal depth (frames, newest-oldest+1)
    n_valid_clones_seq = []
    n_slam_seq = []
    track_age_at_death = []
    prev_ids = None
    prev_age = None
    for k in range(T):
        frame = FrameInput(
            image=images[k],
            imu=ImuBatch(
                t=jnp.asarray(data["imu_t"][k]),
                w=jnp.asarray(data["imu_w"][k]),
                a=jnp.asarray(data["imu_a"][k]),
                valid=jnp.asarray(data["imu_valid"][k]),
            ),
            t=jnp.asarray(data["t_img"][k]),
        )
        ps, out = step(ps, frame)
        if k < 60 or k % 2:  # skip warmup, sample every other frame
            # track deaths still need continuous ids
            ids_now = np.asarray(ps.tracker.ids)
            age_now = np.asarray(ps.tracker.age)
            if prev_ids is not None:
                died = (prev_ids >= 0) & (ids_now != prev_ids)
                track_age_at_death.extend(prev_age[died].tolist())
            prev_ids, prev_age = ids_now, age_now
            continue
        fs = ps.vio.filter
        obs_valid = np.asarray(fs.obs.valid)
        track_id = np.asarray(fs.obs.track_id)
        clones_valid = np.asarray(fs.clones.valid)
        owned_slots = np.asarray(fs.slam.valid)
        n_obs = (obs_valid & clones_valid[None, :]).sum(axis=1)
        live = track_id >= 0
        counts = n_obs[live]
        for c in counts:
            obs_hist[min(int(c), cfg.filter.max_clones)] += 1
        for th in per_thresh:
            per_thresh[th] += int((counts >= th).sum())
        # observation SPAN (frames, newest-oldest observing clone) per live row
        cframe = np.asarray(fs.clones.frame)
        om = obs_valid & clones_valid[None, :]
        f_hi = np.where(om, cframe[None, :], -(1 << 30)).max(axis=1)
        f_lo = np.where(om, cframe[None, :], 1 << 30).min(axis=1)
        span = np.where(n_obs > 0, f_hi - f_lo + 1, 0)[live]
        for th in span_thresh:
            span_thresh[th] += int((span >= th).sum())
        if clones_valid.sum() >= 2:
            depth_seq.append(int(cframe[clones_valid].max() - cframe[clones_valid].min() + 1))
        n_valid_clones_seq.append(int(clones_valid.sum()))
        n_slam_seq.append(int(owned_slots.sum()))
        ids_now = np.asarray(ps.tracker.ids)
        age_now = np.asarray(ps.tracker.age)
        if prev_ids is not None:
            died = (prev_ids >= 0) & (ids_now != prev_ids)
            track_age_at_death.extend(prev_age[died].tolist())
        prev_ids, prev_age = ids_now, age_now

    ages = np.asarray(track_age_at_death)
    print(json.dumps({
        "knobs": {k: str(v) for k, v in kw.items()},
        "frames": T,
        "n_valid_clones_mean": round(float(np.mean(n_valid_clones_seq)), 1),
        "n_slam_mean": round(float(np.mean(n_slam_seq)), 2),
        "rows_at_n_obs": {str(i): int(obs_hist[i]) for i in range(len(obs_hist)) if obs_hist[i]},
        "frames_sampled": len(n_valid_clones_seq),
        "rows_ge_thresh_per_sample": {
            str(th): round(v / max(len(n_valid_clones_seq), 1), 2)
            for th, v in per_thresh.items()
        },
        "rows_span_ge_per_sample": {
            str(th): round(v / max(len(n_valid_clones_seq), 1), 2)
            for th, v in span_thresh.items()
        },
        "window_depth_frames": {
            "median": float(np.median(depth_seq)) if depth_seq else None,
            "p90": float(np.percentile(depth_seq, 90)) if depth_seq else None,
            "max": int(max(depth_seq)) if depth_seq else None,
        },
        "track_death_age": {
            "n": int(ages.size),
            "median": float(np.median(ages)) if ages.size else None,
            "p90": float(np.percentile(ages, 90)) if ages.size else None,
            "max": int(ages.max()) if ages.size else None,
        },
    }))


if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = eval(v)
    main(kw)
