"""20-seed exact-noise NEES harness (mirrors TestSqrtExactNoiseNees) with knobs.

Usage (from the repo root): python tools/diag_nees.py [knob=value ...]
Chain configs for a sweep:   for k in 12 16 20; do python tools/diag_nees.py \
                             slam_promote_obs=$k; done
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
from larvio_tpu.config import VioConfig, FilterConfig, NoiseConfig
from larvio_tpu.api import make_frame_inputs
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.parallel.fleet import init_fleet_state, run_fleet_sequence

kw = {}
for a in sys.argv[1:]:
    k, v = a.split("=")
    kw[k] = eval(v)

cfg = VioConfig(
    filter=FilterConfig(sqrt_form=True, **kw),
    noise=NoiseConfig(observation_noise=0.002),
)
N = 20
datas = [
    Simulator(SimConfig(duration=10.0, pixel_noise=0.002, gyro_noise=0.005,
                        acc_noise=0.05, seed=s), cfg).generate()
    for s in range(N)
]
stacked = {k: np.stack([d[k] for d in datas], axis=1) for k in datas[0]}
feats, imu = make_frame_inputs(stacked)
vs = init_fleet_state(cfg, N)
vs, outs = run_fleet_sequence(cfg, vs, feats, imu)
outs = jax.tree.map(np.asarray, outs)

m = outs.initialized.astype(bool)
sel = m.copy(); sel[:100] = False
gt = stacked["gt_p"]; t = stacked["t_img"]
gt_v = np.gradient(gt, axis=0) / np.gradient(t, axis=0)[..., None]
nees_v = ((outs.v - gt_v)**2 / np.maximum(outs.v_std, 1e-6)**2)[sel].mean(axis=0)
nees_p = ((outs.p - gt)**2 / np.maximum(outs.p_std, 1e-6)**2)[sel].mean(axis=0)
errs = np.linalg.norm(outs.p - gt, axis=-1)
# time decomposition: horizontal position NEES per time-quarter (frames
# 100..T in 4 bins) — flat = static bias, growing = drift-rate underestimate
T = len(gt)
qn = []
npp = (outs.p - gt) ** 2 / np.maximum(outs.p_std, 1e-6) ** 2
for q0, q1 in [(100 + i * (T - 100) // 4, 100 + (i + 1) * (T - 100) // 4)
               for i in range(4)]:
    sq = m.copy(); sq[:q0] = False; sq[q1:] = False
    qn.append(round(float(npp[sq][:, :2].mean()), 2))
# yaw decomposition: is the horizontal-position overconfidence really a yaw
# (global-rotation) overconfidence? error angle about world z between
# estimated R_wi and gt R_wi, vs the filter's reported theta std [2].
from larvio_tpu.core.quaternion import quat_to_rotation
import jax.numpy as jnp
R_est = np.asarray(jax.vmap(jax.vmap(quat_to_rotation))(jnp.asarray(outs.q)))
# gt_R is world->imu (R_wi); error rotation in WORLD frame: R_err = R_est^T @ R_gt
gt_R = stacked["gt_R"]
R_err = np.einsum("tbij,tbik->tbjk", R_est, gt_R)  # est^T gt, world-frame
yaw_err = np.arctan2(R_err[..., 1, 0] - R_err[..., 0, 1],
                     R_err[..., 0, 0] + R_err[..., 1, 1])
nees_yaw = (yaw_err**2 / np.maximum(outs.q_std[..., 2], 1e-6)**2)[sel].mean()
# yaw-explained horizontal error: |yaw_err| * horizontal distance from origin
r_h = np.linalg.norm(gt[..., :2], axis=-1)
yaw_pos = np.abs(yaw_err) * r_h
h_err = np.linalg.norm((outs.p - gt)[..., :2], axis=-1)
print(json.dumps({
    "knobs": {k: str(v) for k, v in kw.items()},
    "nees_yaw": round(float(nees_yaw), 2),
    "yaw_rms_deg": round(float(np.rad2deg(np.sqrt((yaw_err[sel]**2).mean()))), 3),
    "yawpos_frac": round(float((yaw_pos[sel] / np.maximum(h_err[sel], 1e-9)).mean()), 2),
    "resets": int(outs.did_reset.sum()),
    "nees_v": [round(float(x), 2) for x in nees_v],
    "nees_p": [round(float(x), 2) for x in nees_p],
    "nees_ph_quarters": qn,
    "worst_err": round(float(errs.max()), 3),
    "mean_final_err": round(float(errs[-1].mean()), 3),
    "ate_like": round(float(np.sqrt((errs[sel]**2).mean())), 4),
    "n_slam": round(float(np.asarray(outs.n_slam)[sel].mean()), 2)
    if hasattr(outs, "n_slam") else None,
}))
