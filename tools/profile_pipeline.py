import numpy as np, jax, jax.numpy as jnp
from larvio_tpu.config import VioConfig
from larvio_tpu.data.render import Renderer
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.models.propagation import ImuBatch
from larvio_tpu.pipeline import FrameInput, init_pipeline_state, run_image_sequence

cfg = VioConfig()
sim = Simulator(SimConfig(duration=10.0, pixel_noise=0.0), cfg)
data = sim.generate()
rend = Renderer(cfg, np.asarray(sim.landmarks))
R_ci, t_ci = np.asarray(sim.R_ci), np.asarray(sim.t_ci)
imgs = []
for t in data["t_img"]:
    p_w, R_wi = sim.pose(np.asarray(t))
    imgs.append(rend.render(jnp.asarray((R_ci @ R_wi).T, jnp.float32),
                            jnp.asarray(p_w + R_wi.T @ (-R_ci.T @ t_ci), jnp.float32)))
images = jnp.stack(imgs); jax.block_until_ready(images)
frames = FrameInput(image=images,
    imu=ImuBatch(t=jnp.asarray(data["imu_t"]), w=jnp.asarray(data["imu_w"]),
                 a=jnp.asarray(data["imu_a"]), valid=jnp.asarray(data["imu_valid"])),
    t=jnp.asarray(data["t_img"]))
ps, outs = run_image_sequence(cfg, init_pipeline_state(cfg), frames)
jax.block_until_ready(outs.p)
with jax.profiler.trace("/tmp/jaxtrace"):
    ps, outs = run_image_sequence(cfg, init_pipeline_state(cfg), frames)
    jax.block_until_ready(outs.p)
print("trace written")
