"""Synthetic image renderer (JAX): textured ceiling plane + landmark blobs.

Gives the image front-end a ground-truthed optical scene without a dataset
mount: a fixed random texture lives on the landmark ceiling plane (so the
whole image moves consistently with camera motion), and each simulator
landmark adds a bright Gaussian blob (a strong, trackable corner). Runs under
jit on CPU or TPU, so image-level benchmarks generate frames on-device.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.core.camera import project, undistort_normalize

_TEX_N = 512
_BLOB_W = 9  # blob window size (odd)


def _make_texture(seed: int = 7) -> np.ndarray:
    """Smooth random texture with multi-scale detail (good corners for LK)."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((_TEX_N, _TEX_N), np.float32)
    for scale, amp in ((8, 30.0), (16, 25.0), (32, 20.0), (64, 15.0)):
        small = rng.normal(0, 1, (scale, scale)).astype(np.float32)
        reps = _TEX_N // scale
        up = np.kron(small, np.ones((reps, reps), np.float32))
        tex += amp * up
    # cheap smoothing to avoid blocky gradients
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        tex = (
            0.5 * tex
            + 0.25 * np.roll(tex, 1, axis=ax)
            + 0.25 * np.roll(tex, -1, axis=ax)
        )
    tex -= tex.min()
    tex *= 100.0 / max(tex.max(), 1e-6)
    return tex + 40.0


class Renderer:
    def __init__(self, cfg: VioConfig, landmarks: np.ndarray, plane_z: float = 12.0,
                 tex_scale: float = 0.15, seed: int = 7):
        self.cfg = cfg
        self.landmarks = jnp.asarray(landmarks, jnp.float32)
        self.plane_z = plane_z
        self.tex_scale = tex_scale  # world meters per texture texel
        self.texture = jnp.asarray(_make_texture(seed))
        H, W = cfg.camera.height, cfg.camera.width
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        px = np.stack([xs.ravel(), ys.ravel()], axis=-1)
        uvn = np.asarray(undistort_normalize(jnp.asarray(px), cfg.camera))
        rays = np.concatenate([uvn, np.ones((uvn.shape[0], 1), np.float32)], axis=-1)
        self.rays_cam = jnp.asarray(rays)  # (H*W, 3)
        # blob window offsets
        r = _BLOB_W // 2
        oy, ox = np.mgrid[-r : r + 1, -r : r + 1]
        self._offs = jnp.asarray(np.stack([oy.ravel(), ox.ravel()], axis=-1), jnp.int32)
        rng = np.random.default_rng(seed + 1)
        self._amps = jnp.asarray(
            rng.uniform(80.0, 150.0, size=landmarks.shape[0]).astype(np.float32)
        )

    @partial(jax.jit, static_argnums=0)
    def render(self, R_wc_T: jnp.ndarray, p_cam_w: jnp.ndarray) -> jnp.ndarray:
        """Render one frame. R_wc_T: (3,3) = R_cw^T (cam->world), p_cam_w (3,)."""
        cfg = self.cfg
        H, W = cfg.camera.height, cfg.camera.width

        # --- background: ray/plane intersection onto the fixed texture ------
        rays_w = self.rays_cam @ R_wc_T.T  # (H*W, 3) cam->world rotation
        denom = jnp.where(jnp.abs(rays_w[:, 2]) < 1e-6, 1e-6, rays_w[:, 2])
        s = (self.plane_z - p_cam_w[2]) / denom
        hit = p_cam_w[None, :] + s[:, None] * rays_w
        ok = s > 0
        tx = (hit[:, 0] / self.tex_scale) % (_TEX_N - 1)
        ty = (hit[:, 1] / self.tex_scale) % (_TEX_N - 1)
        x0 = tx.astype(jnp.int32)
        y0 = ty.astype(jnp.int32)
        fx, fy = tx - x0, ty - y0
        t = self.texture
        bg = (
            t[y0, x0] * (1 - fx) * (1 - fy)
            + t[y0, x0 + 1] * fx * (1 - fy)
            + t[y0 + 1, x0] * (1 - fx) * fy
            + t[y0 + 1, x0 + 1] * fx * fy
        )
        img = jnp.where(ok, bg, 40.0).reshape(H, W)

        # --- landmark blobs ---------------------------------------------------
        # R_wc_T is cam->world, so x_w @ R_wc_T = R_cw @ x_w (world->cam)
        p_c = (self.landmarks - p_cam_w[None, :]) @ R_wc_T
        z = p_c[:, 2]
        uvn = p_c[:, :2] / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)[:, None]
        px = project(uvn, cfg.camera)  # (N, 2)
        vis = (z > 0.3) & (px[:, 0] > 2) & (px[:, 0] < W - 3) & (px[:, 1] > 2) & (px[:, 1] < H - 3)

        cx = px[:, 0]
        cy = px[:, 1]
        ix = jnp.round(cx).astype(jnp.int32)
        iy = jnp.round(cy).astype(jnp.int32)
        # per-landmark 9x9 stamp at subpixel-accurate Gaussian
        yy = iy[:, None] + self._offs[None, :, 0]  # (N, 81)
        xx = ix[:, None] + self._offs[None, :, 1]
        d2 = (yy.astype(jnp.float32) - cy[:, None]) ** 2 + (
            xx.astype(jnp.float32) - cx[:, None]
        ) ** 2
        vals = self._amps[:, None] * jnp.exp(-d2 / (2.0 * 1.6**2))
        vals = jnp.where(vis[:, None], vals, 0.0)
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        img = img.at[yy.reshape(-1), xx.reshape(-1)].add(vals.reshape(-1))
        return jnp.clip(img, 0.0, 255.0)


def render_sequence(cfg: VioConfig, sim, t_img: np.ndarray) -> np.ndarray:
    """Render all frames of a simulator run (host loop over jitted render)."""
    rend = Renderer(cfg, np.asarray(sim.landmarks))
    out = np.zeros((len(t_img), cfg.camera.height, cfg.camera.width), np.float32)
    R_ci = np.asarray(sim.R_ci)
    t_ci = np.asarray(sim.t_ci)
    for k, t in enumerate(t_img):
        p_w, R_wi = sim.pose(np.asarray(t + sim.cfg.time_offset))
        R_cw = R_ci @ R_wi
        p_cam = p_w + R_wi.T @ (-R_ci.T @ t_ci)
        out[k] = np.asarray(
            rend.render(jnp.asarray(R_cw.T, jnp.float32), jnp.asarray(p_cam, jnp.float32))
        )
    return out
