"""Top-level pipeline API (counterpart of ref:larvio.h LarVio + app loop).

Two execution modes (SURVEY.md §7 layer 7):

  * ``step``: one jitted per-frame call (streaming / online use).
  * ``run_sequence``: the whole sequence under one ``lax.scan`` with donated
    carry — zero host round-trips inside (BASELINE.json:5).

Feature-level entry points take pre-extracted feature tracks (from the image
front-end or the simulator); image-level entry points (frontend + filter
fused) live in pipeline.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from larvio_tpu.config import VioConfig
from larvio_tpu.models.msckf import FrameFeatures, StepOutput, VioState, filter_step, init_vio_state
from larvio_tpu.models.propagation import ImuBatch


def make_frame_inputs(batch: dict, k=None):
    """Build (FrameFeatures, ImuBatch) pytrees from stacked sequence arrays."""
    sel = (lambda a: a[k]) if k is not None else (lambda a: a)
    feats = FrameFeatures(
        ids=jnp.asarray(sel(batch["ids"])),
        uv=jnp.asarray(sel(batch["uv"])),
        vel=jnp.asarray(sel(batch["vel"])),
        valid=jnp.asarray(sel(batch["fvalid"])),
        mean_motion=jnp.asarray(sel(batch["mean_motion"])),
        t=jnp.asarray(sel(batch["t_img"])),
    )
    imu = ImuBatch(
        t=jnp.asarray(sel(batch["imu_t"])),
        w=jnp.asarray(sel(batch["imu_w"])),
        a=jnp.asarray(sel(batch["imu_a"])),
        valid=jnp.asarray(sel(batch["imu_valid"])),
    )
    return feats, imu


@partial(jax.jit, static_argnums=0)
def step(cfg: VioConfig, vs: VioState, feats: FrameFeatures, imu: ImuBatch):
    """Single-frame jitted step (streaming mode)."""
    with jax.default_matmul_precision("float32"):
        return filter_step(cfg, vs, feats, imu)


@partial(jax.jit, static_argnums=0, donate_argnums=1)
def run_sequence(cfg: VioConfig, vs: VioState, seq_feats: FrameFeatures, seq_imu: ImuBatch) -> Tuple[VioState, StepOutput]:
    """Whole-sequence scan: seq_* pytrees have a leading time axis."""

    def body(carry, inp):
        feats, imu = inp
        with jax.default_matmul_precision("float32"):
            return filter_step(cfg, carry, feats, imu)

    return jax.lax.scan(body, vs, (seq_feats, seq_imu))


def run_feature_sequence(cfg: VioConfig, batch: dict, dtype=jnp.float32):
    """Host convenience: numpy sequence dict -> (final VioState, StepOutput arrays)."""
    feats, imu = make_frame_inputs(batch)
    vs = init_vio_state(cfg, dtype)
    vs, outs = run_sequence(cfg, vs, feats, imu)
    return vs, jax.tree.map(lambda a: jax.device_get(a), outs)
