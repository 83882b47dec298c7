"""Fused image-level pipeline: front-end + filter in one jitted step.

This is the full TPU-native equivalent of the reference's per-frame hot loop
(SURVEY.md §3.1): image + IMU batch in, pose out, zero host round-trips
inside the step. The whole sequence can run under ``lax.scan`` (images
pre-staged in HBM) and the per-instance step vmaps for fleet workloads
(parallel/fleet.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from larvio_tpu.config import VioConfig
from larvio_tpu.models.frontend import TrackerState, init_tracker_state, track_frame
from larvio_tpu.models.msckf import StepOutput, VioState, filter_step, init_vio_state
from larvio_tpu.models.propagation import ImuBatch


@struct.dataclass
class PipelineState:
    tracker: TrackerState
    vio: VioState


class FrameInput(NamedTuple):
    image: jnp.ndarray  # (H, W) float32 grayscale [0, 255]
    imu: ImuBatch
    t: jnp.ndarray  # () image timestamp


def init_pipeline_state(cfg: VioConfig, dtype=jnp.float32) -> PipelineState:
    return PipelineState(
        tracker=init_tracker_state(cfg, dtype), vio=init_vio_state(cfg, dtype)
    )


def pipeline_step(cfg: VioConfig, ps: PipelineState, frame: FrameInput) -> Tuple[PipelineState, StepOutput]:
    with jax.default_matmul_precision("float32"):
        tracker, feats = track_frame(
            cfg, ps.tracker, frame.image, frame.imu, frame.t, ps.vio.filter.bg
        )
        vio, out = filter_step(cfg, ps.vio, feats, frame.imu)
    return PipelineState(tracker=tracker, vio=vio), out


@partial(jax.jit, static_argnums=0)
def jit_pipeline_step(cfg: VioConfig, ps: PipelineState, frame: FrameInput):
    return pipeline_step(cfg, ps, frame)


@partial(jax.jit, static_argnums=0, donate_argnums=1)
def run_image_sequence(cfg: VioConfig, ps: PipelineState, frames: FrameInput):
    """Whole-sequence scan over stacked FrameInput arrays (leading time axis)."""

    def body(carry, frame):
        return pipeline_step(cfg, carry, frame)

    return jax.lax.scan(body, ps, frames)
