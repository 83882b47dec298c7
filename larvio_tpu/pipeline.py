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
    # images may arrive as uint8 (host decode ships 1 byte/px over the
    # host->device link; the cast to f32 happens here, on device)
    image = frame.image.astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        tracker, feats = track_frame(
            cfg, ps.tracker, image, frame.imu, frame.t, ps.vio.filter.bg
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


def run_image_sequence_flexible(
    cfg: VioConfig,
    ps: PipelineState,
    frames: FrameInput,
    max_init_frames: int = 128,
    init_chunk: int = 32,
):
    """Two-phase scan driver with FLEXIBLE initialization (VERDICT r1 #6).

    The pure ``run_image_sequence`` scan only carries the on-device static
    initializer — in-motion starts (V2_03-style) never initialize there. This
    driver streams jitted per-frame steps while feeding the host
    FlexibleInitializer (VINS-style SfM + alignment, init/flexible.py); as
    soon as the filter is initialized (static on-device OR dynamic injected)
    it hands the carry to ONE ``lax.scan`` over the remaining frames. The
    handoff index is rounded down to a multiple of ``init_chunk`` frames
    already processed, bounding recompiles to len/init_chunk distinct tail
    lengths.

    Returns (final PipelineState, StepOutput arrays over ALL frames).
    """
    import numpy as np

    from larvio_tpu.init import FlexibleInitializer
    from larvio_tpu.init.flexible import inject_init_result

    T = int(frames.t.shape[0])
    # min_parallax: the 15-frame (0.75 s) window at ~1 m/s over a 5-10 m
    # scene accumulates ~0.08-0.13 median parallax (measured); 0.12 made the
    # gate flicker against exactly that range and starved the dynamic path.
    # 0.06 (~28 px at EuRoC focal) still conditions the 5-pt solve well.
    flex = FlexibleInitializer(cfg, window=15, min_parallax=0.06)
    outs_head = []
    k = 0
    while k < min(max_init_frames, T):
        frame = jax.tree.map(lambda a: a[k], frames)
        ps, out = jit_pipeline_step(cfg, ps, frame)
        outs_head.append(out)
        k += 1
        if bool(out.initialized):
            break
        tr = ps.tracker
        flex.push(
            float(frame.t), np.asarray(tr.ids), np.asarray(tr.uv_norm),
            np.asarray(tr.valid), np.asarray(frame.imu.t), np.asarray(frame.imu.w),
            np.asarray(frame.imu.a), np.asarray(frame.imu.valid),
        )
        res = flex.try_init()
        if res is not None and res.mode == "dynamic":
            ps = ps.replace(vio=inject_init_result(cfg, ps.vio, res))
            break
        # keep streaming until the handoff index is chunk-aligned
    # align the handoff so tail lengths come from a small set
    while k < T and (T - k) % init_chunk != 0:
        frame = jax.tree.map(lambda a: a[k], frames)
        ps, out = jit_pipeline_step(cfg, ps, frame)
        outs_head.append(out)
        k += 1

    if k >= T:
        outs = jax.tree.map(lambda *xs: jnp.stack(xs), *outs_head)
        return ps, outs
    tail = jax.tree.map(lambda a: a[k:], frames)
    ps, outs_tail = run_image_sequence(cfg, ps, tail)
    if outs_head:
        head = jax.tree.map(lambda *xs: jnp.stack(xs), *outs_head)
        outs = jax.tree.map(
            lambda h, tl: jnp.concatenate([h, tl], axis=0), head, outs_tail
        )
    else:
        outs = outs_tail
    return ps, outs
