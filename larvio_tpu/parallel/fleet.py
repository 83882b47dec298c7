"""Fleet execution: many independent VIO instances per chip and across a mesh.

The reference is a single-robot single-process estimator (SURVEY.md §2
"Parallelism inventory": no DP/TP/PP anywhere). The TPU-native scaling story
(BASELINE.json:9,11 — "256 concurrent independent VIO instances sharded
across a v5e pod") is therefore pure data parallelism:

  * within a chip: ``jax.vmap`` over the instance axis of the state pytree;
  * across chips: ``shard_map`` over a 1-D device mesh, instances sharded on
    the batch axis, zero inter-instance communication in the algorithm;
  * the only collective is a ``psum`` aggregating fleet health metrics —
    it rides ICI and exists so operators get one scalar per step, not N.

Works identically on a real TPU mesh and on the 8-device virtual CPU mesh
used by the tests (tests/test_fleet.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from larvio_tpu.config import VioConfig
from larvio_tpu.models.msckf import FrameFeatures, VioState, filter_step, init_vio_state
from larvio_tpu.models.propagation import ImuBatch


def init_fleet_state(cfg: VioConfig, n_instances: int, dtype=jnp.float32) -> VioState:
    """Batched VioState: every leaf gains a leading instance axis."""
    one = init_vio_state(cfg, dtype)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_instances, *a.shape)), one
    )


def fleet_step(cfg: VioConfig, vs: VioState, feats: FrameFeatures, imu: ImuBatch):
    """vmapped per-frame step over the instance axis (single chip)."""
    with jax.default_matmul_precision("float32"):
        return jax.vmap(lambda s, f, i: filter_step(cfg, s, f, i))(vs, feats, imu)


@partial(jax.jit, static_argnums=0, donate_argnums=1)
def jit_fleet_step(cfg: VioConfig, vs, feats, imu):
    return fleet_step(cfg, vs, feats, imu)


def make_sharded_fleet(cfg: VioConfig, mesh: Mesh, axis: str = "fleet"):
    """Build (init_fn, step_fn) for a fleet sharded across ``mesh``.

    ``step_fn(vs, feats, imu) -> (vs, outs, fleet_metrics)`` where
    fleet_metrics is a globally psum-reduced health dict (same value on every
    shard). All pytrees are sharded on their leading instance axis.
    """
    spec = P(axis)
    n_dev = mesh.shape[axis]

    def local_step(vs, feats, imu):
        vs, outs = fleet_step(cfg, vs, feats, imu)
        # one ICI collective: fleet-wide health aggregation
        metrics = {
            "n_initialized": jax.lax.psum(
                jnp.sum(outs.initialized.astype(jnp.int32)), axis
            ),
            "n_resets": jax.lax.psum(jnp.sum(outs.did_reset.astype(jnp.int32)), axis),
            "mean_tracks": jax.lax.psum(jnp.sum(outs.n_tracks), axis),
        }
        return vs, outs, metrics

    # check_vma=False: scalar scan carries inside the step are initialized
    # from literals (unvarying), which the varying-manual-axes checker
    # rejects even though the program is replication-safe.
    try:
        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec, P()),
            check_vma=False,
        )
    except TypeError:  # older jax: check_rep instead of check_vma
        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec, P()),
            check_rep=False,
        )
    step_fn = jax.jit(sharded, donate_argnums=0)

    def init_fn(n_instances: int, dtype=jnp.float32) -> VioState:
        assert n_instances % n_dev == 0, "instances must divide the mesh"
        # create on the mesh's own platform: the default device can be a
        # remote TPU while the mesh is virtual-CPU (or vice versa), and
        # cross-platform device_put per leaf is a tunnel round-trip each
        with jax.default_device(mesh.devices.flat[0]):
            vs = init_fleet_state(cfg, n_instances, dtype)
        sharding = NamedSharding(mesh, spec)
        return jax.tree.map(
            lambda a: jax.device_put(
                a, sharding if a.ndim >= 1 else NamedSharding(mesh, P())
            ),
            vs,
        )

    return init_fn, step_fn


def run_fleet_sequence(cfg: VioConfig, vs: VioState, seq_feats, seq_imu):
    """Whole-sequence scan of a vmapped fleet (single chip, donated carry)."""

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _run(cfg, vs, seq_feats, seq_imu):
        def body(carry, inp):
            f, i = inp
            return fleet_step(cfg, carry, f, i)

        return jax.lax.scan(body, vs, (seq_feats, seq_imu))

    return _run(cfg, vs, seq_feats, seq_imu)


def make_sharded_fleet_run(cfg: VioConfig, mesh: Mesh, axis: str = "fleet"):
    """Whole-sequence scan of a fleet sharded across ``mesh``.

    ``run_fn(vs, seq_feats, seq_imu) -> (vs, outs)`` with the per-frame scan
    INSIDE shard_map: each device scans its own instance shard over all T
    frames with zero inter-device communication — the production multi-chip
    execution shape (one compiled program, T on-device steps, instances
    sharded on ICI-connected chips). Sequence pytrees carry (T, B, ...) axes;
    instances shard on axis 1.
    """
    spec_b = P(axis)
    spec_tb = P(None, axis)

    def local_run(vs, seq_feats, seq_imu):
        def body(carry, inp):
            f, i = inp
            return fleet_step(cfg, carry, f, i)

        return jax.lax.scan(body, vs, (seq_feats, seq_imu))

    try:
        sharded = shard_map(
            local_run,
            mesh=mesh,
            in_specs=(spec_b, spec_tb, spec_tb),
            out_specs=(spec_b, spec_tb),
            check_vma=False,
        )
    except TypeError:  # older jax: check_rep
        sharded = shard_map(
            local_run,
            mesh=mesh,
            in_specs=(spec_b, spec_tb, spec_tb),
            out_specs=(spec_b, spec_tb),
            check_rep=False,
        )
    return jax.jit(sharded, donate_argnums=0)
