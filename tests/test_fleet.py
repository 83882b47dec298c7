"""Fleet/vmap/shard_map tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from larvio_tpu.config import VioConfig, FilterConfig, FrontendConfig
from larvio_tpu.api import make_frame_inputs, run_feature_sequence
from larvio_tpu.data.sim import SimConfig, Simulator
from larvio_tpu.parallel.fleet import (
    fleet_step,
    init_fleet_state,
    make_sharded_fleet,
    run_fleet_sequence,
)

CFG = VioConfig(
    filter=FilterConfig(max_clones=8, max_update_features=12, imu_slots_per_frame=24),
    frontend=FrontendConfig(max_features=48),
)


@pytest.fixture(scope="module")
def seq():
    sim = Simulator(SimConfig(duration=6.0, pixel_noise=0.001, n_landmarks=400), CFG)
    data = sim.generate()
    feats, imu = make_frame_inputs(data)
    return data, feats, imu


class TestFleet:
    def test_vmap_matches_single(self, seq):
        data, feats, imu = seq
        # single run
        vs1, outs1 = run_feature_sequence(CFG, data)
        # fleet of 3 identical instances
        B = 3
        vsB = init_fleet_state(CFG, B)
        featsB = jax.tree.map(lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B, *a.shape[1:])), feats)
        imuB = jax.tree.map(lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B, *a.shape[1:])), imu)

        def body(carry, inp):
            f, i = inp
            return fleet_step(CFG, carry, f, i)

        vsB, outsB = jax.lax.scan(body, vsB, (featsB, imuB))
        pB = np.asarray(outsB.p)  # (T, B, 3)
        # instances are identical -> identical trajectories, matching single run
        np.testing.assert_allclose(pB[:, 0], pB[:, 1], atol=1e-6)
        # vmapped vs single execution reorders f32 reductions (QR panels,
        # scan fusion); trajectories agree to well under a millimeter
        np.testing.assert_allclose(pB[:, 0], np.asarray(outs1.p), atol=1e-3)

    def test_shard_map_mesh(self, seq):
        data, feats, imu = seq
        devs = np.array(jax.devices("cpu")[:8])
        assert len(devs) == 8, "conftest must provide 8 virtual CPU devices"
        mesh = Mesh(devs, ("fleet",))
        init_fn, step_fn = make_sharded_fleet(CFG, mesh)
        B = 16  # 2 instances per device
        vs = init_fn(B)
        k = 40
        featsK = jax.tree.map(lambda a: jnp.broadcast_to(a[k][None], (B, *a[k].shape)), feats)
        imuK = jax.tree.map(lambda a: jnp.broadcast_to(a[k][None], (B, *a[k].shape)), imu)
        vs, outs, metrics = step_fn(vs, featsK, imuK)
        assert outs.p.shape[0] == B
        assert int(metrics["n_resets"]) == 0
        # metrics are global (psum over the mesh): count covers all B instances
        assert int(metrics["mean_tracks"]) == int(jnp.sum(outs.n_tracks))

    def test_fleet_sequence_runs(self, seq):
        data, feats, imu = seq
        B = 4
        vs = init_fleet_state(CFG, B)
        featsB = jax.tree.map(lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B, *a.shape[1:])), feats)
        imuB = jax.tree.map(lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], B, *a.shape[1:])), imu)
        vs, outs = run_fleet_sequence(CFG, vs, featsB, imuB)
        assert np.all(np.isfinite(np.asarray(outs.p)))
