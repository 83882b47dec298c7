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


@pytest.mark.slow
class TestShardedProductionShape:
    def test_sharded_scan_heterogeneous_default_config(self):
        """Multi-chip at production shape (VERDICT r2 #4): a ≥100-step
        shard_map SCAN over heterogeneous per-instance sequences at the
        DEFAULT config must reproduce the unsharded vmap fleet run
        per-instance. This is the real multi-chip execution shape — one
        compiled program, all frames on-device, instances sharded across the
        mesh."""
        import jax.numpy as jnp
        from larvio_tpu.api import make_frame_inputs
        from larvio_tpu.parallel.fleet import (
            init_fleet_state,
            make_sharded_fleet_run,
            run_fleet_sequence,
        )

        cfg = VioConfig()  # DEFAULT config: D = 160, 20 clones, 6 slam
        B = 8
        datas = [
            Simulator(
                SimConfig(duration=6.0, pixel_noise=0.002, seed=100 + s), cfg
            ).generate()
            for s in range(B)
        ]
        stacked = {k: np.stack([d[k] for d in datas], axis=1) for k in datas[0]}
        feats, imu = make_frame_inputs(stacked)  # (T, B, ...)
        T = stacked["t_img"].shape[0]
        assert T >= 100

        devs = np.array(jax.devices("cpu")[:8])
        mesh = Mesh(devs, ("fleet",))
        run_fn = make_sharded_fleet_run(cfg, mesh)
        vs0 = init_fleet_state(cfg, B)
        vs0 = jax.device_put(vs0)  # plain replicated; run_fn shards via specs
        vs_s, outs_s = run_fn(vs0, feats, imu)

        vs_v, outs_v = run_fleet_sequence(cfg, init_fleet_state(cfg, B), feats, imu)

        p_s, p_v = np.asarray(outs_s.p), np.asarray(outs_v.p)
        assert np.all(np.isfinite(p_s))
        # Per-instance trajectories: identical math, different vectorization
        # widths (B/8-per-device vs B-wide vmap), so f32 reduction order
        # differs and the filter's nonlinear feedback AMPLIFIES the rounding
        # gap over time (measured, deterministic: up to 6.5e-3 by frame 60,
        # ~7e-3 by frame 120 on a ~4 m trajectory — 0.2%). Gate with margin
        # on that band; a real sharding bug (wrong instance routing, bad
        # psum) is trajectory-scale (>>10 cm), far above both bounds, and is
        # independently caught by the per-instance ground-truth gate below
        # (a swapped instance cannot track its OWN ground truth).
        np.testing.assert_allclose(p_s[:60], p_v[:60], atol=1.5e-2)
        np.testing.assert_allclose(p_s, p_v, atol=3e-2)
        # and BOTH paths must be accurate against ground truth per instance
        gt = stacked["gt_p"]
        m = np.asarray(outs_s.initialized).astype(bool) & np.asarray(
            outs_v.initialized
        ).astype(bool)
        for b in range(B):
            err_s = np.linalg.norm((p_s - gt)[m[:, b], b], axis=-1).max()
            err_v = np.linalg.norm((p_v - gt)[m[:, b], b], axis=-1).max()
            assert err_s < 0.25 and err_v < 0.25, (b, err_s, err_v)
        # every instance initialized and ran healthily in BOTH paths
        m = np.asarray(outs_s.initialized).astype(bool)
        assert m[-1].all()
        assert int(np.asarray(outs_s.did_reset).sum()) == 0
