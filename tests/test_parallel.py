"""Data-parallel tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8; SURVEY.md §4
"distributed-without-a-cluster")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from lvae_tpu.train import (
    Experiment,
    Trainer,
    make_eval_step,
    make_train_step,
)


def tiny_exp(bundle=None, **kw):
    cfg = dict(
        dataset="synthetic",
        zdims=(4, 4),
        downsample=(1, 1),
        blocks_per_layer=1,
        n_filters=8,
        batch_size=16,
        test_batch_size=32,
        dropout=0.0,
        max_steps=4,
        log_interval=100,
        test_interval=1000,
        seed=0,
        dry_run=True,
    )
    cfg.update(kw)
    return Experiment(ExperimentConfig(**cfg), bundle=bundle)


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8}

    def test_subset_mesh(self):
        assert make_mesh(2).shape == {"data": 2}

    def test_too_many_devices(self):
        with pytest.raises(ValueError, match="only 8 available"):
            make_mesh(16)


class TestDPTrainStep:
    pytestmark = pytest.mark.slow
    def test_sharded_step_runs_and_batch_is_sharded(self):
        exp = tiny_exp()
        mesh = make_mesh(8)
        step = make_dp_train_step(
            make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
        )
        state = exp.init_state()
        idx = jax.device_put(jnp.arange(16), shard_batch(mesh))
        state, metrics = step(state, exp.train_data.array, idx)
        assert int(state.step) == 1
        assert np.isfinite(float(metrics["elbo"]))
        # params stay replicated
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_matches_single_device(self):
        # threefry is position-consistent: the same key produces the same
        # global batch on 1 or 8 devices -> identical training trajectories
        # up to fp reassociation in the psum. (rbg, the perf default, does
        # NOT guarantee this — streams differ across shardings — hence the
        # explicit pin here.)
        res = {}
        for n in (1, 8):
            exp = tiny_exp(rng_impl="threefry")
            state = exp.init_state()
            mesh = make_mesh(n)
            step = make_dp_train_step(
                make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
            )
            for i in range(3):
                idx = jax.device_put(
                    jnp.arange(16) + i * 16, shard_batch(mesh)
                )
                state, metrics = step(state, exp.train_data.array, idx)
            res[n] = (
                float(metrics["elbo"]),
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
            )
        np.testing.assert_allclose(res[1][0], res[8][0], rtol=1e-4)
        np.testing.assert_allclose(res[1][1], res[8][1], rtol=1e-3, atol=1e-6)

    def test_subsampled_bn_matches_single_device(self):
        # --bn-stat-samples takes a strided slice of the GLOBAL batch
        # (x[::B//n]); under a batch-sharded mesh XLA resolves that with
        # collectives, so the trajectory must equal the 1-device run —
        # the subsample must not silently become per-shard.
        res = {}
        for n in (1, 8):
            exp = tiny_exp(rng_impl="threefry", bn_stat_samples=4)
            state = exp.init_state()
            mesh = make_mesh(n)
            step = make_dp_train_step(
                make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
            )
            for i in range(3):
                idx = jax.device_put(
                    jnp.arange(16) + i * 16, shard_batch(mesh)
                )
                state, metrics = step(state, exp.train_data.array, idx)
            res[n] = (
                float(metrics["elbo"]),
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
            )
        assert np.isfinite(res[1][0]) and np.isfinite(res[8][0])
        np.testing.assert_allclose(res[1][0], res[8][0], rtol=1e-4)
        np.testing.assert_allclose(res[1][1], res[8][1], rtol=1e-3, atol=1e-6)

    def test_trainer_with_num_data_shards(self):
        exp = tiny_exp(num_data_shards=8, max_steps=4)
        state = Trainer(exp).run()
        assert int(state.step) == 4

    def test_batch_not_divisible_raises(self):
        # the config-validation audit (round 5) moved this check to
        # ExperimentConfig construction — before any trace, not at run()
        with pytest.raises(ValueError, match="not divisible"):
            tiny_exp(num_data_shards=8, batch_size=12)


class TestSpatialSharding:
    """2-D (data, space) mesh: activations shard over image HEIGHT via one
    GSPMD constraint on the preprocessed batch (parallel.mesh
    activation_constraint); XLA inserts the conv halo exchanges and the
    cross-shard BN/loss reductions. Exact semantics — the trajectory must
    match the single-device run. This is the SURVEY.md §5 'images outgrow
    one chip's HBM' path; the reference has no counterpart."""

    def test_spatial_mesh_shape(self):
        mesh = make_mesh(2, spatial=4)
        assert mesh.shape == {"data": 2, "space": 4}
        with pytest.raises(ValueError, match="only 8 available"):
            make_mesh(4, spatial=4)

    def test_activation_constraint_none_without_spatial_axis(self):
        from lvae_tpu.parallel import activation_constraint

        assert activation_constraint(make_mesh(4)) is None
        assert activation_constraint(make_mesh(2, spatial=2)) is not None

    @pytest.mark.slow
    def test_trajectory_matches_single_device(self):
        # threefry pins the RNG streams (see TestDPTrainStep); any drift
        # beyond fp reassociation in the mesh reductions is a bug in the
        # spatial partitioning (halo exchange / BN stat reduction).
        from lvae_tpu.parallel import activation_constraint

        res = {}
        for n_data, spatial in ((1, 1), (2, 2), (1, 4)):
            exp = tiny_exp(rng_impl="threefry", dropout=0.1)
            state = exp.init_state()
            mesh = make_mesh(n_data, spatial=spatial)
            step = make_dp_train_step(
                make_train_step(
                    exp.model, exp.tx, exp.loss_cfg,
                    activation_constraint(mesh),
                ),
                mesh,
            )
            for i in range(3):
                idx = jax.device_put(jnp.arange(16) + i * 16, shard_batch(mesh))
                state, metrics = step(state, exp.train_data.array, idx)
            res[(n_data, spatial)] = (
                float(metrics["elbo"]),
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
            )
        ref = res[(1, 1)]
        for key in ((2, 2), (1, 4)):
            np.testing.assert_allclose(ref[0], res[key][0], rtol=1e-4)
            np.testing.assert_allclose(ref[1], res[key][1], rtol=1e-3, atol=1e-6)

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "variant",
        [
            # torch-convention switches: explicit per-dim padding lists and
            # the post-upsample skip merge must survive GSPMD spatial
            # partitioning (halo exchange sizes differ under symmetric
            # padding at stride 2)
            pytest.param(
                dict(conv_pad="torch", skip_merge="post", skip=True),
                id="torch-post",
            ),
            # nearest/bilinear resize instead of strided/transposed convs
            pytest.param(dict(resample_mode="interpolate"), id="interpolate"),
            # leading-rows BN stats: a batch-dim slice whose stat reduction
            # still spans the height-sharded axis
            pytest.param(dict(bn_stat_samples=8), id="bn-subsample"),
        ],
    )
    def test_spatial_trajectory_config_interactions(self, variant):
        # same contract as test_trajectory_matches_single_device, for the
        # config axes that change conv padding / resampling / BN reductions
        # and were otherwise never combined with the (data, space) mesh.
        from lvae_tpu.parallel import activation_constraint

        res = {}
        for n_data, spatial in ((1, 1), (2, 2)):
            exp = tiny_exp(rng_impl="threefry", dropout=0.1, **variant)
            state = exp.init_state()
            mesh = make_mesh(n_data, spatial=spatial)
            step = make_dp_train_step(
                make_train_step(
                    exp.model, exp.tx, exp.loss_cfg,
                    activation_constraint(mesh),
                ),
                mesh,
            )
            for i in range(3):
                idx = jax.device_put(jnp.arange(16) + i * 16, shard_batch(mesh))
                state, metrics = step(state, exp.train_data.array, idx)
            res[(n_data, spatial)] = (
                float(metrics["elbo"]),
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
            )
        ref, sharded = res[(1, 1)], res[(2, 2)]
        np.testing.assert_allclose(ref[0], sharded[0], rtol=1e-4)
        np.testing.assert_allclose(ref[1], sharded[1], rtol=1e-3, atol=1e-6)

    @pytest.mark.slow
    def test_trainer_with_spatial_shards(self):
        # end-to-end CLI-config path: 2 data x 2 space mesh, full Trainer.run
        exp = tiny_exp(num_data_shards=2, spatial_shards=2, max_steps=4)
        state = Trainer(exp).run()
        assert int(state.step) == 4

    def test_height_not_divisible_raises(self):
        # the constrained (pre-pad) height is 28; 5 shards cannot tile it
        exp = tiny_exp(spatial_shards=5)
        with pytest.raises(ValueError, match="height"):
            Trainer(exp).run()


class TestDPEvalStep:
    def test_sharded_eval(self):
        exp = tiny_exp()
        mesh = make_mesh(8)
        estep = make_dp_eval_step(make_eval_step(exp.model, exp.loss_cfg), mesh)
        state = exp.init_state()
        idx = jax.device_put(jnp.arange(32), shard_batch(mesh))
        batch = jax.device_put(
            exp.test_data.gather(jnp.arange(32)), shard_batch(mesh)
        )
        out = estep(state, batch, jax.random.key(0), idx)
        assert out["elbo"].shape == (32,)
        assert np.all(np.isfinite(np.asarray(out["elbo"])))

    def test_sharded_experiment_evaluate_matches_single_device(self):
        """VERDICT round 2 next-round #5: Experiment.evaluate and
        evaluate_iwll run sharded when num_data_shards > 1, and the result
        equals the single-device sweep (masked padding included) because
        all eval randomness is keyed per-image."""
        from lvae_tpu.data.registry import DatasetBundle
        from lvae_tpu.eval.iwll import evaluate_iwll

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(40, 28, 28, 1), dtype=np.uint8)
        bundle = DatasetBundle(
            "binmnist_fixture", arr, arr[:37], (28, 28), (32, 32), 1,
            "binarize", "bernoulli",
        )
        e1 = tiny_exp(bundle=bundle, test_batch_size=16)
        e8 = tiny_exp(bundle=bundle, test_batch_size=16, num_data_shards=8)
        assert e8.mesh is not None
        state = e1.init_state()
        m1, m8 = e1.evaluate(state), e8.evaluate(state)
        for k in ("ll", "kl", "elbo"):
            np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, atol=1e-4)
        a = evaluate_iwll(e1, state, n_samples=2)
        b = evaluate_iwll(e8, state, n_samples=2)
        np.testing.assert_allclose(a["iw_ll"], b["iw_ll"], rtol=1e-5, atol=1e-4)


class TestShardedCheckpoint:
    pytestmark = pytest.mark.slow
    def test_checkpoint_roundtrip_under_sharding(self, tmp_path):
        """Save a state trained on the 8-device mesh, restore it, continue
        (SURVEY.md §4: checkpoint save/restore under sharding)."""
        from lvae_tpu.train import CheckpointManager

        exp = tiny_exp()
        mesh = make_mesh(8)
        step = make_dp_train_step(
            make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
        )
        state = exp.init_state()
        for i in range(3):
            idx = jax.device_put(jnp.arange(16) + 16 * i, shard_batch(mesh))
            state, _ = step(state, exp.train_data.array, idx)

        mngr = CheckpointManager(str(tmp_path / "run"), keep=1)
        mngr.save(state, wait=True)

        restored = mngr.restore(tiny_exp().init_state())
        assert int(restored.step) == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        # restored state trains on under the mesh
        idx = jax.device_put(jnp.arange(16), shard_batch(mesh))
        restored, metrics = step(restored, exp.train_data.array, idx)
        assert int(restored.step) == 4
        assert np.isfinite(float(metrics["elbo"]))


class TestMultihost:
    """Single-process semantics of the multi-host helpers (a real pod just
    changes process_count; the code path is identical)."""

    def test_global_mesh_and_indices(self):
        from lvae_tpu.parallel import global_mesh, make_global_batch_indices

        mesh = global_mesh()
        assert mesh.shape == {"data": 8}
        idx = make_global_batch_indices(mesh, np.arange(16))
        assert idx.shape == (16,)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(16))
        assert not idx.sharding.is_fully_replicated  # sharded on data

    def test_assert_process_contiguous(self, monkeypatch):
        """make_mesh layouts pass; a transposed (data, space) grid whose
        data rows span 'processes' is rejected (it would corrupt per-host
        batch feeding silently)."""
        from jax.sharding import Mesh

        from lvae_tpu.parallel import multihost
        from lvae_tpu.parallel.mesh import (
            SPATIAL_AXIS,
            assert_process_contiguous,
            make_mesh,
        )

        assert_process_contiguous(make_mesh(8))
        assert_process_contiguous(make_mesh(spatial=2))

        # simulate two hosts by patching process_index on the device grid:
        # single-process CPU devices all report process 0, so fabricate
        # ownership via a stand-in attribute reader
        devs = jax.devices()

        class FakeDev:
            def __init__(self, d, p):
                self._d, self.process_index = d, p

        grid = np.array(
            [[FakeDev(devs[i], i // 4), FakeDev(devs[i + 4], (i + 4) // 4)]
             for i in range(4)],
            dtype=object,
        )

        class FakeMesh:
            axis_names = ("data", SPATIAL_AXIS)
            devices = grid

        with pytest.raises(ValueError, match="spans processes"):
            assert_process_contiguous(FakeMesh())

        interleaved = np.array(
            [FakeDev(devs[i], i % 2) for i in range(8)], dtype=object
        ).reshape(8, 1)

        class FakeMesh1D:
            axis_names = ("data",)
            devices = interleaved.reshape(8)

        with pytest.raises(ValueError, match="not.*contiguous"):
            assert_process_contiguous(FakeMesh1D())

    def test_host_local_indices_single_process(self):
        from lvae_tpu.parallel import host_local_indices

        idx = np.arange(32)
        np.testing.assert_array_equal(host_local_indices(idx), idx)

    def test_host_local_indices_multi_process(self, monkeypatch):
        """Simulated process_count>1: each host gets its contiguous slice;
        non-divisible batches raise (VERDICT r1 item 6)."""
        from lvae_tpu.parallel import multihost

        monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
        idx = np.arange(32)
        for pid, lo in [(0, 0), (1, 8), (3, 24)]:
            monkeypatch.setattr(multihost.jax, "process_index", lambda p=pid: p)
            np.testing.assert_array_equal(
                multihost.host_local_indices(idx), np.arange(lo, lo + 8)
            )
        monkeypatch.setattr(multihost.jax, "process_index", lambda: 0)
        with pytest.raises(ValueError, match="not divisible"):
            multihost.host_local_indices(np.arange(30))

    def test_initialize_single_process_noop(self, monkeypatch):
        """No cluster env: jax raises 'coordinator_address should be
        defined' and initialize() treats that as single-process. (The real
        call can't run here — the test process already initialized the XLA
        backend — so the probe is simulated.)"""
        from lvae_tpu.parallel import multihost

        def no_cluster():
            raise ValueError("coordinator_address should be defined.")

        monkeypatch.setattr(multihost.jax.distributed, "initialize", no_cluster)
        multihost.initialize()  # must not raise
        assert jax.process_count() == 1

    def test_initialize_reraises_real_failures(self, monkeypatch):
        """A genuine pod-init failure must propagate, not silently degrade
        to single-process (VERDICT r1 'What's weak' #6)."""
        from lvae_tpu.parallel import multihost

        def boom():
            raise RuntimeError("coordinator unreachable")

        monkeypatch.setattr(multihost.jax.distributed, "initialize", boom)
        with pytest.raises(RuntimeError, match="coordinator unreachable"):
            multihost.initialize()

    @pytest.mark.slow
    def test_global_batch_feeds_train_step(self):
        from lvae_tpu.parallel import global_mesh, make_global_batch_indices

        exp = tiny_exp()
        mesh = global_mesh()
        step = make_dp_train_step(
            make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
        )
        state = exp.init_state()
        idx = make_global_batch_indices(mesh, np.arange(16))
        state, metrics = step(state, exp.train_data.array, idx)
        assert np.isfinite(float(metrics["elbo"]))
