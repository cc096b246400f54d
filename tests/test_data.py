"""Data layer tests: parsers on synthetic fixtures, device pipeline."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.data import (
    DeviceDataset,
    eval_preprocess_batch,
    fold_in_indices,
    load_dataset,
    preprocess_batch,
)
from lvae_tpu.data import sources


class TestParsers:
    def test_amat_roundtrip(self, tmp_path, rng):
        imgs = (rng.uniform(size=(5, 784)) < 0.5).astype(np.uint8)
        p = tmp_path / "binarized_mnist_train.amat"
        np.savetxt(p, imgs, fmt="%d")
        out = sources.load_amat(str(p))
        np.testing.assert_array_equal(out, imgs.reshape(5, 28, 28, 1))

    def test_idx_roundtrip(self, tmp_path, rng):
        imgs = rng.integers(0, 256, size=(4, 28, 28), dtype=np.uint8)
        p = tmp_path / "train-images-idx3-ubyte.gz"
        with gzip.open(p, "wb") as f:
            f.write(struct.pack(">IIII", 2051, 4, 28, 28))
            f.write(imgs.tobytes())
        out = sources.load_idx_images(str(p))
        np.testing.assert_array_equal(out, imgs[..., None])

    def test_cifar_pickles(self, tmp_path, rng):
        d = tmp_path / "cifar10" / "cifar-10-batches-py"
        d.mkdir(parents=True)
        n = 6
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            data = rng.integers(0, 256, size=(n, 3072), dtype=np.uint8)
            with open(d / name, "wb") as f:
                pickle.dump({"data": data, "labels": [0] * n}, f)
        train, test = sources.load_cifar10(str(tmp_path))
        assert train.shape == (30, 32, 32, 3)
        assert test.shape == (6, 32, 32, 3)

    def test_multiobject_npz(self, tmp_path, rng):
        imgs = (rng.uniform(size=(20, 64, 64, 3)) < 0.5).astype(np.uint8) * 255
        p = tmp_path / "multi.npz"
        np.savez(p, x=imgs, labels=np.zeros(20))
        train, test = sources.load_multiobject_npz(str(p))
        assert train.shape == (18, 64, 64, 3)
        assert test.shape == (2, 64, 64, 3)
        assert set(np.unique(train)) <= {0, 1}

    def test_missing_file_message(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="no network"):
            sources.load_static_mnist(str(tmp_path))

    def test_synthetic_deterministic(self):
        a, _ = sources.make_synthetic(n_train=16, n_test=4, seed=3)
        b, _ = sources.make_synthetic(n_train=16, n_test=4, seed=3)
        np.testing.assert_array_equal(a, b)
        assert set(np.unique(a)) <= {0, 1}


class TestRegistry:
    def test_synthetic_bundle(self):
        b = load_dataset("synthetic")
        assert b.img_size == (28, 28)
        assert b.padded_size == (32, 32)
        assert b.color_ch == 1
        assert b.default_likelihood == "bernoulli"
        assert b.train.dtype == np.uint8

    def test_synthetic_rgb_bundle(self):
        b = load_dataset("synthetic_rgb")
        assert b.color_ch == 3
        assert b.preprocess == "dequantize"

    def test_synthetic_size_suffix(self):
        """'name:N' sets the train-split size for the offline fixtures
        (used by the multi-thousand-step scale runs in RESULTS.md)."""
        b = load_dataset("synthetic_rgb:2048")
        assert b.train.shape == (2048, 32, 32, 3)
        assert 128 <= len(b.test) <= 1024
        assert b.default_likelihood == "discretized_logistic"
        again = load_dataset("synthetic_rgb:2048")
        assert np.array_equal(b.train, again.train)

    def test_synthetic_celeba_bundle(self):
        """64x64 RGB fixture with the exact celeba metadata triple, so the
        BASELINE config-5 model/preprocess/likelihood runs offline."""
        b = load_dataset("synthetic_celeba:1024")
        assert b.train.shape == (1024, 64, 64, 3)
        assert b.img_size == b.padded_size == (64, 64)
        assert b.preprocess == "dequantize"
        assert b.default_likelihood == "discretized_logistic_mix"

    def test_unknown_dataset(self):
        with pytest.raises(ValueError, match="unknown dataset"):
            load_dataset("nope")

    def test_baseline_config_triples(self, monkeypatch, rng):
        """Each BASELINE.json config maps to the intended (dataset,
        preprocess, likelihood) triple — notably SVHN uses the plain
        discretized logistic (config 3), NOT the PixelCNN++ mixture
        (VERDICT r1 missing item 3). Loaders are stubbed so the spec is
        testable without the real files on disk."""
        from lvae_tpu.data import registry, sources

        def fake(h, w, c):
            x = (rng.uniform(size=(8, h, w, c)) * 255).astype(np.uint8)
            return lambda *a, **k: (x, x[:4])

        monkeypatch.setattr(sources, "load_static_mnist", fake(28, 28, 1))
        monkeypatch.setattr(sources, "load_mnist", fake(28, 28, 1))
        monkeypatch.setattr(sources, "load_svhn", fake(32, 32, 3))
        monkeypatch.setattr(sources, "load_cifar10", fake(32, 32, 3))
        monkeypatch.setattr(sources, "load_celeba", fake(64, 64, 3))

        expected = {
            # BASELINE.json config 1: static binarized MNIST, Bernoulli
            "static_mnist": ("none", "bernoulli", (32, 32), 1),
            # config 2: dynamically binarized MNIST
            "mnist": ("binarize", "bernoulli", (32, 32), 1),
            # config 3: SVHN, *plain* discretized logistic, dequantized
            "svhn": ("dequantize", "discretized_logistic", (32, 32), 3),
            # config 4: deep CIFAR-10 (mixture head, dequantized)
            "cifar10": ("dequantize", "discretized_logistic_mix", (32, 32), 3),
            # config 5: CelebA 64x64
            "celeba": ("dequantize", "discretized_logistic_mix", (64, 64), 3),
        }
        for name, (prep, lik, padded, ch) in expected.items():
            b = registry.load_dataset(name)
            assert b.preprocess == prep, name
            assert b.default_likelihood == lik, name
            assert b.padded_size == padded, name
            assert b.color_ch == ch, name


class TestDevicePipeline:
    def test_gather_matches_numpy(self, rng):
        arr = rng.integers(0, 256, size=(50, 4, 4, 1), dtype=np.uint8)
        ds = DeviceDataset(arr)
        idx = np.array([3, 7, 7, 49])
        out = np.asarray(ds.gather(jnp.asarray(idx)))
        np.testing.assert_array_equal(out, arr[idx])

    def test_epoch_indices_cover_all(self, rng):
        ds = DeviceDataset(np.zeros((37, 2, 2, 1), np.uint8))
        batches = list(ds.epoch_indices(np.random.default_rng(0), 10))
        assert len(batches) == 3  # drop remainder
        flat = np.concatenate(batches)
        assert len(np.unique(flat)) == 30

    def test_sequential_covers_all(self):
        ds = DeviceDataset(np.zeros((25, 2, 2, 1), np.uint8))
        batches = list(ds.sequential_indices(10))
        assert [len(b) for b in batches] == [10, 10, 5]
        np.testing.assert_array_equal(np.concatenate(batches), np.arange(25))

    def test_preprocess_none(self):
        x = jnp.asarray(np.array([[0, 1]], np.uint8))
        out = preprocess_batch(x, None, "none")
        assert out.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out), [[0.0, 1.0]])

    def test_preprocess_binarize_statistics(self):
        x = jnp.full((1, 100, 100, 1), 128, jnp.uint8)
        out = preprocess_batch(x, jax.random.key(0), "binarize")
        assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
        assert abs(float(out.mean()) - 128 / 255) < 0.02

    def test_preprocess_dequantize_range(self):
        x = np.array([0, 128, 255], np.float64)
        out = np.asarray(
            preprocess_batch(jnp.asarray(x, jnp.uint8), jax.random.key(0), "dequantize")
        )
        assert np.all(out >= x / 256.0) and np.all(out < (x + 1) / 256.0)

    def test_eval_preprocess_deterministic(self):
        x = jnp.asarray(np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1))
        a = np.asarray(eval_preprocess_batch(x, "binarize"))
        b = np.asarray(eval_preprocess_batch(x, "binarize"))
        np.testing.assert_array_equal(a, b)
        d = np.asarray(eval_preprocess_batch(x, "dequantize"))
        np.testing.assert_allclose(
            d, (np.asarray(x).astype(np.float32) + 0.5) / 256.0
        )

    def test_fold_in_indices_on_device(self):
        idx = fold_in_indices(jax.random.key(0), jnp.asarray(3), 100, 16)
        assert idx.shape == (16,)
        assert np.all((np.asarray(idx) >= 0) & (np.asarray(idx) < 100))
        idx2 = fold_in_indices(jax.random.key(0), jnp.asarray(3), 100, 16)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))

    def test_preprocess_inside_jit(self):
        arr = np.random.default_rng(0).integers(0, 256, (64, 8, 8, 1), np.uint8)
        ds = DeviceDataset(arr)

        @jax.jit
        def step(data, idx, key):
            batch = jnp.take(data, idx, axis=0)
            return preprocess_batch(batch, key, "dequantize").mean()

        v = step(ds.array, jnp.arange(16), jax.random.key(0))
        assert np.isfinite(float(v))


class TestNativeParser:
    """C++ .amat parser vs numpy oracle (built lazily via native/Makefile)."""

    def test_binary_roundtrip(self, tmp_path, rng):
        from lvae_tpu.data.native import load_amat_binary, native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        arr = (rng.uniform(size=(50, 784)) < 0.3).astype(np.uint8)
        p = tmp_path / "b.amat"
        np.savetxt(p, arr, fmt="%d")
        out = load_amat_binary(str(p))
        np.testing.assert_array_equal(out, arr)

    def test_binary_float_tokens(self, tmp_path, rng):
        # Larochelle files use "0.0000000" style tokens
        from lvae_tpu.data.native import load_amat_binary, native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        arr = (rng.uniform(size=(10, 20)) < 0.5).astype(np.uint8)
        p = tmp_path / "f.amat"
        np.savetxt(p, arr.astype(np.float64), fmt="%.7f")
        out = load_amat_binary(str(p))
        np.testing.assert_array_equal(out, arr)

    def test_float_roundtrip(self, tmp_path, rng):
        from lvae_tpu.data.native import load_amat_float, native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        arr = rng.standard_normal((30, 17)).astype(np.float32)
        p = tmp_path / "g.amat"
        np.savetxt(p, arr, fmt="%.6f")
        out = load_amat_float(str(p))
        np.testing.assert_allclose(out, arr, atol=1e-6)

    def test_no_trailing_newline(self, tmp_path):
        from lvae_tpu.data.native import load_amat_binary, native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        p = tmp_path / "n.amat"
        p.write_text("1 0 1\n0 1 0")  # no trailing newline
        out = load_amat_binary(str(p))
        np.testing.assert_array_equal(out, [[1, 0, 1], [0, 1, 0]])

    def test_missing_file_returns_none(self):
        from lvae_tpu.data.native import load_amat_binary, native_available

        if not native_available():
            pytest.skip("native toolchain unavailable")
        assert load_amat_binary("/nonexistent/x.amat") is None


class TestStreaming:
    def test_grain_loader_batches(self, rng):
        from lvae_tpu.data.streaming import GrainLoader

        arr = rng.integers(0, 256, (40, 4, 4, 1), np.uint8)
        it = GrainLoader(arr, batch_size=16, seed=0, num_threads=2).epochs()
        b = next(it)
        assert b.shape == (16, 4, 4, 1) and b.dtype == np.uint8

    @pytest.mark.slow
    def test_streaming_trainer(self):
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            max_steps=5, log_interval=100, test_interval=1000, seed=0,
            dry_run=True, streaming=True,
        )
        state = Trainer(Experiment(cfg)).run()
        assert int(state.step) == 5

    def test_config_from_dict_legacy_streaming_defaults_to_grain(self):
        """configs saved before stream_impl existed ran grain; the
        dataclass default ('array') must not fill in for them."""
        import dataclasses

        from lvae_tpu.config import ExperimentConfig, config_from_dict

        d = dataclasses.asdict(ExperimentConfig(streaming=True))
        d.pop("stream_impl")
        assert config_from_dict(d).stream_impl == "grain"
        d2 = dataclasses.asdict(ExperimentConfig())  # not a streaming run
        d2.pop("stream_impl")
        assert config_from_dict(d2).stream_impl == "array"

    @pytest.mark.slow
    def test_streaming_resume_adopts_stored_impl(self, tmp_path):
        """A run trained with grain, preempted, and relaunched under the
        new 'array' default must CONTINUE ON GRAIN (shuffle orders differ
        between impls): the trainer adopts the impl stored in the resumed
        run's config.json, the bitwise resume guarantee holds across the
        default change, and the re-saved config records the adopted impl."""
        import json

        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        base = dict(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            log_interval=100, test_interval=1000, checkpoint_interval=3,
            seed=0, streaming=True, output_dir=str(tmp_path),
        )
        full = Trainer(Experiment(ExperimentConfig(
            run_name="full", stream_impl="grain", max_steps=6, **base
        ))).run()

        Trainer(Experiment(ExperimentConfig(
            run_name="part", stream_impl="grain", max_steps=3, **base
        ))).run()
        # relaunch with the post-upgrade default ('array') — as a user's
        # unchanged pre-upgrade command line would after the default flip
        tr = Trainer(Experiment(ExperimentConfig(
            run_name="part", stream_impl="array", max_steps=6,
            auto_resume=True, **base
        )))
        resumed = tr.run()
        assert tr.cfg.stream_impl == "grain", "stored impl not adopted"
        with open(tmp_path / "part" / "config.json") as f:
            assert json.load(f)["stream_impl"] == "grain"
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            full.params, resumed.params,
        )

    def test_grain_loader_start_step_fast_forward(self, rng):
        """epochs(start_step=s) continues the stream exactly where an
        uninterrupted iteration would be after s batches — including
        across the epoch reshuffle boundary (40 imgs / b8 = 5 steps per
        epoch; s=7 lands mid-epoch-1)."""
        from lvae_tpu.data.streaming import GrainLoader

        arr = rng.integers(0, 256, (40, 4, 4, 1), np.uint8)
        ld = GrainLoader(arr, batch_size=8, seed=3, num_threads=1)
        full = [b.copy() for b, _ in zip(ld.epochs(), range(12))]
        resumed = [b.copy() for b, _ in zip(ld.epochs(start_step=7), range(5))]
        for a, b in zip(full[7:], resumed):
            np.testing.assert_array_equal(a, b)

    def test_grain_loader_start_step_must_align_with_stacks(self, rng):
        from lvae_tpu.data.streaming import GrainLoader

        arr = rng.integers(0, 256, (64, 4, 4, 1), np.uint8)
        ld = GrainLoader(arr, batch_size=8, seed=0, steps_per_call=3)
        with pytest.raises(ValueError, match="not a multiple"):
            next(ld.epochs(start_step=4))

    def test_grain_loader_steps_per_call_stacks(self, rng):
        from lvae_tpu.data.streaming import GrainLoader

        arr = rng.integers(0, 256, (64, 4, 4, 1), np.uint8)
        it = GrainLoader(
            arr, batch_size=8, seed=0, num_threads=2, steps_per_call=3
        ).epochs()
        b = next(it)
        assert b.shape == (3, 8, 4, 4, 1) and b.dtype == np.uint8

    def test_grain_loader_host_sharding_partitions(self, rng):
        """Two shards of the same source see disjoint strided slices."""
        from lvae_tpu.data.streaming import GrainLoader

        arr = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1)
        seen = set()
        for si in range(2):
            ld = GrainLoader(arr, batch_size=20, seed=0, shard_index=si,
                             shard_count=2, num_threads=1)
            batch = next(ld.epochs())
            vals = set(int(v) for v in batch.ravel())
            assert not (vals & seen)
            seen |= vals
        assert seen == set(range(40))

    @pytest.mark.slow
    def test_streaming_sharded_multistep_trainer(self):
        """--streaming composed with --steps-per-call and --num-data-shards
        on the 8-device CPU mesh (VERDICT r1 item 5)."""
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            max_steps=6, log_interval=100, test_interval=1000, seed=0,
            dry_run=True, streaming=True, steps_per_call=2, num_data_shards=8,
        )
        state = Trainer(Experiment(cfg)).run()
        assert int(state.step) == 6
        assert np.isfinite(float(jax.device_get(state.ema["elbo"])))


class TestArrayLoader:
    """The default streaming backend (--stream-impl array): per-epoch
    permutation + one batched gather per dispatch. Same contracts as
    GrainLoader (determinism, O(1) resume fast-forward, stack alignment,
    host sharding) plus the per-epoch drop-remainder / coverage semantics
    it documents (torch DataLoader(shuffle=True, drop_last=True))."""

    def test_batches(self, rng):
        from lvae_tpu.data.streaming import ArrayLoader

        arr = rng.integers(0, 256, (40, 4, 4, 1), np.uint8)
        it = ArrayLoader(arr, batch_size=16, seed=0).epochs()
        b = next(it)
        assert b.shape == (16, 4, 4, 1) and b.dtype == np.uint8

    def test_epoch_coverage_and_reshuffle(self, rng):
        """Within one epoch each image appears at most once (per-epoch
        drop-remainder); consecutive epochs draw different orders but the
        same multiset."""
        from lvae_tpu.data.streaming import ArrayLoader

        arr = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1)
        it = ArrayLoader(arr, batch_size=8, seed=0).epochs()
        epochs = []
        for _ in range(2):  # bpe = 5
            vals = np.concatenate([next(it).ravel() for _ in range(5)])
            assert len(set(vals.tolist())) == 40  # no repeats in-epoch
            epochs.append(vals)
        assert not np.array_equal(epochs[0], epochs[1])  # reshuffled
        assert set(epochs[0].tolist()) == set(epochs[1].tolist())

    def test_start_step_fast_forward(self, rng):
        """epochs(start_step=s) continues exactly where an uninterrupted
        iteration would be after s batches — including across the epoch
        boundary (bpe=5 here, so step 7 is mid-epoch-2)."""
        from lvae_tpu.data.streaming import ArrayLoader

        arr = rng.integers(0, 256, (40, 4, 4, 1), np.uint8)
        ld = ArrayLoader(arr, batch_size=8, seed=3)
        full = [b.copy() for b, _ in zip(ld.epochs(), range(12))]
        resumed = [b.copy() for b, _ in zip(ld.epochs(start_step=7), range(5))]
        for a, b in zip(full[7:], resumed):
            np.testing.assert_array_equal(a, b)

    def test_start_step_must_align_with_stacks(self, rng):
        from lvae_tpu.data.streaming import ArrayLoader

        arr = rng.integers(0, 256, (64, 4, 4, 1), np.uint8)
        ld = ArrayLoader(arr, batch_size=8, seed=0, steps_per_call=3)
        with pytest.raises(ValueError, match="not a multiple"):
            next(ld.epochs(start_step=4))

    def test_steps_per_call_stacks_and_straddle(self, rng):
        """[k, B] stacks; a stack straddling an epoch boundary (bpe=5,
        k=3: stack 2 holds batches 3,4 of epoch 0 and batch 0 of epoch 1)
        matches the flat k=1 stream batch-for-batch."""
        from lvae_tpu.data.streaming import ArrayLoader

        arr = rng.integers(0, 256, (40, 4, 4, 1), np.uint8)
        stacked = ArrayLoader(arr, batch_size=8, seed=0, steps_per_call=3)
        flat = ArrayLoader(arr, batch_size=8, seed=0)
        got = [b.copy() for b, _ in zip(stacked.epochs(), range(3))]
        want = [b.copy() for b, _ in zip(flat.epochs(), range(9))]
        assert got[0].shape == (3, 8, 4, 4, 1)
        for s, stack in enumerate(got):
            for j in range(3):
                np.testing.assert_array_equal(stack[j], want[3 * s + j])

    def test_host_sharding_partitions(self, rng):
        from lvae_tpu.data.streaming import ArrayLoader

        arr = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1)
        seen = set()
        for si in range(2):
            ld = ArrayLoader(arr, batch_size=20, seed=0, shard_index=si,
                             shard_count=2)
            batch = next(ld.epochs())
            vals = set(int(v) for v in batch.ravel())
            assert not (vals & seen)
            seen |= vals
        assert seen == set(range(40))

    def test_batch_larger_than_shard_rejected(self, rng):
        from lvae_tpu.data.streaming import ArrayLoader

        arr = rng.integers(0, 256, (16, 4, 4, 1), np.uint8)
        with pytest.raises(ValueError, match="exceeds"):
            ArrayLoader(arr, batch_size=16, shard_index=0, shard_count=2)

    def test_adjacent_seed_shards_draw_independent_shuffles(self):
        """Shard s of a seed-N run must not replay shard s-1 of seed N+1:
        seeds compose as a (seed, shard, epoch) tuple, not additively
        (ADVICE r4 #1). Compare the raw permutations — the shards slice
        different strided subsets, so batch values can't collide anyway."""
        from lvae_tpu.data.streaming import ArrayLoader, GrainLoader

        arr = np.arange(64, dtype=np.uint8).reshape(64, 1, 1, 1)
        a = ArrayLoader(arr, batch_size=8, seed=0, shard_index=1, shard_count=2)
        b = ArrayLoader(arr, batch_size=8, seed=1, shard_index=0, shard_count=2)
        assert not np.array_equal(a._perm(0), b._perm(0))
        # grain takes a scalar seed; the mixed seeds must differ too
        ga = GrainLoader(arr, batch_size=8, seed=0, shard_index=1,
                         shard_count=2, num_threads=1)
        gb = GrainLoader(arr, batch_size=8, seed=1, shard_index=0,
                         shard_count=2, num_threads=1)
        assert ga.seed != gb.seed

    @pytest.mark.slow
    def test_streaming_trainer_grain_impl(self):
        """--stream-impl grain keeps the worker-thread backend working
        end-to-end (the default trainer test above covers 'array')."""
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            max_steps=5, log_interval=100, test_interval=1000, seed=0,
            dry_run=True, streaming=True, stream_impl="grain",
        )
        state = Trainer(Experiment(cfg)).run()
        assert int(state.step) == 5

    def test_unknown_impl_rejected(self):
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            max_steps=2, seed=0, dry_run=True, streaming=True,
            stream_impl="tfds",
        )
        with pytest.raises(ValueError, match="unknown stream_impl"):
            Trainer(Experiment(cfg)).run()


class TestFixtureGenerator:
    """tools/make_fixtures.py writes synthetic stand-ins in the exact
    on-disk formats of every file-backed dataset; every registry name
    must then load through its real parser (incl. the C++ .amat path)."""

    def test_all_file_backed_datasets_load(self, tmp_path):
        import sys
        tools = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        )
        sys.path.insert(0, tools)
        try:
            import make_fixtures
        finally:
            sys.path.pop(0)
        make_fixtures.main(["--data-dir", str(tmp_path), "--n", "128"])

        expect = {
            "static_mnist": ((28, 28), 1, "none", "bernoulli"),
            "mnist": ((28, 28), 1, "binarize", "bernoulli"),
            "cifar10": ((32, 32), 3, "dequantize", "discretized_logistic_mix"),
            "svhn": ((32, 32), 3, "dequantize", "discretized_logistic"),
            "celeba": ((64, 64), 3, "dequantize", "discretized_logistic_mix"),
            "multi_dsprites_binary_rgb": ((64, 64), 3, "none", "bernoulli"),
            "multi_mnist_binary": ((48, 48), 1, "none", "bernoulli"),
        }
        for name, (img, ch, pre, lik) in expect.items():
            b = load_dataset(name, data_dir=str(tmp_path))
            assert b.img_size == img, name
            assert b.color_ch == ch, name
            assert b.preprocess == pre, name
            assert b.default_likelihood == lik, name
            assert b.train.dtype == np.uint8 and len(b.train) > 0, name
            assert len(b.test) > 0, name
