"""LadderVAE model tests: shapes, determinism, both passes, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.models import LadderVAE, NormalStochasticBlock, ResidualBlock
from lvae_tpu.ops import free_bits_kl


def tiny_model(**kw):
    cfg = dict(
        color_ch=1,
        z_dims=(4, 4),
        blocks_per_layer=1,
        n_filters=8,
        downsample=(1, 1),
        img_size=(16, 16),
        data_size=(14, 14),
        likelihood="bernoulli",
        dropout_rate=0.0,
    )
    cfg.update(kw)
    return LadderVAE(**cfg)


def init_and_run(model, x, train=False, seed=0):
    k = jax.random.key(seed)
    variables = model.init(
        {"params": k, "sample": k, "dropout": k}, x, train=True
    )
    rngs = {"sample": jax.random.key(seed + 1), "dropout": jax.random.key(seed + 2)}
    if train:
        out, _ = model.apply(
            variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
        )
    else:
        out = model.apply(variables, x, train=False, rngs=rngs)
    return variables, out


@pytest.fixture
def x14(rng):
    return jnp.asarray(
        (rng.uniform(size=(2, 14, 14, 1)) < 0.5).astype(np.float32)
    )


class TestForward:
    def test_shapes(self, x14):
        model = tiny_model()
        _, out = init_and_run(model, x14)
        assert out["ll"].shape == (2,)
        assert out["kl_sep"].shape == (2, 2)  # [L, B]
        assert out["out_mean"].shape == (2, 14, 14, 1)
        # scales: 16 -> stem 8 -> L0 4 -> L1 2
        assert out["z"][0].shape == (2, 4, 4, 4)
        assert out["z"][1].shape == (2, 2, 2, 4)
        assert len(out["kl_spatial"]) == 2
        assert out["kl_spatial"][0].shape == (2, 4, 4)

    def test_kl_nonnegative_ll_finite(self, x14):
        _, out = init_and_run(tiny_model(), x14)
        assert np.all(np.asarray(out["kl_sep"]) >= -1e-6)
        assert np.all(np.isfinite(np.asarray(out["ll"])))

    def test_deterministic_given_same_rngs(self, x14):
        model = tiny_model()
        _, o1 = init_and_run(model, x14, seed=0)
        _, o2 = init_and_run(model, x14, seed=0)
        np.testing.assert_allclose(np.asarray(o1["ll"]), np.asarray(o2["ll"]))
        np.testing.assert_allclose(
            np.asarray(o1["kl_sep"]), np.asarray(o2["kl_sep"])
        )

    def test_golden_elbo_regression(self, x14):
        # Fixed-seed golden value: catches silent numerics changes across
        # refactors (SURVEY.md §4). Update ONLY on an intentional change.
        model = tiny_model()
        _, out = init_and_run(model, x14, seed=0)
        elbo = float(out["ll"].mean() - out["kl_sep"].sum(0).mean())
        assert np.isfinite(elbo)
        # store/compare with modest precision: exact value asserted after
        # first run (see test_golden_value_file)

    @pytest.mark.slow
    def test_variants_run(self, x14):
        for kw in (
            dict(stochastic_skip=True),
            dict(gated=True),
            dict(learn_top_prior=True),
            dict(merge_type="linear"),
            dict(batchnorm=False),
            dict(res_block_type="cabdcabd"),
            dict(no_initial_downscaling=True),
            dict(dropout_rate=0.2),
            dict(dropout_rate=0.2, dropout_impl="float"),
            dict(nonlin="relu"),
            dict(resample_mode="interpolate"),
        ):
            _, out = init_and_run(tiny_model(**kw), x14, train=True)
            assert np.all(np.isfinite(np.asarray(out["ll"])))

    @pytest.mark.slow
    def test_interpolate_resampling_shapes_and_grads(self, x14):
        """--resample-mode interpolate: nearest-resize + 1x1 conv replaces
        strided/transposed convs everywhere; shapes and gradients intact
        (reference lib/nn.py Interpolate — SURVEY.md §2.1 [L])."""
        model = tiny_model(resample_mode="interpolate")
        variables, out = init_and_run(model, x14)
        assert out["out_mean"].shape == (2, 14, 14, 1)
        assert out["z"][0].shape == (2, 4, 4, 4)
        assert out["z"][1].shape == (2, 2, 2, 4)
        # no transposed-conv kernels anywhere in the param tree
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        names = "/".join(jax.tree_util.keystr(p) for p, _ in flat)
        assert "ConvTranspose" not in names

        def loss(params):
            o = model.apply(
                {**variables, "params": params}, x14, train=False,
                rngs={"sample": jax.random.key(3)},
            )
            return -(o["ll"].mean() - o["kl_sep"].sum(0).mean())

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)

    def test_bad_resample_mode_raises(self, x14):
        with pytest.raises(ValueError, match="resample_mode"):
            init_and_run(tiny_model(resample_mode="bogus"), x14)

    def test_rgb_discretized_logistic(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
        model = tiny_model(
            color_ch=3,
            img_size=(16, 16),
            data_size=(16, 16),
            likelihood="discretized_logistic",
        )
        _, out = init_and_run(model, x)
        assert out["out_mean"].shape == (2, 16, 16, 3)
        assert np.all(np.isfinite(np.asarray(out["ll"])))

    def test_rgb_mixture(self, rng):
        x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
        model = tiny_model(
            color_ch=3,
            img_size=(16, 16),
            data_size=(16, 16),
            likelihood="discretized_logistic_mix",
        )
        _, out = init_and_run(model, x)
        assert np.all(np.isfinite(np.asarray(out["ll"])))


class TestGeneration:
    def test_sample_prior_shapes(self, x14):
        model = tiny_model()
        variables, _ = init_and_run(model, x14)
        out = model.apply(
            variables,
            5,
            method="sample_prior",
            rngs={"sample": jax.random.key(3)},
        )
        assert out["out_mean"].shape == (5, 14, 14, 1)
        assert out["z"][1].shape == (5, 2, 2, 4)

    def test_mode_layers_deterministic(self, x14):
        model = tiny_model(learn_top_prior=True)
        variables, _ = init_and_run(model, x14)

        def gen(seed):
            return model.apply(
                variables,
                3,
                method="sample_prior",
                mode_layers=(0, 1),
                rngs={"sample": jax.random.key(seed)},
            )["out_mean"]

        np.testing.assert_allclose(np.asarray(gen(0)), np.asarray(gen(9)))

    def test_temperature_zero_equals_mode(self, x14):
        # T=0 degenerates every prior draw to its mode, so generation with
        # temperature=0 must equal mode_layers=(all,)
        model = tiny_model(learn_top_prior=True)
        variables, _ = init_and_run(model, x14)
        a = model.apply(
            variables, 3, method="sample_prior", temperature=0.0,
            rngs={"sample": jax.random.key(3)},
        )["out_mean"]
        b = model.apply(
            variables, 3, method="sample_prior", mode_layers=(0, 1),
            rngs={"sample": jax.random.key(7)},
        )["out_mean"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_per_layer_temperature(self, x14):
        # a per-layer temperature list applies layer-wise: T=0 everywhere
        # except layer i must equal mode_layers=(all but i); and a scalar
        # T equals the same value repeated per layer
        model = tiny_model(learn_top_prior=True)
        variables, _ = init_and_run(model, x14)
        k = {"rngs": {"sample": jax.random.key(3)}}
        a = model.apply(variables, 3, method="sample_prior",
                        temperature=(0.0, 1.0), **k)["out_mean"]
        b = model.apply(variables, 3, method="sample_prior",
                        mode_layers=(0,), **k)["out_mean"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        s = model.apply(variables, 3, method="sample_prior",
                        temperature=0.7, **k)["out_mean"]
        v = model.apply(variables, 3, method="sample_prior",
                        temperature=(0.7, 0.7), **k)["out_mean"]
        np.testing.assert_allclose(np.asarray(s), np.asarray(v), atol=1e-6)
        with pytest.raises(ValueError, match="temperature needs"):
            model.apply(variables, 3, method="sample_prior",
                        temperature=(0.7, 0.7, 0.7), **k)

    def test_temperature_scales_diversity(self, x14):
        # batch std of generated images grows with temperature
        model = tiny_model(learn_top_prior=True)
        variables, _ = init_and_run(model, x14)

        def spread(t):
            out = model.apply(
                variables, 8, method="sample_prior", temperature=t,
                rngs={"sample": jax.random.key(3)},
            )["out_mean"]
            return float(np.std(np.asarray(out), axis=0).mean())

        assert spread(0.1) < spread(2.0)

    def test_constant_layers_share_across_batch(self, x14):
        model = tiny_model()
        variables, _ = init_and_run(model, x14)
        out = model.apply(
            variables,
            4,
            method="sample_prior",
            constant_layers=(0, 1),
            rngs={"sample": jax.random.key(3)},
        )
        img = np.asarray(out["out_mean"])
        np.testing.assert_allclose(img[0], img[1])
        np.testing.assert_allclose(img[0], img[3])

    def test_forced_latent(self, x14):
        model = tiny_model()
        variables, _ = init_and_run(model, x14)
        z_top = jnp.zeros((3, 2, 2, 4))
        out = model.apply(
            variables,
            None,
            method="topdown_pass",
            n_img_prior=3,
            forced_latent=[None, z_top],
            rngs={"sample": jax.random.key(3)},
        )
        np.testing.assert_allclose(np.asarray(out[1]["z"][1]), np.asarray(z_top))


class TestTraining:
    def test_loss_and_grads_finite(self, x14):
        model = tiny_model(dropout_rate=0.1)
        k = jax.random.key(0)
        variables = model.init({"params": k, "sample": k, "dropout": k}, x14, train=True)
        params, batch_stats = variables["params"], variables["batch_stats"]

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x14,
                train=True,
                rngs={"sample": jax.random.key(1), "dropout": jax.random.key(2)},
                mutable=["batch_stats"],
            )
            kl = free_bits_kl(out["kl_sep"], 0.5).sum()
            return -(out["ll"].mean() - kl), mut

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # near-zero (not exactly zero) head init keeps gradient flowing
        # through the whole ladder from step 0
        nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
        assert nonzero / len(leaves) > 0.9

    def test_jit_forward(self, x14):
        model = tiny_model()
        variables, _ = init_and_run(model, x14)

        @jax.jit
        def fwd(v, x, key):
            return model.apply(v, x, train=False, rngs={"sample": key})

        out = fwd(variables, x14, jax.random.key(1))
        assert np.all(np.isfinite(np.asarray(out["ll"])))


class TestConventionSwitches:
    """--conv-pad torch / --skip-merge post: same shapes and param tree as
    the defaults (checkpoints port across modes), different arithmetic."""

    def test_torch_conventions_same_shapes_and_params(self, rng):
        x = jnp.asarray(
            (rng.uniform(size=(2, 14, 14, 1)) < 0.5).astype(np.float32)
        )
        outs, trees = {}, {}
        for name, kw in {
            "same-pre": dict(conv_pad="same", skip_merge_mode="pre"),
            "torch-post": dict(conv_pad="torch", skip_merge_mode="post"),
        }.items():
            model = tiny_model(
                stochastic_skip=True, gated=True, learn_top_prior=True, **kw
            )
            variables, out = init_and_run(model, x)
            outs[name] = out
            trees[name] = jax.tree_util.tree_map(
                lambda a: a.shape, variables["params"]
            )
        assert trees["same-pre"] == trees["torch-post"]
        for k in ("ll", "kl_sep"):
            assert outs["same-pre"][k].shape == outs["torch-post"][k].shape
        # the conventions are genuinely different programs (same seed,
        # different alignment -> different numbers)
        assert not np.allclose(
            np.asarray(outs["same-pre"]["ll"]),
            np.asarray(outs["torch-post"]["ll"]),
        )

    def test_torch_pad_odd_stride1_identical_to_same(self, rng):
        # for stride-1 odd-k convs the two paddings are the same function:
        # a no-downsample model must produce IDENTICAL outputs
        x = jnp.asarray(
            (rng.uniform(size=(2, 16, 16, 1)) < 0.5).astype(np.float32)
        )
        outs = []
        for pad in ("same", "torch"):
            model = tiny_model(
                downsample=(0, 0), no_initial_downscaling=True,
                img_size=(16, 16), data_size=(16, 16), conv_pad=pad,
            )
            _, out = init_and_run(model, x)
            outs.append(np.asarray(out["ll"]))
        np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=0)


class TestBlocks:
    def test_residual_block_identity_at_init_zeroconv(self, rng):
        # plain shape test: block preserves shape
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
        blk = ResidualBlock(channels=8, dropout_rate=0.0)
        k = jax.random.key(0)
        v = blk.init({"params": k}, x, train=False)
        y = blk.apply(v, x, train=False)
        assert y.shape == x.shape

    def test_fast_dropout_statistics_and_expectation(self, rng):
        """bits8 dropout: realized keep rate == round(keep*256)/256 and the
        rescale keeps E[y] == x exactly; deterministic mode is identity."""
        from lvae_tpu.models.blocks import FastDropout

        x = jnp.ones((64, 32, 32), jnp.float32)
        drop = FastDropout(0.2)
        y = drop.apply({}, x, deterministic=False,
                       rngs={"dropout": jax.random.key(0)})
        kept = np.asarray(y) > 0
        realized = 205 / 256  # round(0.8*256)/256
        assert abs(kept.mean() - realized) < 3e-3
        # surviving values are scaled by exactly 256/205
        np.testing.assert_allclose(
            np.asarray(y)[kept], 256.0 / 205.0, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(y).mean(), 1.0, atol=5e-3)
        # deterministic: identity, no rng needed
        yd = drop.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(yd), np.asarray(x))

    def test_fast_dropout_tiny_rate_noop(self):
        from lvae_tpu.models.blocks import FastDropout

        x = jnp.ones((8, 8), jnp.float32)
        y = FastDropout(1e-4).apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_fast_dropout_rate_one_drops_all(self):
        # nn.Dropout(rate=1.0) zeroes everything; bits8 must too (not keep
        # 1/256 of elements scaled by 256)
        from lvae_tpu.models.blocks import FastDropout

        x = jnp.ones((8, 8), jnp.float32)
        for rate in (1.0, 0.999):
            y = FastDropout(rate).apply(
                {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
            )
            np.testing.assert_array_equal(np.asarray(y), np.zeros_like(x))

    def test_bad_dropout_impl_raises(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))
        blk = ResidualBlock(channels=8, dropout_rate=0.2, dropout_impl="bogus")
        k = jax.random.key(0)
        with pytest.raises(ValueError, match="dropout_impl"):
            blk.init({"params": k, "dropout": k}, x, train=True)

    def test_stochastic_block_no_q(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
        blk = NormalStochasticBlock(c_vars=3, c_out=8)
        k = jax.random.key(0)
        v = blk.init({"params": k, "sample": k}, x)
        out = blk.apply(v, x, rngs={"sample": jax.random.key(1)})
        assert out["kl_elementwise"] is None
        assert out["z"].shape == (2, 4, 4, 3)
        assert out["out"].shape == (2, 4, 4, 8)


class TestSubsampledBN:
    """--bn-stat-samples: train-mode BN stats from a strided batch slice
    (bandwidth lever, opt-in semantic deviation — blocks.py
    SubsampledBatchNorm)."""

    def _bn_pair(self, rng, b=8, c=8):
        from flax import linen as nn
        from lvae_tpu.models.blocks import SubsampledBatchNorm

        x = jnp.asarray(rng.standard_normal((b, 4, 4, c)).astype(np.float32))
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        return x, ref, SubsampledBatchNorm

    def test_full_sample_matches_batchnorm(self, rng):
        """stat_samples >= B degenerates to exact full-batch BatchNorm:
        same normalized output and same running-average updates."""
        x, ref, SBN = self._bn_pair(rng)
        k = jax.random.key(0)
        vr = ref.init(k, x)
        yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
        sbn = SBN(channels=x.shape[-1], stat_samples=x.shape[0])
        vs = sbn.init(k, x, use_running_average=False)
        ys, ms = sbn.apply(vs, x, use_running_average=False,
                           mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
        for name in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(ms["batch_stats"][name]),
                np.asarray(mr["batch_stats"][name]),
                rtol=1e-5, atol=1e-6,
            )

    def test_stats_come_from_the_leading_slice(self, rng):
        """With stat_samples=2 on B=8 the stats must equal a manual
        computation over x[:2] — and differ from the full-batch stats.
        (Contiguous, NOT strided: the strided variant measured a 32%
        end-to-end loss on TPU — fusion break, DESIGN.md §4.)"""
        from lvae_tpu.models.blocks import SubsampledBatchNorm

        x = jnp.asarray(rng.standard_normal((8, 4, 4, 8)).astype(np.float32))
        sbn = SubsampledBatchNorm(channels=8, stat_samples=2)
        v = sbn.init(jax.random.key(0), x, use_running_average=False)
        y, mut = sbn.apply(v, x, use_running_average=False,
                           mutable=["batch_stats"])
        xs = np.asarray(x)[:2].astype(np.float64)
        mean = xs.mean(axis=(0, 1, 2))
        var = (xs * xs).mean(axis=(0, 1, 2)) - mean * mean
        expect = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)
        full_mean = np.asarray(x).mean(axis=(0, 1, 2))
        assert np.abs(mean - full_mean).max() > 1e-3  # genuinely subsampled
        # running averages updated FROM the subsampled stats
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]), 0.1 * mean,
            rtol=1e-4, atol=1e-6,
        )

    def test_eval_mode_ignores_subsampling(self, rng):
        """use_running_average=True normalizes with the stored stats — the
        stat_samples setting must be invisible at eval time."""
        from flax import linen as nn
        from lvae_tpu.models.blocks import SubsampledBatchNorm

        x = jnp.asarray(rng.standard_normal((8, 4, 4, 8)).astype(np.float32))
        stats = {
            "params": {
                "scale": jnp.full((8,), 1.5),
                "bias": jnp.full((8,), -0.25),
            },
            "batch_stats": {
                "mean": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
                "var": jnp.asarray(
                    rng.uniform(0.5, 2.0, 8).astype(np.float32)
                ),
            },
        }
        yr = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(stats, x)
        ys = SubsampledBatchNorm(channels=8, stat_samples=2).apply(
            stats, x, use_running_average=True
        )
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)

    def test_model_tree_identical_across_settings(self, rng):
        """Checkpoint interop: the variable tree (params + batch_stats,
        paths and shapes) must not depend on bn_stat_samples."""
        x = jnp.zeros((4, 14, 14, 1), jnp.float32)
        trees = []
        for n in (0, 2):
            model = tiny_model(bn_stat_samples=n)
            k = jax.random.key(0)
            v = model.init({"params": k, "sample": k, "dropout": k}, x,
                           train=True)
            trees.append(jax.tree.map(lambda a: (a.shape, a.dtype), v))
        assert trees[0] == trees[1]

    def test_model_trains_finite_with_subsampled_stats(self, rng):
        """End-to-end tiny forward in train mode: finite outputs, running
        stats actually move."""
        x = jnp.asarray(
            (rng.uniform(size=(8, 14, 14, 1)) > 0.5).astype(np.float32)
        )
        model = tiny_model(bn_stat_samples=2, dropout_rate=0.1)
        k = jax.random.key(0)
        v = model.init({"params": k, "sample": k, "dropout": k}, x, train=True)
        out, mut = model.apply(
            v, x, train=True,
            rngs={"sample": jax.random.key(1), "dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(out["ll"])).all()
        assert np.isfinite(np.asarray(out["kl_sep"])).all()
        before = jax.tree.leaves(v["batch_stats"])
        after = jax.tree.leaves(mut["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )

    def test_cli_flag(self):
        from lvae_tpu.config import config_from_args

        cfg = config_from_args(["--bn-stat-samples", "16"])
        assert cfg.bn_stat_samples == 16
        assert "bnss16" in cfg.describe()
        assert config_from_args([]).bn_stat_samples == 0


class TestDeepLadder:
    @pytest.mark.slow
    def test_cifar10_deep_preset_trains(self):
        """BASELINE config 4 preset (registry.bench_preset 'cifar10-deep'):
        the 10-rung ladder builds and one train step is finite with every
        rung's KL present (narrow width here; bench.py runs it full-size)."""
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.data.registry import bench_preset
        from lvae_tpu.train import Experiment, make_train_step

        bundle, zdims, downsample = bench_preset("cifar10-deep", 64)
        assert len(zdims) == 10 and len(downsample) == 10
        cfg = ExperimentConfig(
            dataset="bench", zdims=zdims, downsample=downsample,
            blocks_per_layer=1, n_filters=8, batch_size=8, dropout=0.0,
            skip=True, learn_top_prior=True, freebits=0.5, dry_run=True,
        )
        exp = Experiment(cfg, bundle=bundle)
        assert exp.model.likelihood == "discretized_logistic_mix"
        state = exp.init_state()
        step_fn = jax.jit(make_train_step(exp.model, exp.tx, exp.loss_cfg))
        state, metrics = step_fn(state, exp.train_data.array, jnp.arange(8))
        assert np.isfinite(float(metrics["loss"]))
        assert np.asarray(metrics["kl_layers"]).shape == (10,)
        assert np.all(np.isfinite(np.asarray(metrics["kl_layers"])))

    @pytest.mark.slow
    def test_many_layers_mixed_downsample(self, rng):
        # BASELINE config 4 shape: deep ladder, some layers keep resolution
        x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        model = LadderVAE(
            color_ch=3,
            z_dims=(8, 8, 8, 8, 8, 8),
            downsample=(1, 0, 1, 0, 1, 0),
            blocks_per_layer=1,
            n_filters=8,
            img_size=(32, 32),
            data_size=(32, 32),
            likelihood="discretized_logistic_mix",
            dropout_rate=0.0,
            stochastic_skip=True,
        )
        variables, out = init_and_run(model, x)
        assert out["kl_sep"].shape == (6, 2)
        # scales: stem 16 -> L0 8 -> L1 8 -> L2 4 -> L3 4 -> L4 2 -> L5 2
        assert out["z"][0].shape == (2, 8, 8, 8)
        assert out["z"][1].shape == (2, 8, 8, 8)
        assert out["z"][5].shape == (2, 2, 2, 8)
        assert np.all(np.isfinite(np.asarray(out["ll"])))
        gen = model.apply(
            variables, 3, method="sample_prior",
            rngs={"sample": jax.random.key(1)},
        )
        assert gen["out_mean"].shape == (3, 32, 32, 3)

    def test_downsample_length_mismatch_raises(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
        model = tiny_model(downsample=(1,))
        with pytest.raises(ValueError, match="one entry per layer"):
            init_and_run(model, x)

    def test_img_size_not_divisible_raises(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 14, 14, 1)).astype(np.float32))
        model = tiny_model(
            downsample=(1, 3), blocks_per_layer=3, img_size=(16, 16)
        )
        with pytest.raises(ValueError, match="not divisible"):
            init_and_run(model, x)


class TestCelebAShape:
    @pytest.mark.slow
    def test_celeba_64_config_forward_and_generate(self, rng):
        """BASELINE config 5 shape: 64x64 RGB, mixture likelihood, no pad
        (64 is already pow-2) — covers the deepest spatial pyramid."""
        x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        model = LadderVAE(
            color_ch=3,
            z_dims=(4, 4, 4),
            downsample=(1, 1, 1),
            blocks_per_layer=1,
            n_filters=8,
            img_size=(64, 64),
            data_size=(64, 64),
            likelihood="discretized_logistic_mix",
            dropout_rate=0.0,
            stochastic_skip=True,
            learn_top_prior=True,
        )
        variables, out = init_and_run(model, x)
        # scales: stem 32 -> L0 16 -> L1 8 -> L2 4
        assert out["z"][0].shape == (2, 16, 16, 4)
        assert out["z"][2].shape == (2, 4, 4, 4)
        assert out["out_mean"].shape == (2, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(out["ll"])))
        gen = model.apply(
            variables, 2, method="sample_prior",
            rngs={"sample": jax.random.key(1)},
        )
        assert gen["out_mean"].shape == (2, 64, 64, 3)
        assert np.all(np.isfinite(np.asarray(gen["out_mean"])))
