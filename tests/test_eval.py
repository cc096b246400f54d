"""Evaluation tests: streaming logsumexp, IW-LL estimator, viz grids."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.eval.iwll import (
    evaluate_iwll,
    make_iwll_step,
    streaming_logsumexp_final,
    streaming_logsumexp_init,
    streaming_logsumexp_update,
)
from lvae_tpu.eval.viz import make_grid, save_image_grid
from lvae_tpu.train import Experiment, Trainer


def tiny_exp(**kw):
    cfg = dict(
        dataset="synthetic",
        zdims=(4, 4),
        downsample=(1, 1),
        blocks_per_layer=1,
        n_filters=8,
        batch_size=16,
        test_batch_size=32,
        dropout=0.0,
        max_steps=5,
        log_interval=100,
        test_interval=1000,
        seed=0,
        dry_run=True,
    )
    cfg.update(kw)
    return Experiment(ExperimentConfig(**cfg))


class TestStreamingLogsumexp:
    def test_matches_torch(self, rng):
        xs = rng.standard_normal((20, 7)).astype(np.float32) * 10
        carry = streaming_logsumexp_init(7)
        for row in xs:
            carry = streaming_logsumexp_update(carry, jnp.asarray(row))
        out = np.asarray(streaming_logsumexp_final(carry))
        ref = torch.logsumexp(torch.tensor(xs), dim=0).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_extreme_values(self):
        carry = streaming_logsumexp_init(2)
        for v in ([-1e4, 1e4], [-1e4 + 1, 1e4 - 1]):
            carry = streaming_logsumexp_update(carry, jnp.asarray(v, jnp.float32))
        out = np.asarray(streaming_logsumexp_final(carry))
        assert np.all(np.isfinite(out))
        ref = torch.logsumexp(
            torch.tensor([[-1e4, 1e4], [-1e4 + 1, 1e4 - 1]], dtype=torch.float32), 0
        ).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5)


class TestIWLL:
    @pytest.mark.slow
    def test_iwll_at_least_elbo(self):
        # The IWAE bound is tighter than the ELBO in expectation; with a
        # trained tiny model and k=32 the gap must not be materially negative.
        exp = tiny_exp(max_steps=40, lr=3e-3)
        state = Trainer(exp).run()
        elbo = exp.evaluate(state, max_batches=1)["elbo"]
        iw = evaluate_iwll(exp, state, n_samples=32, max_batches=1)
        assert iw["iw_ll"] > elbo - 1.0
        assert np.isfinite(iw["iw_bpd"])

    def test_k1_matches_single_elbo_sample(self):
        # k=1: IW-LL estimator equals one ELBO draw (logsumexp over 1),
        # computed per-image with fold_in(fold_in(key, idx_i), 0) keys
        exp = tiny_exp()
        state = exp.init_state()
        step = jax.jit(make_iwll_step(exp.model, exp.loss_cfg, 1))
        idx = jnp.arange(8)
        batch = exp.test_data.gather(idx)
        key = jax.random.key(5)
        out = np.asarray(step(state, batch, idx, key))
        # manual oracle: one forward per image with its own folded key
        from lvae_tpu.data.device import eval_preprocess_batch

        x = eval_preprocess_batch(batch, exp.loss_cfg.preprocess, idx)
        ref = []
        for i in range(8):
            k_i = jax.random.fold_in(jax.random.fold_in(key, i), 0)
            o = exp.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x[i : i + 1], train=False, rngs={"sample": k_i},
            )
            ref.append(float(o["ll"][0] - o["kl_sep"][:, 0].sum()))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_more_samples_tighter(self):
        # IW bound is monotone in k in expectation; check the trend with
        # common random numbers over a few seeds.
        exp = tiny_exp(max_steps=20, lr=3e-3)
        state = Trainer(exp).run()
        idx = jnp.arange(16)
        batch = exp.test_data.gather(idx)
        lls = {}
        for k in (1, 16):
            step = jax.jit(make_iwll_step(exp.model, exp.loss_cfg, k))
            vals = [
                float(np.asarray(step(state, batch, idx, jax.random.key(s))).mean())
                for s in range(4)
            ]
            lls[k] = np.mean(vals)
        assert lls[16] > lls[1]


class TestIWLLChunking:
    """The chunked k-scan (VERDICT r4 weak #4) must be output-identical to
    the serial scan for every chunk size: keys are per-(image, sample) and
    the logsumexp accumulator algebra is associative."""

    def _run(self, impl, chunk, k=10):
        exp = tiny_exp()
        state = exp.init_state()
        step = jax.jit(make_iwll_step(exp.model, exp.loss_cfg, k, impl, chunk=chunk))
        idx = jnp.arange(8)
        batch = exp.test_data.gather(idx)
        return np.asarray(step(state, batch, idx, jax.random.key(7)))

    @pytest.mark.parametrize("chunk", [2, 4, 5, 10])
    def test_streaming_chunked_matches_serial(self, chunk):
        ref = self._run("streaming", 1)
        out = self._run("streaming", chunk)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_non_divisor_chunk_pads_correctly(self):
        # k=10, chunk=4 -> 3 iterations with 2 masked pad samples; the pad
        # rows are -inf so they cannot perturb the estimate
        ref = self._run("streaming", 1, k=10)
        out = self._run("streaming", 4, k=10)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
        assert np.all(np.isfinite(out))

    def test_pallas_impl_chunked_matches_serial(self):
        # interpret-mode on CPU; the chunked path stacks [n_iters, c, B],
        # reshapes, and slices the pad rows before the kernel
        ref = self._run("pallas", 1, k=6)
        out = self._run("pallas", 4, k=6)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_chunk_larger_than_k_clamps(self):
        ref = self._run("streaming", 1, k=3)
        out = self._run("streaming", 16, k=3)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_evaluate_iwll_chunk_invariant(self):
        exp = tiny_exp()
        state = exp.init_state()
        a = evaluate_iwll(exp, state, n_samples=6, max_batches=1)
        b = evaluate_iwll(exp, state, n_samples=6, max_batches=1, chunk=3)
        np.testing.assert_allclose(a["iw_ll"], b["iw_ll"], rtol=1e-6)


class TestEvalBatchingInvariance:
    """VERDICT round 2 weak #3 / next-round #4: test ELBO and IW-LL must
    not depend on --test-batch-size or sweep chunking. All eval randomness
    (dynamic binarization + latent draws) is keyed per-image on the global
    dataset index."""

    def _bundle(self, n=40):
        from lvae_tpu.data.registry import DatasetBundle

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, size=(n, 28, 28, 1), dtype=np.uint8)
        return DatasetBundle(
            "binmnist_fixture", arr, arr[:37], (28, 28), (32, 32), 1,
            "binarize", "bernoulli",
        )

    def _exp(self, bundle, **kw):
        cfg = dict(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16,
            dropout=0.0, max_steps=5, log_interval=100, test_interval=1000,
            seed=0, dry_run=True,
        )
        cfg.update(kw)
        return Experiment(ExperimentConfig(**cfg), bundle=bundle)

    def test_elbo_invariant_to_test_batch_size(self):
        bundle = self._bundle()
        e1 = self._exp(bundle, test_batch_size=37)  # one full batch
        e2 = self._exp(bundle, test_batch_size=8)   # 5 batches, last padded
        state = e1.init_state()
        m1 = e1.evaluate(state)
        m2 = e2.evaluate(state)
        for k in ("ll", "kl", "elbo"):
            np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            m1["kl_layers"], m2["kl_layers"], rtol=1e-5, atol=1e-4
        )

    def test_iwll_invariant_to_test_batch_size(self):
        bundle = self._bundle()
        e1 = self._exp(bundle, test_batch_size=37)
        e2 = self._exp(bundle, test_batch_size=8)
        state = e1.init_state()
        a = evaluate_iwll(e1, state, n_samples=3)
        b = evaluate_iwll(e2, state, n_samples=3)
        np.testing.assert_allclose(a["iw_ll"], b["iw_ll"], rtol=1e-5, atol=1e-4)

    def test_iwll_rounds_batch_by_data_axis_only(self, monkeypatch):
        """On a (data=1, space=4) mesh the batch shards only over the
        size-1 data axis: IW-LL must not round batches up to the full
        device count (over-padding every batch of the most expensive eval
        in the framework — review round 3) and must match the meshless
        result."""
        import lvae_tpu.parallel as par

        bundle = self._bundle()
        e1 = self._exp(bundle, test_batch_size=6)
        e2 = self._exp(bundle, test_batch_size=6, spatial_shards=4)
        assert e2.mesh is not None and e2.mesh.shape["data"] == 1
        state = e1.init_state()
        a = evaluate_iwll(e1, state, n_samples=3)
        seen = []
        orig = par.eval_batch_stream
        monkeypatch.setattr(
            par, "eval_batch_stream",
            lambda mesh, td, bt, bs, mb=None: seen.append(bs)
            or orig(mesh, td, bt, bs, mb),
        )
        b = evaluate_iwll(e2, state, n_samples=3)
        assert seen == [6]  # old code rounded to devices.size -> 8
        assert b["n_images"] == a["n_images"] == 37
        np.testing.assert_allclose(a["iw_ll"], b["iw_ll"], rtol=1e-5, atol=1e-4)


class TestViz:
    def test_grid_shape_and_placement(self, rng):
        imgs = rng.uniform(size=(5, 4, 4, 1)).astype(np.float32)
        g = make_grid(imgs, ncol=3, pad=1, pad_value=0.0)
        assert g.shape == (2 * 5 + 1, 3 * 5 + 1, 1)
        np.testing.assert_allclose(g[1:5, 1:5, :], imgs[0])
        np.testing.assert_allclose(g[6:10, 6:10, :], imgs[4])

    def test_save_png(self, tmp_path, rng):
        imgs = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
        p = str(tmp_path / "g.png")
        save_image_grid(imgs, p)
        from PIL import Image

        im = Image.open(p)
        assert im.size[0] > 8 and im.size[1] > 8


class TestEvaluateCLI:
    @pytest.mark.slow
    def test_end_to_end(self, tmp_path, capsys):
        from lvae_tpu.config import ExperimentConfig

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, batch_size=16,
            test_batch_size=32, dropout=0.0, max_steps=6,
            log_interval=100, test_interval=1000, checkpoint_interval=3,
            seed=0, dry_run=False, output_dir=str(tmp_path), run_name="r",
        )
        Trainer(Experiment(cfg)).run()
        import evaluate

        evaluate.main([
            "--load", str(tmp_path / "r"), "--ll", "--iw-samples", "4",
        ])
        out = capsys.readouterr().out
        assert "test elbo" in out
        assert "IW log-likelihood" in out
        assert "kl/layer_1" in out
        assert (tmp_path / "r" / "imgs").exists()
        elbo_line = [l for l in out.splitlines() if "test elbo" in l]

        # generation diagnostics (reference SURVEY.md §3.3): mode /
        # constant layers + prior temperature from the CLI
        evaluate.main([
            "--load", str(tmp_path / "r"), "--nimages", "4",
            "--mode-layers", "1", "--constant-layers", "0",
            "--temperature", "0.7",
        ])
        out = capsys.readouterr().out
        assert "generation-diagnostics" in out
        diag = list((tmp_path / "r" / "imgs").glob("diag_*"))
        assert len(diag) == 1
        assert "mode1" in diag[0].name and "const0" in diag[0].name
        assert "T0.7" in diag[0].name

        # eval-time kernel-policy override: metrics identical to the
        # stored policy (checkpoints are layout-identical across policies)
        evaluate.main(["--load", str(tmp_path / "r"), "--fused", "none"])
        out2 = capsys.readouterr().out
        line2 = [l for l in out2.splitlines() if "test elbo" in l]
        assert line2 == elbo_line

        # --logsumexp pallas on a sharded eval mesh: the kernel is
        # registered with the SPMD partitioner (shards over B, k
        # replicated — kernels/logsumexp_pallas.py) so it runs sharded,
        # no fallback
        evaluate.main([
            "--load", str(tmp_path / "r"), "--ll", "--iw-samples", "2",
            "--logsumexp", "pallas", "--num-data-shards", "2",
        ])
        outp = capsys.readouterr().out
        assert "falling back" not in outp
        assert "IW log-likelihood" in outp

        # a run "trained on a pod" (stored num_data_shards exceeding this
        # host's devices) must still evaluate: the mesh is clamped with a
        # note, metrics unchanged (eval is batching-invariant)
        import json

        cfg_path = tmp_path / "r" / "config.json"
        stored = json.loads(cfg_path.read_text())
        stored["num_data_shards"] = 64
        cfg_path.write_text(json.dumps(stored))
        evaluate.main(["--load", str(tmp_path / "r")])
        out3 = capsys.readouterr().out
        assert "only 8 device(s) here" in out3
        assert [l for l in out3.splitlines() if "test elbo" in l] == elbo_line

        # pod clamp keeps the stored train batch divisible (config
        # validation fires at construction): 64 shards, batch 12, 8
        # devices -> largest divisor of 12 that is <= 8 is 6
        stored["num_data_shards"] = 64
        stored["batch_size"] = 12
        cfg_path.write_text(json.dumps(stored))
        evaluate.main(["--load", str(tmp_path / "r")])
        out3b = capsys.readouterr().out
        assert "evaluating data-parallel over 6" in out3b
        assert [l for l in out3b.splitlines() if "test elbo" in l] == elbo_line
        stored["batch_size"] = 16

        # explicit --num-data-shards override on a spatially-sharded pod
        # run: the stored spatial axis must be dropped rather than crash
        # in make_mesh (the clamp note itself steers users to this flag)
        stored["num_data_shards"] = 8
        stored["spatial_shards"] = 2
        cfg_path.write_text(json.dumps(stored))
        evaluate.main(["--load", str(tmp_path / "r"), "--num-data-shards", "8"])
        out4 = capsys.readouterr().out
        assert "evaluating with spatial_shards=1" in out4
        assert [l for l in out4.splitlines() if "test elbo" in l] == elbo_line


class TestIWLLPallasImpl:
    def test_pallas_impl_matches_streaming(self):
        exp = tiny_exp()
        state = exp.init_state()
        idx = jnp.arange(16)
        batch = exp.test_data.gather(idx)
        key = jax.random.key(5)
        a = jax.jit(make_iwll_step(exp.model, exp.loss_cfg, 8, "streaming"))(
            state, batch, idx, key
        )
        b = jax.jit(make_iwll_step(exp.model, exp.loss_cfg, 8, "pallas"))(
            state, batch, idx, key
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
