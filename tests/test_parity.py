"""Offline parity harness: lvae_tpu vs a torch mirror (VERDICT r1 item 2).

The reference is torch; with its mount empty and no network, parity with
``tests/torch_mirror.py`` (built from SURVEY.md §2.1 and weight-ported via
docs/CHECKPOINT_FORMAT.md) is the strongest available evidence that a
0.01-bpd-parity run would succeed:

- test (i): same weights + same input + same latents -> same per-sample
  log-likelihood and per-layer KL (whole-model forward, all features on:
  stochastic skip, gates, learned top prior, batchnorm, strided AND
  transposed resampling convs).
- test (ii): N-step training-trajectory agreement, torch.optim.Adamax vs
  optax.adamax (dropout off, z = mu so both sides are deterministic).
- test (iii): BatchNorm running-stats parity (torch tracks the unbiased
  batch var; flax the biased one — reconciled by the n/(n-1) factor,
  negligible at real batch sizes: n = B*H*W ~ 1e4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax
from flax.core import freeze, unfreeze

from lvae_tpu.models.lvae import LadderVAE
from lvae_tpu.ops.math import crop_img_tensor, pad_img_tensor
from tests.torch_mirror import (
    LadderVAET,
    port_params_to_torch,
    torch_params_as_flax,
)

# One config exercising every module the flagship uses: 2 stochastic
# layers, initial downscale + per-layer downsampling (strided convs on the
# way up, transposed convs on the way down), gates, stochastic skip,
# learned top prior, batchnorm, residual merges.
CFG = dict(
    z_dims=(3, 3), blocks_per_layer=1, n_filters=8,
    stochastic_skip=True, gated=True, downsample=(1, 1),
    learn_top_prior=True, img_size=(16, 16), data_size=(14, 14),
    batchnorm=True, dropout_rate=0.0,
)

# The whole battery runs under ALL FOUR architecture-convention combos
# (VERDICT round 2 #1 + round 3 next #4): flax SAME padding vs the
# reference reconstruction's symmetric torch padding=k//2, crossed with
# pre- vs post-upsample skip merge. Whichever pair the mounted reference
# turns out to use, matching it is a config flip already under test.
CONVENTIONS = [
    pytest.param(
        dict(conv_pad="same", skip_merge_mode="pre"), id="same-pre"
    ),
    pytest.param(
        dict(conv_pad="torch", skip_merge_mode="post"), id="torch-post"
    ),
    pytest.param(
        dict(conv_pad="same", skip_merge_mode="post"), id="same-post"
    ),
    pytest.param(
        dict(conv_pad="torch", skip_merge_mode="pre"), id="torch-pre"
    ),
]

# Likelihood heads with an end-to-end torch mirror (VERDICT r3 next #4:
# configs 3-5's heads get whole-model parity, not just op-level oracles).
# bernoulli = config 1/2 class (binary MNIST); discretized_logistic /
# mixture = config 3 / 4-5 class (CIFAR-10 / CelebA, RGB).
LIKELIHOODS = ["bernoulli", "discretized_logistic", "discretized_logistic_mix"]


def make_pair(seed=0, likelihood="bernoulli", **conv):
    color_ch = 1 if likelihood == "bernoulli" else 3
    rng = np.random.default_rng(seed)
    if likelihood == "bernoulli":
        x_np = (rng.uniform(size=(4, 14, 14, color_ch)) < 0.4).astype(
            np.float32
        )
    else:
        # dequantized bin centers in [0,1] incl. exact 0/1 edge pixels,
        # like real 256-level pixels reaching the logistic heads
        x_np = (
            np.round(rng.uniform(size=(4, 14, 14, color_ch)) * 255.0) / 255.0
        ).astype(np.float32)
        x_np[0, 0, 0] = 0.0
        x_np[1, 1, 1] = 1.0
    model = LadderVAE(likelihood=likelihood, color_ch=color_ch, **CFG, **conv)
    x = jnp.asarray(x_np)
    variables = model.init(
        {"params": jax.random.key(seed), "sample": jax.random.key(1)},
        x, train=True,
    )
    tmodel = LadderVAET(
        likelihood=likelihood, color_ch=color_ch, **CFG, **conv
    )
    port_params_to_torch(
        variables["params"], variables.get("batch_stats", {}), tmodel
    )
    return model, variables, tmodel, x


def fwd_forced(m, x, forced, train):
    """LadderVAE.__call__ with per-layer forced latents (same math,
    deterministic z) — mirrors lvae.py:358-385."""
    x_pad = pad_img_tensor(x, m.img_size)
    bu = m.bottomup_pass(x_pad, train=train)
    td, info = m.topdown_pass(bu, train=train, forced_latent=forced)
    td = crop_img_tensor(td, m.data_size)
    ll, _ = m.likelihood_head(td, x)
    return {
        "ll": jnp.sum(ll, axis=(1, 2, 3)),
        "kl_sep": jnp.stack(
            [jnp.sum(k, axis=(1, 2, 3)) for k in info["kl_elementwise"]]
        ),
    }


def latent_shapes(model, variables, x):
    out = model.apply(
        variables, x, train=False, rngs={"sample": jax.random.key(0)}
    )
    return [z.shape for z in out["z"]]


class TestForwardParity:
    @pytest.mark.parametrize("likelihood", LIKELIHOODS)
    @pytest.mark.parametrize("conv", CONVENTIONS)
    def test_elbo_same_weights_same_latents(self, conv, likelihood):
        """(i) whole-model ll / per-layer KL agree to fp32 accumulation,
        for every mirrored head x every convention combo."""
        model, variables, tmodel, x = make_pair(likelihood=likelihood, **conv)
        shapes = latent_shapes(model, variables, x)
        rng = np.random.default_rng(7)
        forced = [rng.normal(size=s).astype(np.float32) * 0.5 for s in shapes]

        out_j = model.apply(
            variables, x, [jnp.asarray(z) for z in forced], False,
            method=fwd_forced,
        )

        tmodel.eval()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        zt = [torch.from_numpy(z).permute(0, 3, 1, 2) for z in forced]
        with torch.no_grad():
            out_t = tmodel(xt, forced_z=zt)

        np.testing.assert_allclose(
            np.asarray(out_j["ll"]), out_t["ll"].numpy(), rtol=3e-6, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_j["kl_sep"]), out_t["kl_sep"].numpy(),
            rtol=0, atol=2e-3,
        )
        # and the numbers are non-trivial (catches a dead-path mirror)
        assert np.abs(np.asarray(out_j["ll"])).max() > 1.0
        assert np.asarray(out_j["kl_sep"]).max() > 1e-3

    @pytest.mark.parametrize("likelihood", LIKELIHOODS)
    @pytest.mark.parametrize("conv", CONVENTIONS)
    def test_elbo_mode_latents_train_stats(self, conv, likelihood):
        """(i) again with z = mu and train-mode batch statistics."""
        model, variables, tmodel, x = make_pair(
            seed=3, likelihood=likelihood, **conv
        )
        out_j, _ = model.apply(
            variables, x, True, method=_mode_forward,
            mutable=["batch_stats"], rngs={"sample": jax.random.key(0)},
        )

        tmodel.train()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        with torch.no_grad():
            out_t = tmodel(xt)  # eps None -> z = mu
        np.testing.assert_allclose(
            np.asarray(out_j["ll"]), out_t["ll"].numpy(), rtol=3e-6, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_j["kl_sep"]), out_t["kl_sep"].numpy(),
            rtol=0, atol=2e-3,
        )


def _mode_forward(m, x, train):
    x_pad = pad_img_tensor(x, m.img_size)
    bu = m.bottomup_pass(x_pad, train=train)
    td, info = m.topdown_pass(
        bu, train=train, mode_layers=tuple(range(m.n_layers))
    )
    td = crop_img_tensor(td, m.data_size)
    ll, _ = m.likelihood_head(td, x)
    return {
        "ll": jnp.sum(ll, axis=(1, 2, 3)),
        "kl_sep": jnp.stack(
            [jnp.sum(k, axis=(1, 2, 3)) for k in info["kl_elementwise"]]
        ),
    }


class TestTrajectoryParity:
    """Runs in float64 on BOTH sides. In fp32 the comparison is vacuous:
    Adamax's update is mu_hat / max(|g|+eps, b2*nu), so params whose
    gradients are near roundoff (~5e-6 leaf-max discrepancy vs torch,
    measured) get O(lr) updates whose *direction* flips on that roundoff —
    8 steps of fp32 drift ~5e-3 says nothing about optimizer semantics.
    In f64 the same comparison certifies optax.adamax == torch.optim.Adamax
    (incl. the eps-inside-max placement and bias correction) to ~1e-9."""

    N_STEPS = 8
    LR = 3e-3  # large-ish lr so divergence, if any, is visible in 8 steps

    def _jax_trajectory(self, model, params, bs, xs):
        tx = optax.adamax(self.LR, b1=0.9, b2=0.999, eps=1e-8)
        opt = tx.init(params)

        def loss_fn(p, bs, x):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"], rngs={"sample": jax.random.key(0)},
                method=_mode_forward,
            )
            # the train loss with free_bits=0, beta=1 (state.py:130-132)
            loss = -(out["ll"].mean() - out["kl_sep"].sum(axis=0).mean())
            return loss, mut["batch_stats"]

        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        losses = []
        for x in xs:
            (loss, bs), grads = step(params, bs, x)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        return params, bs, losses

    def _torch_trajectory(self, tmodel, xs):
        tmodel.train()
        opt = torch.optim.Adamax(
            tmodel.parameters(), lr=self.LR, betas=(0.9, 0.999), eps=1e-8
        )
        losses = []
        for x in xs:
            xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
            out = tmodel(xt)
            loss = -(out["ll"].mean() - out["kl_sep"].sum(dim=0).mean())
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        return losses

    # all four convention combos for the flagship (bernoulli) head, plus
    # the config-3-class (discretized_logistic) and config-4/5-class
    # (mixture) heads on one convention each (VERDICT r3 next #4b)
    TRAJ_CASES = [
        pytest.param(dict(conv_pad="same", skip_merge_mode="pre"),
                     "bernoulli", id="same-pre-bernoulli"),
        pytest.param(dict(conv_pad="torch", skip_merge_mode="post"),
                     "bernoulli", id="torch-post-bernoulli"),
        pytest.param(dict(conv_pad="same", skip_merge_mode="post"),
                     "bernoulli", id="same-post-bernoulli"),
        pytest.param(dict(conv_pad="torch", skip_merge_mode="pre"),
                     "bernoulli", id="torch-pre-bernoulli"),
        pytest.param(dict(conv_pad="same", skip_merge_mode="pre"),
                     "discretized_logistic", id="same-pre-dlogistic"),
        pytest.param(dict(conv_pad="torch", skip_merge_mode="post"),
                     "discretized_logistic_mix", id="torch-post-mix"),
    ]

    @pytest.mark.slow
    @pytest.mark.parametrize("conv,likelihood", TRAJ_CASES)
    def test_adamax_trajectory(self, conv, likelihood):
        """(ii) 8 Adamax steps land on the same parameters (f64)."""
        model, variables, tmodel, _ = make_pair(
            seed=11, likelihood=likelihood, **conv
        )
        rng = np.random.default_rng(5)
        c = 1 if likelihood == "bernoulli" else 3
        if likelihood == "bernoulli":
            xs_np = [
                (rng.uniform(size=(4, 14, 14, c)) < 0.4).astype(np.float64)
                for _ in range(self.N_STEPS)
            ]
        else:
            xs_np = [
                np.round(rng.uniform(size=(4, 14, 14, c)) * 255.0) / 255.0
                for _ in range(self.N_STEPS)
            ]
        tmodel = tmodel.double()

        with jax.enable_x64():
            to64 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
            )
            params_j, bs_j, losses_j = self._jax_trajectory(
                model, to64(variables["params"]),
                to64(variables.get("batch_stats", {})),
                [jnp.asarray(x) for x in xs_np],
            )
            losses_t = self._torch_trajectory(tmodel, xs_np)

            # per-step losses track each other (measured agreement ~3e-9
            # relative; anything 1e-6+ would mean a semantic mismatch)
            np.testing.assert_allclose(losses_j, losses_t, rtol=1e-7, atol=0)
            # ... and the final parameter trees agree leaf-by-leaf
            params_t = torch_params_as_flax(tmodel, params_j)
            flat_j = jax.tree_util.tree_leaves_with_path(unfreeze(params_j))
            flat_t = dict(jax.tree_util.tree_leaves_with_path(params_t))
            assert len(flat_j) == len(flat_t)
            for path, leaf in flat_j:
                np.testing.assert_allclose(
                    np.asarray(leaf), flat_t[path], rtol=0, atol=1e-6,
                    err_msg=f"diverged at {jax.tree_util.keystr(path)}",
                )
        # the trajectory moved (catches a zero-grad trivial pass)
        init_flat = dict(
            jax.tree_util.tree_leaves_with_path(unfreeze(variables["params"]))
        )
        moved = max(
            float(np.abs(np.asarray(leaf) - init_flat[path]).max())
            for path, leaf in flat_j
        )
        assert moved > 1e-4

        # (iii) batchnorm running stats after the trajectory: means match;
        # torch's running_var tracks the UNBIASED batch var (factor n/(n-1))
        from flax.traverse_util import flatten_dict
        from tests.torch_mirror import _resolve

        for path, val in flatten_dict(unfreeze(bs_j)).items():
            mod = _resolve(tmodel, path[:-1])
            if path[-1] == "mean":
                np.testing.assert_allclose(
                    np.asarray(val), mod.running_mean.detach().numpy(),
                    rtol=0, atol=1e-4,
                    err_msg=f"running mean diverged at {'/'.join(path)}",
                )
            else:
                # biased (flax) vs unbiased (torch) running var: they agree
                # only up to interleaved n/(n-1) factors across the history;
                # assert closeness at the loose tolerance that bound implies
                # for n = B*H*W >= 4*2*2 = 16 here: |1 - n/(n-1)| ~ 6.7%.
                np.testing.assert_allclose(
                    np.asarray(val), mod.running_var.detach().numpy(),
                    rtol=0.08, atol=1e-5,
                    err_msg=f"running var diverged at {'/'.join(path)}",
                )


class TestBatchNormStatsParity:
    def test_single_update_biased_vs_unbiased(self):
        """(iii) one BN update from identical inputs: flax mean == torch
        mean exactly; flax var * n/(n-1) == torch var exactly."""
        from flax import linen as nn

        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, 6, 6, 5)).astype(np.float32) * 2.0 + 0.3
        m = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        v = m.init(jax.random.key(0), jnp.asarray(x))
        y, mut = m.apply(v, jnp.asarray(x), mutable=["batch_stats"])

        bt = torch.nn.BatchNorm2d(5, eps=1e-5, momentum=0.1)
        bt.train()
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = bt(xt)

        # normalized outputs agree (both use the biased var in-forward)
        np.testing.assert_allclose(
            np.asarray(y), yt.detach().permute(0, 2, 3, 1).numpy(),
            rtol=0, atol=1e-5,
        )
        n = x.shape[0] * x.shape[1] * x.shape[2]
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            bt.running_mean.detach().numpy(), rtol=0, atol=1e-6,
        )
        # new_var = 0.9 * init(=1) + 0.1 * batch_var, where torch's
        # batch_var is unbiased = biased * n/(n-1). Strip the shared decay
        # term and the estimators must coincide exactly:
        flax_batch_term = np.asarray(mut["batch_stats"]["var"]) - 0.9
        torch_batch_term = bt.running_var.detach().numpy() - 0.9
        np.testing.assert_allclose(
            flax_batch_term * n / (n - 1), torch_batch_term,
            rtol=1e-5, atol=1e-6,
        )


class TestTorchCheckpointConvert:
    """lvae_tpu.train.convert + tools/convert_torch_checkpoint: importing a
    reference-style torch state_dict into a restorable run dir."""

    @pytest.mark.parametrize("conv", CONVENTIONS)
    def test_state_dict_roundtrip_exact(self, conv):
        """flax init -> port to mirror -> state_dict -> convert back ==
        original trees, bit-exact (pure layout transposes)."""
        from flax.traverse_util import flatten_dict
        from lvae_tpu.train.convert import torch_state_dict_to_flax

        model, variables, tmodel, x = make_pair(**conv)
        params, bstats = torch_state_dict_to_flax(
            variables["params"], variables.get("batch_stats", {}),
            tmodel.state_dict(),
        )
        for (po, vo), (pc, vc) in zip(
            sorted(flatten_dict(unfreeze(variables["params"])).items()),
            sorted(flatten_dict(params).items()),
        ):
            assert po == pc
            np.testing.assert_array_equal(
                np.asarray(vo), vc, err_msg="/".join(po)
            )
        for (po, vo), (pc, vc) in zip(
            sorted(flatten_dict(unfreeze(variables["batch_stats"])).items()),
            sorted(flatten_dict(bstats).items()),
        ):
            np.testing.assert_array_equal(np.asarray(vo), vc)

    def test_strict_mode_rejects_missing_and_extra(self):
        from lvae_tpu.train.convert import torch_state_dict_to_flax

        model, variables, tmodel, x = make_pair()
        sd = dict(tmodel.state_dict())
        (k, v), = [next(iter(sd.items()))]
        missing = {kk: vv for kk, vv in sd.items() if kk != k}
        with pytest.raises(KeyError, match="missing"):
            torch_state_dict_to_flax(
                variables["params"], variables.get("batch_stats", {}), missing
            )
        extra = dict(sd)
        extra["not.a.real.weight"] = v
        with pytest.raises(KeyError, match="unconverted"):
            torch_state_dict_to_flax(
                variables["params"], variables.get("batch_stats", {}), extra
            )
        # non-strict: both tolerated
        torch_state_dict_to_flax(
            variables["params"], variables.get("batch_stats", {}), extra,
            strict=False,
        )

    def test_convert_cli_produces_restorable_run(self, tmp_path):
        """End-to-end: torch.save a mirror state_dict, run the converter
        CLI, restore with CheckpointManager, weights match the mirror."""
        import importlib.util
        import os

        from flax.traverse_util import flatten_dict
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.data.registry import stub_bundle
        from lvae_tpu.train import CheckpointManager, Experiment
        from tests.torch_mirror import torch_params_as_flax

        kw = dict(
            color_ch=1, z_dims=(4, 4), blocks_per_layer=1, n_filters=8,
            downsample=(1, 1), img_size=(32, 32), data_size=(28, 28),
            dropout_rate=0.0,
        )
        tmodel = LadderVAET(**kw)
        with torch.no_grad():
            for p in tmodel.parameters():
                p.normal_(0.0, 0.05)
        sd_path = tmp_path / "ref_model.pt"
        torch.save(tmodel.state_dict(), sd_path)

        spec = importlib.util.spec_from_file_location(
            "convert_tool",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "convert_torch_checkpoint.py"),
        )
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)
        run_dir = tmp_path / "converted"
        tool.main([
            "--state-dict", str(sd_path), "--run-dir", str(run_dir), "--",
            "--dataset", "synthetic", "--zdims", "4", "4",
            "--downsample", "1", "1", "--blocks-per-layer", "1",
            "--n-filters", "8", "--dropout", "0.0",
        ])

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, dropout=0.0, dry_run=True,
        )
        exp = Experiment(cfg, bundle=stub_bundle("synthetic"))
        restored = CheckpointManager(str(run_dir)).restore(exp.init_state())
        want = torch_params_as_flax(tmodel, restored.params)
        for path, val in flatten_dict(unfreeze(restored.params)).items():
            np.testing.assert_allclose(
                np.asarray(val), flatten_dict(want)[path], rtol=0, atol=0,
                err_msg="/".join(path),
            )


class TestTorchCheckpointExport:
    """lvae_tpu.train.convert.flax_to_torch_state_dict +
    tools/export_torch_checkpoint: the reverse direction — a TPU-trained
    run exported as a reference-style torch state_dict (train here,
    evaluate/fine-tune with the reference implementation)."""

    @pytest.mark.parametrize("conv", CONVENTIONS)
    def test_import_of_export_is_bit_exact(self, conv):
        """export -> import recovers the original trees exactly (every
        layout transform is a bijection), and the exported dict carries
        the num_batches_tracked buffers torch's strict load requires."""
        from flax.traverse_util import flatten_dict
        from lvae_tpu.train.convert import (
            flax_to_torch_state_dict,
            torch_state_dict_to_flax,
        )

        model, variables, tmodel, x = make_pair(**conv)
        sd = flax_to_torch_state_dict(
            variables["params"], variables.get("batch_stats", {})
        )
        n_bn = sum(1 for k in sd if k.endswith("num_batches_tracked"))
        n_mean = sum(1 for k in sd if k.endswith("running_mean"))
        assert n_bn == n_mean > 0
        params, bstats = torch_state_dict_to_flax(
            variables["params"], variables.get("batch_stats", {}), sd
        )
        for path, vo in flatten_dict(unfreeze(variables["params"])).items():
            np.testing.assert_array_equal(
                np.asarray(vo), flatten_dict(params)[path],
                err_msg="/".join(path),
            )
        for path, vo in flatten_dict(
            unfreeze(variables["batch_stats"])
        ).items():
            np.testing.assert_array_equal(
                np.asarray(vo), flatten_dict(bstats)[path]
            )

    @pytest.mark.parametrize("likelihood", LIKELIHOODS)
    def test_strict_load_into_mirror_forward_parity(self, likelihood):
        """The export satisfies torch's STRICT load_state_dict on a fresh
        mirror (key set and shapes are reference-complete), and the loaded
        mirror reproduces the flax forward ELBO."""
        from lvae_tpu.train.convert import flax_to_torch_state_dict

        conv = dict(conv_pad="torch", skip_merge_mode="post")
        color_ch = 1 if likelihood == "bernoulli" else 3
        model, variables, _, x = make_pair(likelihood=likelihood, **conv)
        sd = flax_to_torch_state_dict(
            variables["params"], variables.get("batch_stats", {})
        )

        fresh = LadderVAET(
            likelihood=likelihood, color_ch=color_ch, **CFG, **conv
        )
        fresh.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
            strict=True,
        )

        shapes = latent_shapes(model, variables, x)
        rng = np.random.default_rng(11)
        forced = [rng.normal(size=s).astype(np.float32) * 0.5 for s in shapes]
        out_j = model.apply(
            variables, x, [jnp.asarray(z) for z in forced], False,
            method=fwd_forced,
        )
        fresh.eval()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        zt = [torch.from_numpy(z).permute(0, 3, 1, 2) for z in forced]
        with torch.no_grad():
            out_t = fresh(xt, forced_z=zt)
        np.testing.assert_allclose(
            np.asarray(out_j["ll"]), out_t["ll"].numpy(), rtol=3e-6, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out_j["kl_sep"]), out_t["kl_sep"].numpy(),
            rtol=0, atol=2e-3,
        )

    def test_export_cli_roundtrip(self, tmp_path):
        """End-to-end: save a checkpoint, run the exporter CLI, torch.load
        the artifact, import it back — weights match the saved state."""
        import importlib.util
        import os

        from flax.traverse_util import flatten_dict
        from lvae_tpu.config import ExperimentConfig
        from lvae_tpu.data.registry import stub_bundle
        from lvae_tpu.train import CheckpointManager, Experiment
        from lvae_tpu.train.checkpoint import save_config
        from lvae_tpu.train.convert import torch_state_dict_to_flax

        cfg = ExperimentConfig(
            dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
            blocks_per_layer=1, n_filters=8, dropout=0.0, dry_run=True,
        )
        exp = Experiment(cfg, bundle=stub_bundle("synthetic"))
        state = exp.init_state()
        run_dir = tmp_path / "run"
        save_config(str(run_dir), cfg)
        CheckpointManager(str(run_dir)).save(state, wait=True)

        spec = importlib.util.spec_from_file_location(
            "export_tool",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "export_torch_checkpoint.py"),
        )
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)
        out = tmp_path / "ref_model.pt"
        # --platform '' : conftest already pinned the backend
        tool.main(["--load", str(run_dir), "--out", str(out),
                   "--platform", ""])

        sd = torch.load(out, weights_only=True)
        params, bstats = torch_state_dict_to_flax(
            state.params, state.batch_stats, sd
        )
        for path, vo in flatten_dict(unfreeze(state.params)).items():
            np.testing.assert_array_equal(
                np.asarray(vo), flatten_dict(params)[path],
                err_msg="/".join(path),
            )
        for path, vo in flatten_dict(unfreeze(state.batch_stats)).items():
            np.testing.assert_array_equal(
                np.asarray(vo), flatten_dict(bstats)[path]
            )


class TestDataDepInitParity:
    """VERDICT r3 next #4c: the data-dependent init's NUMERICS — the
    sequential Salimans-Kingma rescale of train/init.py (boilr's
    --data-dep-init scheme) — agree with a torch implementation of the
    same scheme to f64 precision. Both sides run a deterministic forward
    (z = mu, dropout off) so the comparison certifies the rescale math
    (per-out-channel biased std, [1/max_gain, max_gain] clip + eps, bias
    shift, execution order, head exclusions), not RNG streams."""

    @pytest.mark.slow
    def test_post_init_params_match(self):
        from flax.traverse_util import flatten_dict
        from lvae_tpu.train.init import (
            _EXCLUDED_CONVS,
            _is_conv,
            data_dependent_init,
        )
        from tests.torch_mirror import data_dependent_init_torch

        conv = dict(conv_pad="same", skip_merge_mode="pre")

        class ModeLVAE(LadderVAE):
            def __call__(self, x, train=True):  # deterministic forward
                return _mode_forward(self, x, train)

        rng = np.random.default_rng(23)
        x_np = (rng.uniform(size=(8, 14, 14, 1)) < 0.4).astype(np.float64)

        # init params via the standard battery path (f32), then upcast
        # BOTH sides from the same f32 values (exact), like
        # TestTrajectoryParity
        _, variables, tmodel, _ = make_pair(seed=21, **conv)
        model = ModeLVAE(likelihood="bernoulli", color_ch=1, **CFG, **conv)
        tmodel = tmodel.double()
        xt = torch.from_numpy(np.ascontiguousarray(x_np.transpose(0, 3, 1, 2)))

        with jax.enable_x64():
            to64 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), t
            )
            vs64 = {"params": to64(unfreeze(variables["params"]))}
            bs = variables.get("batch_stats", {})
            if bs:
                vs64["batch_stats"] = to64(unfreeze(bs))
            x64 = jnp.asarray(x_np)

            new_vars = data_dependent_init(
                model, vs64, x64, rngs={"sample": jax.random.key(0)}
            )

            # the conv execution order, derived exactly as init.py does
            _, mut0 = model.apply(
                vs64, x64, train=True,
                mutable=["intermediates", "batch_stats"],
                rngs={"sample": jax.random.key(0)},
                capture_intermediates=_is_conv,
            )
            conv_paths = [
                p[:-1]
                for p in flatten_dict(mut0["intermediates"]).keys()
                if not any(comp in _EXCLUDED_CONVS for comp in p)
            ]
            assert len(conv_paths) > 10  # the scheme actually walked convs

            data_dependent_init_torch(tmodel, conv_paths, xt)

            params_t = torch_params_as_flax(tmodel, new_vars["params"])
            flat_j = jax.tree_util.tree_leaves_with_path(
                unfreeze(new_vars["params"])
            )
            flat_t = dict(jax.tree_util.tree_leaves_with_path(params_t))
            assert len(flat_j) == len(flat_t)
            moved = 0.0
            init_flat = dict(
                jax.tree_util.tree_leaves_with_path(
                    to64(unfreeze(variables["params"]))
                )
            )
            for path, leaf in flat_j:
                np.testing.assert_allclose(
                    np.asarray(leaf), flat_t[path], rtol=1e-5, atol=1e-8,
                    err_msg=f"init diverged at {jax.tree_util.keystr(path)}",
                )
                moved = max(
                    moved,
                    float(np.abs(np.asarray(leaf) - np.asarray(init_flat[path])).max()),
                )
            # the init actually rescaled something (catches a no-op pass)
            assert moved > 1e-3

            # excluded heads kept their intentional near-zero init exactly
            for path, leaf in flat_j:
                names = [getattr(p, "key", "") for p in path]
                if any(n in _EXCLUDED_CONVS for n in names):
                    np.testing.assert_array_equal(
                        np.asarray(leaf), np.asarray(init_flat[path]),
                        err_msg=f"excluded head rescaled at {names}",
                    )


class TestLongHorizonDrift:
    """Long-horizon trajectory drift vs the torch mirror (VERDICT r4 #1).

    The short-horizon tests above prove step-level semantic equality; this
    one bounds the *accumulated* quality gap over a real training horizon.
    tests/drift_harness.py runs the SAME stochastic trajectory (shared
    data stream + shared per-(step, layer) eps draws, warmup-beta +
    free-bits + BN active, Adamax) through lvae_tpu and the torch mirror
    in fp32 and compares the terminal shared-eps test ELBO in bpd.

    Reduced width (16 filters, z 8-8-8) but full flagship depth and
    semantics; the flagship-scale 500-step record (z 32-32-32, 64
    filters, both convention combos) lives in RESULTS.md round 5 via
    tools/parity_drift.py. The assert is 1e-3 bpd — an order of
    magnitude under the 0.01-bpd north star (BASELINE.json; SURVEY §6)
    and ~50x the float32 eval noise floor, so it fails on any semantic
    regression while tolerating conv-roundoff chaos.
    """

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "conv", CONVENTIONS[:2]  # same-pre + torch-post, the two candidate
    )                            # reference conventions (docs/MIGRATION.md)
    def test_200_step_drift_bounded(self, conv):
        from tests.drift_harness import run_drift

        r = run_drift(
            steps=200, batch=16, zdims=(8, 8, 8), n_filters=16,
            blocks_per_layer=2, conv_pad=conv["conv_pad"],
            skip_merge=conv["skip_merge_mode"], free_bits=0.5,
            beta_anneal=100, n_train=512, n_eval=64, eval_eps=2,
            eval_every=100,
        )
        # every checkpoint along the way, not just the terminal one
        for row in r["history"]:
            assert row["drift_bpd"] < 1e-3, (row, r["config"])
        assert r["drift_bpd"] < 1e-3, r
        # and the trajectory actually learned (guards against a harness
        # regression that freezes both sides at init and trivially passes):
        # this width reaches ~-530 by step 200 (measured both combos);
        # early training sits below -619 (step-10 probe) and init lower
        assert r["elbo_jax"] > -570
