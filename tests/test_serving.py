"""Serving-export tests: jax.export artifacts round-trip and stay
batch-size invariant (lvae_tpu/serving.py).

The reference has no serving path (SURVEY.md §3.2 — evaluation requires
the Python model + checkpoint); these tests pin this framework's
addition: a restored run exports to self-contained StableHLO artifacts
that reproduce the in-process computation exactly.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.serving import (
    export_run,
    load_artifact,
    make_generate_fn,
    make_reconstruct_fn,
)
from lvae_tpu.train import Experiment, Trainer


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """A real (tiny) trained run dir with config.json + checkpoint."""
    out = tmp_path_factory.mktemp("serving")
    cfg = ExperimentConfig(
        dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
        blocks_per_layer=1, n_filters=8, batch_size=16,
        test_batch_size=16, dropout=0.0, max_steps=4,
        log_interval=100, test_interval=1000, checkpoint_interval=2,
        seed=0, dry_run=False, output_dir=str(out), run_name="r",
    )
    Trainer(Experiment(cfg)).run()
    return str(out / "r")


class TestExportRoundtrip:
    def test_generate_matches_direct(self, tiny_run):
        arts = export_run(tiny_run, what=("generate",), n_images=3)
        assert os.path.exists(arts.paths["generate"])
        out = np.asarray(load_artifact(arts.paths["generate"]).call(np.int32(5)))
        assert out.shape[0] == 3 and out.dtype == np.float32
        # direct in-process call with the same restored variables
        from lvae_tpu.serving import _restore_for_export

        exp, _, variables = _restore_for_export(tiny_run, None)
        direct = np.asarray(
            jax.jit(make_generate_fn(exp.model, variables, 3))(jnp.int32(5))
        )
        np.testing.assert_allclose(out, direct, rtol=1e-6, atol=1e-6)

    def test_reconstruct_symbolic_batch_invariance(self, tiny_run, rng):
        arts = export_run(tiny_run, what=("reconstruct",))
        art = load_artifact(arts.paths["reconstruct"])
        h, w, c = arts.manifest["img_shape"]
        x3 = (rng.uniform(size=(3, h, w, c)) > 0.5).astype(np.uint8)
        x5 = np.concatenate(
            [x3, (rng.uniform(size=(2, h, w, c)) > 0.5).astype(np.uint8)]
        )
        o3 = art.call(x3, np.int32(0), np.arange(3, dtype=np.int32))
        o5 = art.call(x5, np.int32(0), np.arange(5, dtype=np.int32))
        # ONE artifact serves both batch sizes, and per-image outputs are
        # batch-composition invariant (the eval keying contract)
        for k in ("out_mean", "ll", "kl", "elbo", "bpd"):
            np.testing.assert_allclose(
                np.asarray(o3[k]), np.asarray(o5[k])[:3], rtol=1e-5, atol=1e-5,
                err_msg=k,
            )
        assert np.isfinite(np.asarray(o5["bpd"])).all()
        # permutation invariance: caller-supplied indices ARE the identity
        # (ADVICE r3 #1 — position keying was only prefix-append invariant)
        perm = np.array([4, 0, 2, 1, 3])
        op = art.call(
            x5[perm], np.int32(0), perm.astype(np.int32)
        )
        for k in ("ll", "kl", "elbo", "bpd"):
            np.testing.assert_allclose(
                np.asarray(op[k]), np.asarray(o5[k])[perm],
                rtol=1e-5, atol=1e-5, err_msg=f"permuted {k}",
            )
        # and the artifact reproduces the in-process function
        from lvae_tpu.serving import _restore_for_export

        exp, _, variables = _restore_for_export(tiny_run, None)
        fn = jax.jit(make_reconstruct_fn(
            exp.model, variables, exp.loss_cfg.preprocess,
            exp.loss_cfg.data_dims,
        ))
        direct = fn(jnp.asarray(x3), jnp.int32(0), jnp.arange(3, dtype=jnp.int32))
        np.testing.assert_allclose(
            np.asarray(o3["elbo"]), np.asarray(direct["elbo"]),
            rtol=1e-5, atol=1e-5,
        )

    def test_encode_surface(self, tiny_run, rng):
        arts = export_run(tiny_run, what=("encode",))
        art = load_artifact(arts.paths["encode"])
        h, w, c = arts.manifest["img_shape"]
        x = (rng.uniform(size=(2, h, w, c)) > 0.5).astype(np.uint8)
        idx = np.arange(2, dtype=np.int32)
        out = art.call(x, np.int32(3), idx)
        # two ladder layers, z=4 each; layer 0 = bottom (kl/layer_i order)
        assert len(out["mu"]) == 2 and len(out["z"]) == 2
        for mu, z in zip(out["mu"], out["z"]):
            assert mu.shape[0] == 2 and mu.shape[-1] == 4
            assert z.shape == mu.shape
            assert np.isfinite(np.asarray(mu)).all()
        # the TOP layer's mu is deterministic given the image (it sees only
        # the bottom-up pass; the synthetic dataset's 'none' preprocessing
        # is seed-free).  Lower layers condition on sampled z from above,
        # so their mu legitimately varies with the seed.
        out2 = art.call(x, np.int32(7), idx)
        np.testing.assert_allclose(
            np.asarray(out["mu"][-1]), np.asarray(out2["mu"][-1]),
            rtol=1e-6, atol=1e-6,
        )
        # z differs across seeds (reparameterized draw is keyed)
        assert not np.allclose(np.asarray(out["z"][0]), np.asarray(out2["z"][0]))

    def test_manifest(self, tiny_run):
        arts = export_run(tiny_run, what=("generate",), n_images=2)
        with open(arts.paths["manifest"]) as f:
            m = json.load(f)
        assert m["surfaces"]["generate"]["n_images"] == 2
        assert m["img_shape"] == [28, 28, 1]
        assert m["step"] == 4


class TestServingCLI:
    def test_cli_end_to_end(self, tiny_run, capsys):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "export_serving",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "export_serving.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main([
            "--load", tiny_run, "--nimages", "2", "--temperature", "0.7",
            "--check",
        ])
        out = capsys.readouterr().out
        assert "wrote generate" in out
        assert "wrote reconstruct" in out
        assert "check generate" in out and "finite=True" in out
        assert "check reconstruct" in out
