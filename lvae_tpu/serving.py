"""Portable serving artifacts via ``jax.export`` (StableHLO).

The reference is a research codebase with no deployment story — serving a
trained run means importing the model class and restoring a checkpoint in
Python (reference evaluate.py, SURVEY.md §3.2). This framework targets
production TPU serving, where the model definition should not have to
exist in the serving process at all: ``export_run`` compiles a restored
run into self-contained StableHLO artifacts (weights baked in as
constants) that any JAX process — same machine, a TPU server, or a CPU
fallback host — can ``deserialize`` and ``.call(...)`` without lvae_tpu,
flax, or orbax installed.

Three surfaces per run:

- ``generate``: ``(seed int32[]) -> images [N, H, W, C] float32`` — the
  likelihood mean of ``sample_prior`` (reference SURVEY.md §3.3), with
  export-time ``n_images`` / ``temperature`` / mode- and constant-layer
  diagnostics baked in.
- ``reconstruct``: ``(x uint8 [B, H, W, C], seed int32[],
  index int32[B]) -> {out_mean, ll, kl, elbo, bpd}`` — eval-convention
  preprocessing (per-image keyed binarization / bin-center
  dequantization, the same mechanism as evaluate.py) and a per-image
  vmapped forward. Keying contract: image ``i``'s outputs are keyed by
  ``(seed, index[i])`` — the CALLER owns per-image identity. Pass the
  images' global dataset indices for exactly evaluate.py's keying
  (outputs then invariant to batching AND permutation: the same (image,
  index) pair gives the same binarization/latent draw anywhere in any
  batch), or ``arange(B)`` for pure position keying (prefix-append
  invariant only). The batch dimension is exported symbolically by
  default (one artifact serves any B >= 1).
- ``encode``: ``(x uint8 [B, H, W, C], seed int32[], index int32[B]) ->
  {mu, z}`` — the per-layer posterior latents (representation surface),
  same preprocessing/keying contract as ``reconstruct``.

Artifacts are exported with ``fused='none'``: Pallas kernels lower to
backend-specific custom calls that are neither portable across platforms
nor stable across compiler versions, while pure StableHLO is both (the
kernels are an opt-in training-throughput lever; serving latency is
dominated by the convs XLA owns anyway). Cross-platform export (e.g. a
single artifact callable on both ``tpu`` and ``cpu``) is supported via
``platforms=``.

PRNG note: artifacts use JAX's default threefry streams — identical on
every backend and JAX version, and matching evaluate.py's eval keying
(which never uses the training ``--rng-impl``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.export as jexport
import jax.numpy as jnp
import numpy as np

LN2 = float(np.log(2.0))


def make_generate_fn(
    model,
    variables: dict,
    n_images: int,
    *,
    temperature=1.0,
    mode_layers: Sequence[int] = (),
    constant_layers: Sequence[int] = (),
):
    """``generate(seed) -> [n_images, H, W, C]`` prior samples (out_mean)."""

    def generate(seed: jnp.ndarray) -> jnp.ndarray:
        out = model.apply(
            variables,
            n_images,
            method="sample_prior",
            mode_layers=tuple(mode_layers),
            constant_layers=tuple(constant_layers),
            temperature=temperature,
            rngs={"sample": jax.random.key(seed)},
        )
        return out["out_mean"].astype(jnp.float32)

    return generate


def make_reconstruct_fn(model, variables: dict, preprocess: str, data_dims: int):
    """``reconstruct(batch_u8, seed, index) -> dict`` with per-image
    outputs keyed by ``(seed, index[i])`` (module docstring "Keying
    contract"; mechanism shared with train.state.per_image_forward /
    data.device.eval_preprocess_batch). Pass global dataset indices for
    evaluate.py-identical, permutation-invariant keying; ``arange(B)``
    for position keying."""
    from lvae_tpu.data.device import eval_preprocess_batch

    def reconstruct(
        batch_u8: jnp.ndarray, seed: jnp.ndarray, index: jnp.ndarray
    ) -> dict:
        idx = index.astype(jnp.int32)
        x = eval_preprocess_batch(batch_u8, preprocess, idx)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(seed), i)
        )(idx)

        def one(x_i, k_i):
            out = model.apply(
                variables, x_i[None], train=False, rngs={"sample": k_i}
            )
            return (
                out["out_mean"][0].astype(jnp.float32),
                out["ll"][0],
                out["kl_sep"][:, 0].sum(),
            )

        out_mean, ll, kl = jax.vmap(one)(x, keys)
        elbo = ll - kl
        return {
            "out_mean": out_mean,
            "ll": ll,
            "kl": kl,
            "elbo": elbo,
            "bpd": -elbo / (data_dims * LN2),
        }

    return reconstruct


def make_encode_fn(model, variables: dict, preprocess: str):
    """``encode(batch_u8, seed, index) -> {mu, z}`` per-layer posterior
    latents, keyed per image by ``(seed, index[i])`` like ``reconstruct``.

    The representation surface: ``mu`` is the posterior mean per ladder
    layer (tuple of ``[B, H_i, W_i, z_i]``, indexed bottom-up — tuple
    index i matches ``kl/layer_i`` and ``--zdims`` order), ``z`` a
    reparameterized draw keyed like the eval path (per-image,
    batch-size invariant).

    Seed dependence follows the ladder's top-down inference (reference
    models/lvae.py topdown_pass — SURVEY.md §3.3): the TOP layer's
    ``mu`` (tuple index -1) is deterministic given the image (it is
    conditioned only on the bottom-up pass, plus any stochastic
    preprocessing), while lower layers' ``mu`` condition on the sampled
    ``z`` of the layers above and therefore vary with the seed. For a
    fully deterministic embedding use ``mu[-1]``, or the concatenation
    of ``mu`` under a fixed seed.
    """
    from lvae_tpu.data.device import eval_preprocess_batch
    from lvae_tpu.ops.stochastic import split_params

    def encode(
        batch_u8: jnp.ndarray, seed: jnp.ndarray, index: jnp.ndarray
    ) -> dict:
        idx = index.astype(jnp.int32)
        x = eval_preprocess_batch(batch_u8, preprocess, idx)
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(seed), i)
        )(idx)

        def one(x_i, k_i):
            out = model.apply(
                variables, x_i[None], train=False, rngs={"sample": k_i}
            )
            mu = tuple(
                split_params(q)[0][0].astype(jnp.float32)
                for q in out["q_params"]
            )
            z = tuple(z_i[0].astype(jnp.float32) for z_i in out["z"])
            return mu, z

        mu, z = jax.vmap(one)(x, keys)
        return {"mu": mu, "z": z}

    return encode


@dataclasses.dataclass
class ServingArtifacts:
    """Paths written by :func:`export_run` (+ the manifest dict)."""

    out_dir: str
    paths: dict
    manifest: dict


def _restore_for_export(run_dir: str, step: Optional[int]):
    """Restore a run the way evaluate.py does, but with the export-safe
    config overrides (pure XLA, single device — the artifact itself is
    what gets sharded/replicated at serving time)."""
    from lvae_tpu.config import config_from_dict
    from lvae_tpu.train import CheckpointManager, Experiment, load_config_dict

    cfg = config_from_dict(load_config_dict(run_dir))
    cfg.fused = "none"          # portable StableHLO only (module docstring)
    cfg.num_data_shards = 1
    cfg.spatial_shards = 1
    cfg.streaming = False
    exp = Experiment(cfg)
    state = CheckpointManager(run_dir, keep=cfg.keep_checkpoints).restore(
        exp.init_state(data_dep_init=False), step=step
    )
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return exp, state, variables


def export_run(
    run_dir: str,
    *,
    what: Sequence[str] = ("generate", "reconstruct", "encode"),
    step: Optional[int] = None,
    out_dir: Optional[str] = None,
    n_images: int = 64,
    temperature=1.0,
    mode_layers: Sequence[int] = (),
    constant_layers: Sequence[int] = (),
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> ServingArtifacts:
    """Export a saved run's serving surfaces to ``<run_dir>/serving/``.

    ``batch=None`` exports ``reconstruct`` with a symbolic batch dimension
    (one artifact, any B); an int pins it. ``platforms`` defaults to the
    current backend; pass e.g. ``("tpu", "cpu")`` for one artifact that
    runs on both.
    """
    exp, state, variables = _restore_for_export(run_dir, step)
    out_dir = out_dir or os.path.join(run_dir, "serving")
    os.makedirs(out_dir, exist_ok=True)
    h, w = exp.bundle.img_size
    c = exp.bundle.color_ch
    plats = tuple(platforms) if platforms else None

    paths: dict = {}
    manifest: dict = {
        "run_dir": os.path.abspath(run_dir),
        "step": int(state.step),
        "dataset": exp.cfg.dataset,
        "img_shape": [h, w, c],
        "preprocess": exp.loss_cfg.preprocess,
        "platforms": list(plats) if plats else [jax.default_backend()],
        "jax_version": jax.__version__,
        "surfaces": {},
    }

    if "generate" in what:
        fn = make_generate_fn(
            exp.model, variables, n_images,
            temperature=temperature, mode_layers=mode_layers,
            constant_layers=constant_layers,
        )
        exported = jexport.export(jax.jit(fn), platforms=plats)(
            jax.ShapeDtypeStruct((), jnp.int32)
        )
        p = os.path.join(out_dir, "generate.jaxexport")
        with open(p, "wb") as f:
            f.write(exported.serialize())
        paths["generate"] = p
        manifest["surfaces"]["generate"] = {
            "in": "seed int32[]",
            "out": f"float32[{n_images},{h},{w},{c}]",
            "n_images": n_images,
            "temperature": temperature
            if isinstance(temperature, (int, float))
            else list(temperature),
            "mode_layers": list(mode_layers),
            "constant_layers": list(constant_layers),
        }

    if "reconstruct" in what:
        fn = make_reconstruct_fn(
            exp.model, variables, exp.loss_cfg.preprocess,
            exp.loss_cfg.data_dims,
        )
        if batch is None:
            (bdim,) = jexport.symbolic_shape("b")
            shape: Tuple[Any, ...] = (bdim, h, w, c)
        else:
            shape = (batch, h, w, c)
        exported = jexport.export(jax.jit(fn), platforms=plats)(
            jax.ShapeDtypeStruct(shape, jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((shape[0],), jnp.int32),
        )
        p = os.path.join(out_dir, "reconstruct.jaxexport")
        with open(p, "wb") as f:
            f.write(exported.serialize())
        paths["reconstruct"] = p
        bname = "b" if batch is None else batch
        manifest["surfaces"]["reconstruct"] = {
            "in": f"x uint8[{bname},{h},{w},{c}], seed int32[], "
                  f"index int32[{bname}]",
            "out": "{out_mean float32[B,H,W,C], ll/kl/elbo/bpd float32[B]}",
            "batch": batch,
            "keying": "(seed, index[i]) per image: pass global dataset "
                      "indices for evaluate.py-identical permutation-"
                      "invariant keying, or arange(B) for position keying",
        }

    if "encode" in what:
        fn = make_encode_fn(exp.model, variables, exp.loss_cfg.preprocess)
        if batch is None:
            (bdim,) = jexport.symbolic_shape("b")
            eshape: Tuple[Any, ...] = (bdim, h, w, c)
        else:
            eshape = (batch, h, w, c)
        exported = jexport.export(jax.jit(fn), platforms=plats)(
            jax.ShapeDtypeStruct(eshape, jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct((eshape[0],), jnp.int32),
        )
        p = os.path.join(out_dir, "encode.jaxexport")
        with open(p, "wb") as f:
            f.write(exported.serialize())
        paths["encode"] = p
        bname = "b" if batch is None else batch
        manifest["surfaces"]["encode"] = {
            "in": f"x uint8[{bname},{h},{w},{c}], seed int32[], "
                  f"index int32[{bname}]",
            "out": "{mu, z}: tuples of float32[B,H_i,W_i,z_i], indexed "
                   "bottom-up (kl/layer_i numbering)",
            "batch": batch,
            "zdims": list(exp.cfg.zdims),
            "keying": "(seed, index[i]) per image: pass global dataset "
                      "indices for evaluate.py-identical permutation-"
                      "invariant keying, or arange(B) for position keying",
        }

    mp = os.path.join(out_dir, "manifest.json")
    with open(mp, "w") as f:
        json.dump(manifest, f, indent=2)
    paths["manifest"] = mp
    return ServingArtifacts(out_dir=out_dir, paths=paths, manifest=manifest)


def load_artifact(path: str) -> jexport.Exported:
    """Deserialize a ``.jaxexport`` artifact; invoke with ``.call(*args)``.

    This is the entire serving-side dependency surface: jax + the bytes.
    """
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
