"""Importance-weighted log-likelihood evaluation (IWAE bound).

Replaces boilr's IW-LL test procedure (SURVEY.md §2.2, §3.2): for each
test batch, draw k posterior samples, compute per-sample ELBOs, and
estimate  log p(x) ~= logsumexp_k(elbo_k) - log k  (k=100 by default,
per BASELINE.json).

TPU-native shape: the k samples run under ``lax.scan`` so the 100x batch
expansion is never materialized (SURVEY.md §7 hard part 5) — HBM holds
one batch's activations regardless of k; the accumulator is a streaming
max/sum-exp pair (an online logsumexp), so the [k, B] elbo matrix is
never materialized either.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from lvae_tpu.data.device import eval_preprocess_batch
from lvae_tpu.train.state import LossConfig, TrainState, per_image_forward


def streaming_logsumexp_init(batch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(running max, running sum of exp(x - max)) accumulator."""
    return jnp.full((batch,), -jnp.inf), jnp.zeros((batch,))


def streaming_logsumexp_update(carry, x):
    m, s = carry
    new_m = jnp.maximum(m, x)
    # guard exp(-inf - -inf): where new_m == -inf both terms are 0
    safe = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
    s = s * jnp.exp(m - safe) + jnp.exp(x - safe)
    return (new_m, s)


def streaming_logsumexp_update_block(carry, x_block):
    """Merge a [c, B] block of values into the (max, sumexp) accumulator —
    one accumulator update per chunk instead of per sample. Exactly
    equivalent to c sequential scalar updates (same max/rescale algebra)."""
    m, s = carry
    new_m = jnp.maximum(m, x_block.max(axis=0))
    safe = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
    s = s * jnp.exp(m - safe) + jnp.exp(x_block - safe).sum(axis=0)
    return (new_m, s)


def streaming_logsumexp_final(carry) -> jnp.ndarray:
    m, s = carry
    return m + jnp.log(s)


def make_iwll_step(
    model, cfg: LossConfig, n_samples: int, logsumexp_impl: str = "streaming",
    chunk: int = 1,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], jnp.ndarray]:
    """Build a jit-able step: uint8 test batch -> per-sample IW-LL [B].

    ``logsumexp_impl``: 'streaming' (online accumulator inside the scan,
    O(B) memory — the default) or 'pallas' (stack the [k, B] elbo matrix
    and reduce it with the fused Pallas kernel — BASELINE.json's
    "log-sum-exp in Pallas"; at k=100 the matrix is small either way).

    ``chunk``: IW samples evaluated per scan iteration. chunk=1 is the
    strictly serial k-scan; chunk=c vmaps c samples through one forward
    (effective batch c*B) while holding c*B activations instead of B.
    Hardware verdict (tools/iwll_probe.py, RESULTS.md round 5): at
    B=1024 flagship the MXU is ALREADY fed — chunk=4 runs 2.0x SLOWER
    per forward and chunk=16 OOMs, so chunk=1 is the default everywhere;
    the knob remains for small-eval-batch setups where c*B is needed to
    fill the array. The ESTIMATE IS IDENTICAL for any chunk:
    sample j's key does not depend on the chunking (see below), and the
    accumulator algebra is associative (a non-multiple ``chunk`` pads the
    last iteration with masked -inf rows).

    Randomness is keyed per (image, sample): the latent draw for image i,
    IW sample j uses ``fold_in(fold_in(key, global_index_i), j)`` — both
    the binarization and the estimator are therefore invariant to
    ``--test-batch-size``, to how the sweep is chunked, and to ``chunk``."""
    chunk = max(1, min(chunk, n_samples))
    n_iters = -(-n_samples // chunk)

    def iwll_step(state: TrainState, batch_u8: jnp.ndarray,
                  idx: jnp.ndarray, key: jax.Array):
        x = eval_preprocess_batch(batch_u8, cfg.preprocess, idx)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        img_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)

        def elbo_of(j):
            keys_j = jax.vmap(lambda k_i: jax.random.fold_in(k_i, j))(img_keys)
            ll, kl_sep = per_image_forward(model, variables, x, keys_j)
            return ll - kl_sep.sum(axis=0)     # [B]

        def elbo_block(js_c):                  # [c] -> [c, B], pad rows -inf
            e = jax.vmap(elbo_of)(js_c)
            if n_iters * chunk != n_samples:
                e = jnp.where(js_c[:, None] < n_samples, e, -jnp.inf)
            return e

        if chunk == 1:
            js = jnp.arange(n_samples)
            if logsumexp_impl == "pallas":
                from lvae_tpu.kernels import pallas_logsumexp

                _, elbos = jax.lax.scan(lambda c, j: (c, elbo_of(j)), None, js)
                lse = pallas_logsumexp(elbos)
            else:
                def body(carry, j):
                    return streaming_logsumexp_update(carry, elbo_of(j)), None

                carry, _ = jax.lax.scan(
                    body, streaming_logsumexp_init(x.shape[0]), js
                )
                lse = streaming_logsumexp_final(carry)
        else:
            js = jnp.arange(n_iters * chunk).reshape(n_iters, chunk)
            if logsumexp_impl == "pallas":
                from lvae_tpu.kernels import pallas_logsumexp

                _, blocks = jax.lax.scan(
                    lambda c, jr: (c, elbo_block(jr)), None, js
                )                                    # [n_iters, c, B]
                elbos = blocks.reshape(n_iters * chunk, -1)[:n_samples]
                lse = pallas_logsumexp(elbos)
            else:
                def body(carry, jr):
                    return (
                        streaming_logsumexp_update_block(carry, elbo_block(jr)),
                        None,
                    )

                carry, _ = jax.lax.scan(
                    body, streaming_logsumexp_init(x.shape[0]), js
                )
                lse = streaming_logsumexp_final(carry)
        return lse - jnp.log(float(n_samples))

    return iwll_step


def evaluate_iwll(
    experiment,
    state: TrainState,
    n_samples: int = 100,
    batch_size: int | None = None,
    max_batches: int | None = None,
    seed: int = 0,
    logsumexp_impl: str = "streaming",
    chunk: int = 1,
) -> dict:
    """Full test-set IW-LL sweep. Returns mean LL (nats/image) and bpd.

    ``chunk``: IW samples per scan iteration (see make_iwll_step) — the
    estimate is chunk-invariant; larger chunks trade activation memory
    for MXU occupancy."""
    import numpy as np

    cfg = experiment.loss_cfg
    bs = batch_size or min(experiment.cfg.test_batch_size, experiment.test_data.n)
    base = make_iwll_step(
        experiment.model, cfg, n_samples, logsumexp_impl, chunk=chunk
    )
    mesh = getattr(experiment, "mesh", None)
    # multi-process feeding: inputs to the sharded jit must be GLOBAL
    # arrays, and the per-batch [B] result must come back replicated so
    # every process can read it (a data-sharded output is not fully
    # addressable from one host)
    multi = mesh is not None and jax.process_count() > 1
    if mesh is not None:
        # the k=100 IW sweep is the most expensive eval in the framework —
        # shard the batch (and its index vector) over the data mesh. The
        # per-(image, sample) keys make the result device-count invariant.
        from lvae_tpu.parallel import replicated, replicated_key, shard_batch

        rep, sh = replicated(mesh), shard_batch(mesh)
        # the batch shards over the DATA axis only (eval never shards on
        # 'space'), so round up to that axis's size — same rule as
        # Experiment.evaluate
        s = mesh.shape["data"]
        bs = -(-bs // s) * s
        step = jax.jit(
            base,
            in_shardings=(rep, sh, sh, rep),
            out_shardings=rep if multi else sh,
        )
    else:
        step = jax.jit(base)
    key = replicated_key(mesh, seed) if multi else jax.random.key(seed)
    from lvae_tpu.parallel import eval_batch_stream

    if mesh is not None:
        # the AOT-compiled executable below (unlike a plain jit call) does
        # NOT auto-place uncommitted inputs onto its compiled shardings —
        # commit state/key up front and each batch as it streams
        state = jax.device_put(state, rep)
        key = jax.device_put(key, rep)
    total, count = 0.0, 0
    compile_s = 0.0
    compiled = None
    t0 = time.perf_counter()
    for jidx, batch, n_valid in eval_batch_stream(
        mesh, experiment.test_data, experiment.bundle.test, bs, max_batches
    ):
        if mesh is not None:
            jidx = jax.device_put(jidx, sh)
            batch = jax.device_put(batch, sh)
        if compiled is None:
            # AOT-compile against the first batch (every batch shares the
            # padded shape — eval_batch_stream). Separating compile from
            # execution matters here: the k=100 sweep is ~1.3 s of
            # execution behind ~18 s of cold compile (tools/iwll_probe.py),
            # so a wall-only number misreports the eval's cost 10x in
            # either direction depending on the persistent-cache state.
            tc = time.perf_counter()
            compiled = step.lower(state, batch, jidx, key).compile()
            compile_s = time.perf_counter() - tc
            t0 = time.perf_counter()
        ll = compiled(state, batch, jidx, key)
        total += float(np.asarray(ll)[:n_valid].sum())
        count += n_valid
    # exec wall includes every value readback (`float(...)` per batch), so
    # this is execution-gated throughput even through the axon tunnel —
    # the same timing rule as bench.py (DESIGN.md §2b).
    wall = time.perf_counter() - t0
    mean_ll = total / max(count, 1)
    return {
        "iw_ll": mean_ll,
        "iw_bpd": -mean_ll / (cfg.data_dims * np.log(2.0)),
        "n_samples": n_samples,
        "n_images": count,
        "compile_s": compile_s,
        "wall_s": wall,
        "images_per_sec": count / wall if wall > 0 else float("nan"),
    }
