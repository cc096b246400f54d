#!/usr/bin/env python
"""Decompose the IW-LL eval wall time on the real chip.

The r5 chunk sweep (RESULTS.md round 5) showed the chunked k-scan buys
only ~3% — yet the eval forward runs ~9x slower than the TRAIN forward
at the same precision, so the VERDICT r4 #4 "feed the MXU" diagnosis
must be wrong about *where* the time goes. This probe times the eval
path's layers separately, execution-gated (bench.py methodology):

  batched_fwd    model.apply on the whole batch, ONE rng      <- ceiling
  per_image_fwd  vmapped batch-1 apply, per-image keys        <- eval's inner op
  iwll_k8_c{1,4} full IW step at k=8, divided by k            <- + scan/accum

at fp32 and bf16 compute, so the per-image-vmap cost, the scan cost and
the precision cost are separated. make_per_image_eval's docstring claims
XLA re-batches the vmapped convs to match the batched apply — this probe
is that claim's hardware test.

Usage:  python tools/iwll_probe.py [--batch-size 1024] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.data.registry import DatasetBundle
from lvae_tpu.eval.iwll import make_iwll_step
from lvae_tpu.train import Experiment
from lvae_tpu.train.state import per_image_forward


def timed(fn, *args, iters=8, warmup=2, reduce_out=None):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(reduce_out(out) if reduce_out else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(reduce_out(out) if reduce_out else out)
    return (time.perf_counter() - t0) / iters


def make_exp(args, precision):
    rng = np.random.default_rng(0)
    n = max(2 * args.batch_size, 2048)
    train = (rng.uniform(size=(n, 28, 28, 1)) < 0.5).astype(np.uint8)
    bundle = DatasetBundle(
        name="bench", train=train, test=train[: args.batch_size],
        img_size=(28, 28), padded_size=(32, 32), color_ch=1,
        preprocess="binarize", default_likelihood="bernoulli",
    )
    cfg = ExperimentConfig(
        dataset="bench", zdims=(32, 32, 32), downsample=(1, 1, 1),
        blocks_per_layer=2, n_filters=64, skip=True, gated=True,
        learn_top_prior=True, freebits=0.5, batch_size=256,
        test_batch_size=args.batch_size, dropout=0.2, seed=0,
        precision=precision, dry_run=True,
    )
    return Experiment(cfg, bundle=bundle)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args()

    print(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}")
    batch_u8 = (np.random.default_rng(1).uniform(
        size=(args.batch_size, 28, 28, 1)) < 0.5).astype(np.uint8)
    idx = jnp.arange(args.batch_size)
    key = jax.random.key(0)

    for precision in ("fp32", "bf16"):
        exp = make_exp(args, precision)
        state = exp.init_state(data_dep_init=False)
        model, cfg = exp.model, exp.loss_cfg

        from lvae_tpu.data.device import eval_preprocess_batch

        def batched_fwd(state, batch_u8, idx, key):
            x = eval_preprocess_batch(batch_u8, cfg.preprocess, idx)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, x, train=False,
                              rngs={"sample": key})
            return out["ll"] - out["kl_sep"].sum(axis=0)

        def per_image_fwd(state, batch_u8, idx, key):
            x = eval_preprocess_batch(batch_u8, cfg.preprocess, idx)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
            ll, kl_sep = per_image_forward(model, variables, x, keys)
            return ll - kl_sep.sum(axis=0)

        legs = [
            ("batched_fwd", jax.jit(batched_fwd), 1),
            ("per_image_fwd", jax.jit(per_image_fwd), 1),
            ("iwll_c1", jax.jit(make_iwll_step(model, cfg, args.k,
                                               "streaming", chunk=1)), args.k),
            ("iwll_c4", jax.jit(make_iwll_step(model, cfg, args.k,
                                               "streaming", chunk=4)), args.k),
        ]
        for name, fn, per in legs:
            sec = timed(fn, state, batch_u8, idx, key, iters=args.iters,
                        reduce_out=lambda o: o.sum())
            fwd_s = sec / per
            print(f"[{precision}] {name:>14}: {sec * 1e3:8.2f} ms/call  "
                  f"{fwd_s * 1e3:8.2f} ms/fwd  "
                  f"{args.batch_size / fwd_s:9.0f} fwd-img/s")


if __name__ == "__main__":
    main()
