#!/usr/bin/env python
"""Training-throughput benchmark on the flagship config.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: BASELINE.json's authoritative target of 10,000 32x32 images/sec/
chip on TPU v5e (the reference never published throughput — SURVEY.md §6),
so vs_baseline = value / 10000.

Measures the full jitted train step (device-resident batch gather +
on-device preprocessing + fwd/bwd + Adamax + EMA) on the real chip, steady
state, wall-clock over `--steps` steps with the async dispatch pipeline
warm. ``--smoke`` shrinks everything for a fast plumbing check.

Measured v5e headline numbers (this flagship config):
  single dispatch:  b256 ~66-88k img/s, b1024 ~286k, b2048 ~564k,
                    b4096 ~1.06M, b8192 bf16+remat ~2.19M
  fused dispatches (--steps-per-call): b64 spc32 ~508k, b256 spc8 ~560k,
                    b256 spc32 ~1.65M, b2048 spc8 ~3.2-4.9M (320-490x baseline)
A single step is host-dispatch-bound (~4-5 ms wall per call vs ~150 us
of compute at b256), so fusing K steps per dispatch with lax.scan and
growing the batch both scale throughput until HBM runs out (fp32 b8192
OOMs; --remat + --precision bf16 fits it).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 10_000.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--n-filters", type=int, default=64)
    p.add_argument("--blocks-per-layer", type=int, default=2)
    p.add_argument("--fused", default="none", choices=["none", "pallas"])
    p.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    p.add_argument("--remat", action="store_true")
    p.add_argument("--steps-per-call", type=int, default=8)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    if args.smoke:
        args.batch_size, args.steps, args.warmup = 32, 5, 2
        args.n_filters, args.blocks_per_layer = 16, 1

    from lvae_tpu.config import ExperimentConfig
    from lvae_tpu.data.registry import DatasetBundle
    from lvae_tpu.train import Experiment, make_train_step
    from lvae_tpu.train.state import make_multi_train_step

    # synthetic static-MNIST-like data, device resident (data path identical
    # to a real run: gather + preprocess inside the step)
    rng = np.random.default_rng(0)
    n_train = max(4 * args.batch_size, 4096) if not args.smoke else 256
    train = (rng.uniform(size=(n_train, 28, 28, 1)) < 0.5).astype(np.uint8)
    bundle = DatasetBundle(
        name="bench", train=train, test=train[:256], img_size=(28, 28),
        padded_size=(32, 32), color_ch=1, preprocess="none",
        default_likelihood="bernoulli",
    )
    cfg = ExperimentConfig(
        dataset="bench",
        zdims=(32, 32, 32),
        downsample=(1, 1, 1),
        blocks_per_layer=args.blocks_per_layer,
        n_filters=args.n_filters,
        skip=True,
        gated=True,
        learn_top_prior=True,
        freebits=0.5,
        batch_size=args.batch_size,
        dropout=0.2,
        seed=0,
        fused=args.fused,
        precision=args.precision,
        remat=args.remat,
        dry_run=True,
    )
    exp = Experiment(cfg, bundle=bundle)
    spc = max(1, args.steps_per_call)
    if spc > 1:
        step_fn = jax.jit(
            make_multi_train_step(exp.model, exp.tx, exp.loss_cfg, spc),
            donate_argnums=(0,),
        )
    else:
        step_fn = jax.jit(
            make_train_step(exp.model, exp.tx, exp.loss_cfg), donate_argnums=(0,)
        )
    state = exp.init_state()
    data = exp.train_data.array

    def idx_for(i):
        base = (np.arange(args.batch_size) + i * args.batch_size) % n_train
        if spc > 1:
            return jnp.asarray(
                np.stack([(base + j * args.batch_size) % n_train for j in range(spc)])
            )
        return jnp.asarray(base)

    for i in range(args.warmup):
        state, metrics = step_fn(state, data, idx_for(i))
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, data, idx_for(i + args.warmup))
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    ips = args.steps * spc * args.batch_size / dt
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
