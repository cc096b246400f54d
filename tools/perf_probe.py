#!/usr/bin/env python
"""Ablation probe for the train step's wall time on the real chip.

Times each configuration with execution-gated stopwatches (the clock stops
only after a value of the final dispatch is on the host — see bench.py's
methodology note) and prints a per-image breakdown, so optimization work
targets what is actually slow instead of guessing.

Usage:  python tools/perf_probe.py [--batch-size 2048] [--iters 6]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.data.registry import DatasetBundle
from lvae_tpu.train import Experiment, make_train_step


def timed(fn, *args, iters=6, warmup=2, reduce_out=None):
    """Execution-gated seconds/call. ``reduce_out`` maps the output to a
    small array whose device_get gates the queue."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(reduce_out(out) if reduce_out else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(reduce_out(out) if reduce_out else out)
    return (time.perf_counter() - t0) / iters


def make_exp(args, **cfg_kw):
    rng = np.random.default_rng(0)
    n_train = max(2 * args.batch_size, 4096)
    train = (rng.uniform(size=(n_train, 28, 28, 1)) < 0.5).astype(np.uint8)
    bundle = DatasetBundle(
        name="bench", train=train, test=train[:256], img_size=(28, 28),
        padded_size=(32, 32), color_ch=1, preprocess="none",
        default_likelihood="bernoulli",
    )
    cfg = dict(
        dataset="bench", zdims=(32, 32, 32), downsample=(1, 1, 1),
        blocks_per_layer=2, n_filters=64, skip=True, gated=True,
        learn_top_prior=True, freebits=0.5, batch_size=args.batch_size,
        dropout=0.2, seed=0, precision=args.precision, dry_run=True,
    )
    cfg.update(cfg_kw)
    return Experiment(ExperimentConfig(**cfg), bundle=bundle)


def flops_of(jfn, *args):
    try:
        ca = jfn.lower(*args).compile().cost_analysis() or {}
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def report(name, sec, batch, flops=0.0, byts=0.0):
    ips = batch / sec
    line = f"{name:<38} {sec * 1e3:8.2f} ms  {ips:9.0f} img/s"
    if flops:
        line += f"  {flops / sec / 1e12:6.2f} TF/s"
    if byts:
        line += f"  {byts / sec / 1e9:6.1f} GB/s"
    print(line, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--trace", action="store_true", help="try a profiler trace")
    args = p.parse_args()

    b = args.batch_size
    print(f"device: {jax.devices()[0].device_kind}  batch {b}  "
          f"precision {args.precision}", flush=True)

    # ---- full train step (the production program) --------------------
    exp = make_exp(args)
    step = jax.jit(make_train_step(exp.model, exp.tx, exp.loss_cfg))
    state = exp.init_state()
    data = exp.train_data.array
    idx = jnp.arange(b)
    f, by = flops_of(step, state, data, idx)
    sec = timed(lambda: step(state, data, idx)[1]["elbo"], iters=args.iters)
    report("train step (full)", sec, b, f, by)

    # ---- forward-only ELBO -------------------------------------------
    x = jnp.asarray(
        (np.random.default_rng(1).uniform(size=(b, 28, 28, 1)) < 0.5)
        .astype(np.float32)
    )
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    def fwd(params, x):
        vs = {"params": params}
        if state.batch_stats:
            vs["batch_stats"] = state.batch_stats
        out = exp.model.apply(
            vs, x, train=True, mutable=["batch_stats"],
            rngs={"sample": jax.random.key(0), "dropout": jax.random.key(1)},
        )[0]
        return out["ll"].mean() - out["kl_sep"].sum()

    jf = jax.jit(fwd)
    f, by = flops_of(jf, state.params, x)
    sec = timed(lambda: jf(state.params, x), iters=args.iters)
    report("forward only", sec, b, f, by)

    # ---- forward + backward (no optimizer) ---------------------------
    jg = jax.jit(jax.grad(fwd))
    f, by = flops_of(jg, state.params, x)
    sec = timed(
        lambda: jg(state.params, x), iters=args.iters,
        reduce_out=lambda g: jax.tree_util.tree_leaves(g)[0].ravel()[0],
    )
    report("forward + backward", sec, b, f, by)

    # ---- ablations on the full step -----------------------------------
    for name, kw in [
        ("no dropout", dict(dropout=0.0)),
        ("no batchnorm", dict(batchnorm=False)),
        ("no dropout + no bn", dict(dropout=0.0, batchnorm=False)),
        ("no gate", dict(gated=False)),
        ("remat", dict(remat=True)),
        ("fused pallas stochastic", dict(fused="stochastic")),
    ]:
        e2 = make_exp(args, **kw)
        s2 = jax.jit(make_train_step(e2.model, e2.tx, e2.loss_cfg))
        st2 = e2.init_state()
        f, by = flops_of(s2, st2, e2.train_data.array, idx)
        sec = timed(
            lambda: s2(st2, e2.train_data.array, idx)[1]["elbo"],
            iters=args.iters,
        )
        report(f"train step ({name})", sec, b, f, by)

    # ---- a pure conv-stack straw man: how fast CAN convs of this shape
    # go on this chip? 12 convs 3x3x64x64 at 16x16 (the model's dominant
    # conv shape class), fwd only.
    dt = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    w = jnp.asarray(
        np.random.default_rng(2).normal(size=(12, 3, 3, 64, 64)) * 0.05, dt
    )
    xc = jnp.asarray(
        np.random.default_rng(3).normal(size=(b, 16, 16, 64)), dt
    )

    def conv_stack(w, xc):
        y = xc
        for i in range(12):
            y = jax.lax.conv_general_dilated(
                y, w[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jax.nn.elu(y)
        return y.mean()

    jc = jax.jit(conv_stack)
    f, by = flops_of(jc, w, xc)
    sec = timed(lambda: jc(w, xc), iters=args.iters)
    report("12x conv3x3 64ch @16x16 fwd", sec, b, f, by)

    if args.trace:
        import os
        d = "/tmp/lvae_trace"
        os.makedirs(d, exist_ok=True)
        try:
            with jax.profiler.trace(d):
                for _ in range(3):
                    st, m = step(state, data, idx)
                jax.device_get(m["elbo"])
            print(f"trace written to {d}", flush=True)
        except Exception as e:
            print(f"trace failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
