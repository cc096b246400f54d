#!/usr/bin/env python
"""Profile the flagship train step on hardware and summarize where time goes.

Runs a few warm steps of the exact bench.py configuration under
``jax.profiler.trace``, then parses the Perfetto/Chrome trace JSON that the
profiler writes (``plugins/profile/*/\*.trace.json.gz``) and prints the top
device ops by total self time, grouped by fusion/op name. This gives the
MFU-optimization loop actual data (VERDICT r1 item 1b: "profile and record
findings") without needing a TensorBoard UI on this box.

Usage:  python tools/profile_step.py [--batch-size 2048] [--steps 6]
        [--fused pallas] [--precision fp32] [--rng-impl threefry] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp


def build_step(args):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lvae_tpu.config import ExperimentConfig
    from lvae_tpu.train import Experiment, make_train_step

    n_train = max(2 * args.batch_size, 4096)
    # same source of truth as bench.py so the profiled model IS the
    # benchmarked one
    from lvae_tpu.data.registry import bench_preset

    bundle, zdims, downsample = bench_preset(args.preset, n_train)
    cfg = ExperimentConfig(
        dataset="prof", zdims=zdims, downsample=downsample,
        blocks_per_layer=2, n_filters=64, skip=True, gated=True,
        learn_top_prior=True, freebits=0.5, batch_size=args.batch_size,
        dropout=args.dropout, seed=0, fused=args.fused,
        precision=args.precision, rng_impl=args.rng_impl, dry_run=True,
    )
    exp = Experiment(cfg, bundle=bundle)
    step_fn = jax.jit(
        make_train_step(exp.model, exp.tx, exp.loss_cfg), donate_argnums=(0,)
    )
    state = exp.init_state()
    data = exp.train_data.array
    idx = jnp.arange(args.batch_size)
    return step_fn, state, data, idx


def collect_device_events(trace_dir):
    """Parse all .trace.json.gz files; return complete-events from the
    device "XLA Ops" lanes only (the Steps / XLA Modules lanes are
    per-step envelopes that would double-count every op)."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace files found under {trace_dir}")
    events = []
    for path in paths:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        ev = data.get("traceEvents", [])
        device_pids, op_lanes = set(), set()
        for e in ev:
            if e.get("ph") != "M":
                continue
            if e.get("name") == "process_name":
                name = e.get("args", {}).get("name", "")
                if any(s in name for s in ("TPU", "Device", "/device:")):
                    device_pids.add(e["pid"])
            elif e.get("name") == "thread_name":
                if e.get("args", {}).get("name") == "XLA Ops":
                    op_lanes.add((e["pid"], e.get("tid")))
        if not op_lanes:
            # profiler versions name lanes differently; fall back to every
            # device lane (envelope double-counting beats a hard exit)
            print("warning: no 'XLA Ops' lane found; summing all device "
                  "lanes (per-op totals may double-count envelopes)")
            op_lanes = None
        for e in ev:
            if (
                e.get("ph") == "X"
                and e.get("pid") in device_pids
                and (op_lanes is None or (e["pid"], e.get("tid")) in op_lanes)
            ):
                events.append(e)
    return events


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: 256 (mnist) / 128 (celeba64)")
    p.add_argument("--preset", default="mnist", choices=["mnist", "celeba64", "cifar10-deep"])
    p.add_argument("--steps", type=int, default=6)
    # same policy strings and default as bench.py, so the profiled program
    # is always the benchmarked one (registry.bench_preset contract)
    p.add_argument("--fused", default="auto",
                   choices=["auto", "none", "stochastic", "mixture",
                            "pallas", "segments", "all"])
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    p.add_argument("--rng-impl", default="rbg", choices=["rbg", "threefry"])
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default=None, help="trace dir (default: tmp)")
    args = p.parse_args()
    if args.batch_size is None:
        args.batch_size = 128 if args.preset == "celeba64" else 256

    step_fn, state, data, idx = build_step(args)

    # warmup: compile + settle, gate on a value readback
    for _ in range(3):
        state, metrics = step_fn(state, data, idx)
    float(jax.device_get(metrics["elbo"]))

    trace_dir = args.out or tempfile.mkdtemp(prefix="lvae_prof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, data, idx)
        float(jax.device_get(metrics["elbo"]))

    events = collect_device_events(trace_dir)
    if not events:
        raise SystemExit("trace parsed but no device events found")

    import re

    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    by_stage = defaultdict(float)
    count = defaultdict(int)
    total = bytes_total = 0.0
    b = args.batch_size
    for e in events:
        dur = e.get("dur", 0.0)  # us
        a = e.get("args", {})
        total += dur
        by_name[e["name"]] += dur
        count[e["name"]] += 1
        by_cat[re.sub(r"[.\d]+$", "", e["name"])] += dur
        bytes_total += float(a.get("raw_bytes_accessed", 0) or 0)
        m = re.search(rf"\[{b},(\d+),(\d+)", str(a.get("long_name", "")))
        by_stage[f"{m.group(1)}x{m.group(2)}" if m else "other"] += dur
    per_step = total / args.steps

    import bench as bench_mod

    bw = bench_mod.device_hbm_bw()
    print(f"trace dir: {trace_dir}")
    print(f"device busy: {per_step/1e3:.2f} ms/step, "
          f"{bytes_total/args.steps/1e9:.2f} GB/step accessed "
          f"({bw/1e9:.0f} GB/s floor = "
          f"{bytes_total/args.steps/bw*1e3:.2f} ms)")
    print("-- by category --")
    for name, us in sorted(by_cat.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{name[:48]:<48} {us/args.steps/1e3:8.3f} ms {100*us/total:5.1f}%")
    print("-- by spatial stage (batch-major shapes) --")
    for name, us in sorted(by_stage.items(), key=lambda kv: -kv[1])[:8]:
        print(f"{name:>10} {us/args.steps/1e3:8.2f} ms {100*us/total:5.1f}%")
    print(f"-- top ops --\n{'op':<60} {'ms/step':>9} {'%':>6} {'calls':>6}")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{name[:60]:<60} {us/args.steps/1e3:9.3f} "
              f"{100*us/total:6.2f} {count[name]:6d}")


if __name__ == "__main__":
    main()
