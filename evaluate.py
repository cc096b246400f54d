#!/usr/bin/env python
"""Evaluate a saved run (reference: evaluate.py — SURVEY.md §2.1, §3.2).

Loads a run by name from the output directory, restores the latest (or a
chosen) checkpoint, computes the test-set ELBO, optionally the
100-importance-sample log-likelihood, and writes prior-sample and
reconstruction grids.

    python evaluate.py --load <run-name> [--ll] [--iw-samples 100]
"""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a saved Ladder VAE run")
    p.add_argument("--load", required=True, help="run name (or full run dir)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--step", type=int, default=None, help="checkpoint step (default: latest)")
    p.add_argument("--ll", action="store_true",
                   help="compute importance-weighted log-likelihood")
    p.add_argument("--iw-samples", type=int, default=100)
    p.add_argument("--logsumexp", default="streaming",
                   choices=["streaming", "pallas"],
                   help="IW logsumexp implementation (scan accumulator or Pallas kernel)")
    p.add_argument("--iw-chunk", type=int, default=1,
                   help="IW samples evaluated per scan iteration (estimate "
                        "is chunk-invariant). Default 1: the hardware A/B "
                        "(tools/iwll_probe.py, RESULTS.md round 5) showed "
                        "chunk=4 runs 2x SLOWER per forward at flagship "
                        "eval batches (the MXU is already fed) and "
                        "chunk=16 OOMs; raise it only when the eval batch "
                        "itself is too small to fill the array")
    p.add_argument("--precision", default=None, choices=["fp32", "bf16"],
                   help="override the run's conv compute dtype at eval "
                        "time (checkpoints are layout-identical across "
                        "precisions; bf16 speeds the IW forward ~1.6x on "
                        "TPU — RESULTS.md round 5 quantifies the bpd "
                        "delta vs fp32)")
    p.add_argument("--test-batch-size", type=int, default=None)
    p.add_argument("--num-data-shards", type=int, default=None,
                   help="shard the eval batch over this many devices "
                        "(default: the run's training value)")
    p.add_argument("--fused", default=None,
                   choices=["auto", "none", "stochastic", "mixture",
                            "pallas", "segments", "all"],
                   help="override the run's Pallas kernel policy at eval "
                        "time (checkpoints are layout-identical across "
                        "policies; e.g. 'auto' speeds the IW sweep of a "
                        "mixture-head run trained before the policy existed)")
    p.add_argument("--nimages", type=int, default=64, help="prior samples in the grid")
    p.add_argument("--data-dir", default=None, help="override the run's data dir")
    # generation diagnostics (reference capability, SURVEY.md §3.3:
    # forcing/fixing latents at chosen layers for qualitative analysis)
    p.add_argument("--mode-layers", type=int, nargs="*", default=None,
                   metavar="I",
                   help="sample the distribution MODE (z = mu) at these "
                        "layer indices when generating")
    p.add_argument("--constant-layers", type=int, nargs="*", default=None,
                   metavar="I",
                   help="share one latent draw across the whole batch at "
                        "these layer indices when generating")
    p.add_argument("--temperature", type=float, nargs="+", default=None,
                   metavar="T",
                   help="scale the prior sampling std when generating "
                        "(T<1 sharper, T=0 degenerates to the mode); one "
                        "value for all layers or one per stochastic layer "
                        "(bottom first)")
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force a JAX backend (e.g. evaluate on CPU without "
                        "touching the TPU)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lvae_tpu.cache import enable_persistent_cache
    from lvae_tpu.config import apply_platform

    apply_platform(args.platform)
    enable_persistent_cache()
    from lvae_tpu.config import config_from_dict
    from lvae_tpu.eval.iwll import evaluate_iwll
    from lvae_tpu.train import CheckpointManager, Experiment, load_config_dict

    run_dir = args.load if os.path.isdir(args.load) else os.path.join(
        args.output_dir, args.load
    )
    # All overrides and pod-checkpoint clamping happen on the RAW dict:
    # ExperimentConfig.__post_init__ validates flag consistency (e.g.
    # batch_size % num_data_shards) at construction, so a pod config must
    # be clamped to this host's devices BEFORE it is built, not after
    d = load_config_dict(run_dir)
    if args.test_batch_size:
        d["test_batch_size"] = args.test_batch_size
    if args.data_dir:
        d["data_dir"] = args.data_dir
    import jax

    n_dev = len(jax.devices())
    stored_ds = int(d.get("num_data_shards") or 1)
    stored_ss = int(d.get("spatial_shards") or 1)
    if args.num_data_shards is not None:
        d["num_data_shards"] = args.num_data_shards
        if args.num_data_shards * stored_ss > n_dev:
            # the stored spatial axis can't coexist with the requested
            # data axis on this host; eval never needs spatial sharding
            # for correctness (it batch-shards only), so drop it rather
            # than crash in make_mesh
            print(
                f"note: --num-data-shards {args.num_data_shards} with the "
                f"run's spatial_shards={stored_ss} needs "
                f"{args.num_data_shards * stored_ss} devices, only "
                f"{n_dev} here — evaluating with spatial_shards=1",
                flush=True,
            )
            d["spatial_shards"] = 1
    elif stored_ds * stored_ss > n_dev:
        # A run trained on more devices than this host has (e.g. a pod
        # checkpoint evaluated on one chip) must still evaluate: eval is
        # batching-invariant (per-image keyed binarization) and the data
        # mesh only changes reduction sharding, so clamping is safe. The
        # clamp keeps the stored train batch divisible (config validation)
        clamped = min(stored_ds, n_dev)
        while int(d.get("batch_size") or 1) % clamped:
            clamped -= 1
        print(
            f"note: run was trained on a {stored_ds}x"
            f"{stored_ss} (data x space) mesh, only {n_dev} "
            f"device(s) here — evaluating data-parallel over "
            f"{clamped} (same metrics; pass "
            "--num-data-shards to override)",
            flush=True,
        )
        d["num_data_shards"] = clamped
        d["spatial_shards"] = 1
    if args.fused is not None:
        d["fused"] = args.fused
    if args.precision is not None:
        d["precision"] = args.precision
    cfg = config_from_dict(d)

    exp = Experiment(cfg)
    # data_dep_init=False: the restore below overwrites the params anyway;
    # re-running the stats pass here would waste one forward per conv
    state = CheckpointManager(run_dir, keep=cfg.keep_checkpoints).restore(
        exp.init_state(data_dep_init=False), step=args.step
    )
    print(f"restored {run_dir} at step {int(state.step)}", flush=True)

    metrics = exp.evaluate(state)
    print(
        f"test elbo {metrics['elbo']:.2f}  recons {metrics['ll']:.2f}  "
        f"kl {metrics['kl']:.2f}  bpd {metrics['bpd']:.4f}", flush=True,
    )
    for i, v in enumerate(metrics["kl_layers"]):
        print(f"  kl/layer_{i}: {v:.2f}")

    if args.ll:
        # --logsumexp pallas works on a sharded eval mesh too: the kernel
        # is registered with the SPMD partitioner (shards over B, k
        # replicated — kernels/logsumexp_pallas.py), no fallback needed.
        chunk = args.iw_chunk
        if chunk < 1:
            raise SystemExit(f"--iw-chunk must be >= 1, got {chunk}")
        try:
            iw = evaluate_iwll(
                exp, state, n_samples=args.iw_samples,
                logsumexp_impl=args.logsumexp, chunk=chunk,
            )
        except Exception as e:  # XlaRuntimeError has no stable import path
            if "RESOURCE_EXHAUSTED" in str(e) and chunk > 1:
                # chunk=16 at flagship scale OOMs a v5e chip (r5 queue);
                # name the flag instead of dumping the allocator trace
                raise SystemExit(
                    f"IW eval ran out of device memory at --iw-chunk "
                    f"{chunk}: the forward holds chunk x batch "
                    f"activations. Lower --iw-chunk (default 1 is also "
                    f"the fastest measured — RESULTS.md round 5) or "
                    f"--test-batch-size.\n\n{e}"
                ) from None
            raise
        print(
            f"IW log-likelihood ({iw['n_samples']} samples, "
            f"{iw['n_images']} images, chunk {chunk}): {iw['iw_ll']:.2f} nats  "
            f"bpd {iw['iw_bpd']:.4f}  "
            f"[compile {iw['compile_s']:.1f}s + exec {iw['wall_s']:.1f}s, "
            f"{iw['images_per_sec']:.1f} img/s]", flush=True,
        )

    exp.dump_images(state, run_dir, int(state.step), n_samples=args.nimages)
    print(f"wrote sample/recon grids to {os.path.join(run_dir, 'imgs')}")

    if (
        args.mode_layers is not None
        or args.constant_layers is not None
        or args.temperature is not None
    ):
        import jax

        from lvae_tpu.eval.viz import save_image_grid

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        mode_layers = tuple(args.mode_layers or ())
        constant_layers = tuple(args.constant_layers or ())
        if args.temperature is None:
            temperature = 1.0
        elif len(args.temperature) == 1:
            temperature = args.temperature[0]
        else:
            temperature = tuple(args.temperature)
        samples = exp.model.apply(
            variables, args.nimages, method="sample_prior",
            mode_layers=mode_layers, constant_layers=constant_layers,
            temperature=temperature,
            rngs={"sample": jax.random.key(int(state.step))},
        )["out_mean"]
        tag = []
        if mode_layers:
            tag.append("mode" + "-".join(map(str, mode_layers)))
        if constant_layers:
            tag.append("const" + "-".join(map(str, constant_layers)))
        if args.temperature is not None:
            ts = temperature if isinstance(temperature, tuple) else (temperature,)
            tag.append("T" + "-".join(f"{t:g}" for t in ts))
        path = os.path.join(
            run_dir, "imgs", f"diag_{'_'.join(tag)}_{int(state.step)}.png"
        )
        save_image_grid(np.asarray(samples), path)
        print(f"wrote generation-diagnostics grid to {path}")


if __name__ == "__main__":
    main()
