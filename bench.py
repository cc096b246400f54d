#!/usr/bin/env python
"""Training-throughput benchmark on the flagship config — honest edition.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip",
     "vs_baseline": N, ...mfu/flops accounting fields}

Baseline: BASELINE.json's authoritative target of 10,000 32x32 images/sec/
chip on TPU v5e (the reference never published throughput — SURVEY.md §6),
so vs_baseline = value / 10000.

Measurement methodology (VERDICT round 1 item 1 — this is load-bearing):
on this box's tunneled ("axon") TPU runtime, ``jax.block_until_ready``
returns BEFORE the queued work has executed, so a stopwatch around
dispatches measures host dispatch rate, not compute (round 1 shipped
3.86 M img/s = 33x over the chip's physical peak this way). The timed
window therefore ends with a **value readback** (``jax.device_get`` of a
metric produced by the final step, which depends on the whole donated
state chain) — the clock cannot stop until every step has actually
executed. The warmup phase also ends with a readback so the steady-state
regime (readback-inclusive) is what gets measured.

Physics accounting: FLOPs/step come from XLA's own
``compiled.cost_analysis()``; the script emits flops/image, the device
kind and its bf16 peak, and ``mfu = img_s * flops_per_image / peak``, and
**asserts the result is below the roofline** so a dispatch-rate artifact
of this class can never ship again.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 10_000.0

# Dense bf16 peak FLOP/s per chip by device kind. MFU is reported against
# the bf16 peak even for fp32 runs (conservative: fp32 MXU throughput is
# lower, so true utilization is higher than reported).
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e: 197 TFLOP/s bf16
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "cpu": 1e12,             # nominal; CI smoke only
}

# HBM bandwidth per chip (bytes/s) for byte-roofline accounting
HBM_BW = {
    "TPU v5 lite": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
    "cpu": 100e9,
}


def device_hbm_bw() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if k.lower() in kind.lower():
            return v
    return HBM_BW["cpu"]


def device_peak_flops() -> tuple[str, float]:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return kind, v
    return kind, PEAK_FLOPS["cpu"]


# Written after every successful bench run; cited in the failure JSON so a
# transient tunnel outage at capture time never voids the round record
# (round 4's BENCH_r04.json was an empty `parsed: null` for exactly this).
LAST_VERIFIED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last_verified.json"
)


def _probe_once(timeout_s: float) -> bool:
    """One bounded liveness probe: trivial matmul + VALUE readback on a
    daemon thread (the tunneled runtime degrades by HANGING in a C call no
    signal handler can interrupt — a join timeout is the only safe bound)."""
    import threading

    done = threading.Event()

    def probe():
        x = jnp.ones((256, 256))
        float(jax.device_get(jnp.sum(x @ x)))
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    return done.wait(timeout_s)


def _unreachable_record(probes: int, timeout_s: float, backoff_s: float) -> dict:
    """Structured failure JSON (the documented schema — see README
    'Benchmark' section): same envelope keys as a success record so the
    driver's parse never comes back empty, plus the outage diagnosis and
    the last verified result + timestamp for the round record."""
    last = None
    try:
        with open(LAST_VERIFIED_PATH) as f:
            last = json.load(f)
    except (OSError, ValueError):
        pass
    total_s = probes * timeout_s + (probes - 1) * backoff_s
    return {
        "metric": "train_images_per_sec_per_chip",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": "device_unreachable",
        "detail": (
            f"{probes} liveness probes (trivial matmul readback, "
            f"{timeout_s:.0f}s bound each, {backoff_s:.0f}s backoff) all "
            f"timed out over ~{total_s / 60:.0f} min — tunneled TPU "
            "hard-down at capture time; refusing to hang"
        ),
        "last_verified": last,
    }


def assert_device_alive(
    timeout_s: float = 150.0,
    retries: int = 3,
    backoff_s: float = 150.0,
    _probe=None,
    _sleep=time.sleep,
) -> None:
    """Bounded retry-with-backoff liveness gate (exit 2 on final failure).

    The tunnel's outages are TRANSIENT (round 3/4 evidence: hard-down for
    hours, then revived and reproduced the headline to 0.1%), so one failed
    probe must not void a round record: probe up to ``retries`` times,
    ``backoff_s`` apart (~12.5 min total at the defaults). On final failure
    print the structured unreachable JSON (citing the last verified result
    + timestamp from ``.bench_last_verified.json``) to stdout and hard-exit
    2 — the driver record then carries the diagnosis instead of
    ``parsed: null``."""
    import sys

    probe = _probe if _probe is not None else _probe_once
    for attempt in range(1, retries + 1):
        if probe(timeout_s):
            return
        print(
            f"bench: device liveness probe {attempt}/{retries} (trivial "
            f"matmul readback) did not complete within {timeout_s:.0f}s",
            file=sys.stderr, flush=True,
        )
        if attempt < retries:
            print(
                f"bench: backing off {backoff_s:.0f}s before reprobing "
                "(tunnel outages are transient)",
                file=sys.stderr, flush=True,
            )
            _sleep(backoff_s)
    print(json.dumps(_unreachable_record(retries, timeout_s, backoff_s)), flush=True)
    os._exit(2)


def record_last_verified(result: dict) -> None:
    """Persist a successful bench record (+ UTC timestamp) for citation by
    later outage records. Best-effort — never fails the bench."""
    rec = {
        "value": result.get("value"),
        "unit": result.get("unit"),
        "vs_baseline": result.get("vs_baseline"),
        "mfu": result.get("mfu"),
        "config": result.get("config"),
        "device": result.get("device"),
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        with open(LAST_VERIFIED_PATH, "w") as f:
            json.dump(rec, f, indent=1)
    except OSError:
        pass


def main(argv=None):
    p = argparse.ArgumentParser()
    # b256 is the throughput-optimal batch on v5e: the full-resolution maps
    # are 33 MB (vs 268 MB at b2048), small enough for XLA to keep more
    # intermediates VMEM-resident — measured 35k img/s at b256 vs 29k at
    # b2048 with identical per-image work (RESULTS.md batch sweep).
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: 256 (mnist preset) / 128 (celeba64)")
    p.add_argument("--preset", default="mnist",
                   choices=["mnist", "celeba64", "cifar10-deep"],
                   help="mnist: the flagship 28x28 Bernoulli config; "
                        "celeba64: 64x64 RGB, 4 stochastic layers, "
                        "discretized-logistic-mix head (BASELINE config 5); "
                        "cifar10-deep: 32x32 RGB, 10 stochastic layers, "
                        "mixture head (BASELINE config 4)")
    p.add_argument("--steps", type=int, default=128,
                   help="timed steps = --steps x --steps-per-call")
    p.add_argument("--warmup", type=int, default=8, help="warmup dispatches")
    p.add_argument("--n-filters", type=int, default=64)
    p.add_argument("--blocks-per-layer", type=int, default=2)
    p.add_argument("--fused", default="auto",
                   choices=["auto", "none", "stochastic", "mixture",
                            "pallas", "segments", "all"])
    p.add_argument("--precision", default="bf16", choices=["fp32", "bf16"])
    # torch-convention switches (docs/CHECKPOINT_FORMAT.md): measure the
    # parity modes' throughput so mount-day numbers are known in advance
    p.add_argument("--conv-pad", default="same", choices=["same", "torch"])
    p.add_argument("--skip-merge", default="pre", choices=["pre", "post"])
    p.add_argument("--bn-stat-samples", type=int, default=0,
                   help="BN stats from the CONTIGUOUS leading N batch rows "
                        "(0 = exact full-batch stats) — bandwidth lever, "
                        "semantic deviation; use a multiple of 8 (sublane "
                        "tile: n=4 measured a 65%% LOSS); see DESIGN.md §4")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--steps-per-call", type=int, default=8)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--verbose", action="store_true",
                   help="print the accounting breakdown to stderr")
    args = p.parse_args(argv)

    if args.batch_size is None:
        # per-preset throughput-optimal batch (RESULTS.md batch sweeps)
        args.batch_size = 128 if args.preset == "celeba64" else 256
    if args.smoke:
        args.batch_size, args.steps, args.warmup = 32, 5, 2
        args.n_filters, args.blocks_per_layer = 16, 1
    elif args.batch_size % 128:
        import sys
        print(
            f"note: batch_size {args.batch_size} is not a multiple of 128 — "
            "XLA lays the large activation maps out batch-minor with 128-wide "
            "lane tiles, and non-multiples pay a steep padding tax "
            "(measured: b192 runs 27% slower than b128; RESULTS.md)",
            file=sys.stderr,
        )

    assert_device_alive()

    from lvae_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
    from lvae_tpu.config import ExperimentConfig
    from lvae_tpu.data.registry import bench_preset
    from lvae_tpu.train import Experiment, make_train_step
    from lvae_tpu.train.state import make_multi_train_step

    # synthetic device-resident data matching the preset (data path is
    # identical to a real run: gather + on-device preprocess inside the step)
    n_train = max(4 * args.batch_size, 4096) if not args.smoke else 256
    bundle, zdims, downsample = bench_preset(args.preset, n_train)
    cfg = ExperimentConfig(
        dataset="bench",
        zdims=zdims,
        downsample=downsample,
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
        conv_pad=args.conv_pad,
        skip_merge=args.skip_merge,
        bn_stat_samples=args.bn_stat_samples,
        remat=args.remat,
        dry_run=True,
    )
    exp = Experiment(cfg, bundle=bundle)
    spc = max(1, args.steps_per_call)
    if spc > 1:
        base = make_multi_train_step(exp.model, exp.tx, exp.loss_cfg, spc)
    else:
        base = make_train_step(exp.model, exp.tx, exp.loss_cfg)
    step_fn = jax.jit(base, donate_argnums=(0,))
    state = exp.init_state()
    data = exp.train_data.array

    def idx_for(i):
        base_idx = (np.arange(args.batch_size) + i * args.batch_size) % n_train
        if spc > 1:
            return jnp.asarray(np.stack(
                [(base_idx + j * args.batch_size) % n_train for j in range(spc)]
            ))
        return jnp.asarray(base_idx)

    # FLOPs from the compiler's own cost model. Lower the SINGLE-step
    # program for this: cost_analysis counts a lax.scan body once, not
    # x trip-count, so analyzing the steps-per-call program would
    # undercount flops by `spc` (and overstate headroom/understate MFU).
    # At spc==1 the timed program IS the single-step program — reuse it
    # rather than paying the multi-minute flagship compile twice.
    if spc > 1:
        single = jax.jit(make_train_step(exp.model, exp.tx, exp.loss_cfg))
    else:
        single = step_fn
    ca = single.lower(
        state, data, jnp.arange(args.batch_size)
    ).compile().cost_analysis() or {}
    flops_per_step = float(ca.get("flops", 0.0))
    flops_per_image = flops_per_step / args.batch_size
    bytes_per_step = float(ca.get("bytes accessed", 0.0))
    device_kind, peak = device_peak_flops()
    hbm_bw = device_hbm_bw()

    # Pre-build and pre-upload every step's index vector (the training loop
    # generates its indices once per epoch, not per dispatch; re-creating
    # them host-side inside the timed loop measured ~1.4 ms/step of pure
    # harness overhead at b256).
    all_idx = [
        jax.device_put(idx_for(i)) for i in range(args.warmup + args.steps)
    ]
    jax.block_until_ready(all_idx)

    # Warmup — ends with a value readback so the timed section below starts
    # in the same (readback-inclusive) steady-state regime a real training
    # run with metric logging lives in.
    for i in range(args.warmup):
        state, metrics = step_fn(state, data, all_idx[i])
    float(jax.device_get(metrics["elbo"]))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, data, all_idx[i + args.warmup])
    # The clock stops only after a VALUE of the final step is on the host:
    # metrics depend on state which threads through every step, so this
    # readback gates on the entire timed queue having executed.
    final_elbo = float(jax.device_get(metrics["elbo"]))
    dt = time.perf_counter() - t0

    n_images = args.steps * spc * args.batch_size
    ips = n_images / dt
    # The BASELINE target is defined on the 32x32 flagship config, so
    # vs_baseline is only emitted for the mnist preset (null otherwise —
    # per-pixel work differs across presets, so a pixel-count-normalized
    # ratio would not be like-for-like). img32_equivalent_per_sec remains
    # as a pixel-rate figure for cross-preset intuition only.
    mh, mw = exp.bundle.padded_size
    ips_32 = ips * (mh * mw) / 1024.0
    vs_baseline = (
        round(ips_32 / BASELINE_IMG_PER_SEC, 4) if args.preset == "mnist" else None
    )
    achieved_flops = ips * flops_per_image
    mfu = achieved_flops / peak if peak else 0.0

    # Roofline sanity: a number above the chip's physical peak is a
    # measurement artifact by definition — refuse to emit it.
    if flops_per_image > 0 and achieved_flops > 1.05 * peak:
        raise SystemExit(
            f"measured {ips:.0f} img/s x {flops_per_image:.3e} FLOP/img = "
            f"{achieved_flops:.3e} FLOP/s exceeds the {device_kind} peak "
            f"{peak:.3e} — execution gating is broken; refusing to report."
        )
    # Bandwidth cross-check (VERDICT r2 #8): the FLOP roofline only trips
    # ~33x over reality on this HBM-bound step; the byte roofline catches
    # sub-peak dispatch artifacts. Caveat making this a graduated check
    # rather than a hard 1.0x refusal: cost_analysis' 'bytes accessed'
    # counts every fusion boundary as HBM, but XLA keeps some of those
    # buffers VMEM-resident between ops (the measured +20% at b256 vs
    # b2048 is exactly that), so legitimate throughput can exceed the
    # naive bytes/BW ceiling by a modest factor. 3x cannot be explained
    # by VMEM reuse at these working-set sizes -> refuse; 1.25x -> warn.
    if bytes_per_step > 0:
        byte_ceiling_ips = hbm_bw / (bytes_per_step / args.batch_size)
        if ips > 3.0 * byte_ceiling_ips:
            raise SystemExit(
                f"measured {ips:.0f} img/s is {ips / byte_ceiling_ips:.1f}x "
                f"the HBM byte ceiling ({byte_ceiling_ips:.0f} img/s from "
                f"{bytes_per_step / args.batch_size:.3e} B/img at "
                f"{hbm_bw:.3e} B/s) — no VMEM-residency argument covers "
                "that; execution gating is broken, refusing to report."
            )
        if ips > 1.25 * byte_ceiling_ips:
            import sys
            print(
                f"warning: measured {ips:.0f} img/s exceeds the naive HBM "
                f"byte ceiling ({byte_ceiling_ips:.0f} img/s) by "
                f"{ips / byte_ceiling_ips:.2f}x — plausible only via VMEM "
                "residency between fusions; inspect with "
                "tools/profile_step.py before trusting.",
                file=sys.stderr,
            )
    if not np.isfinite(final_elbo):
        raise SystemExit(f"non-finite elbo {final_elbo} — benchmark invalid")

    if args.verbose:
        import sys
        print(
            f"device={device_kind} peak={peak:.3e} FLOP/s\n"
            f"flops/step={flops_per_step:.4e} flops/image={flops_per_image:.4e}\n"
            f"{n_images} images in {dt:.3f} s -> {ips:.1f} img/s, "
            f"MFU {100 * mfu:.1f}%  (elbo {final_elbo:.2f})",
            file=sys.stderr, flush=True,
        )

    result = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": vs_baseline,
        "img32_equivalent_per_sec": round(ips_32, 1),
        "mfu": round(mfu, 4),
        "flops_per_image": round(flops_per_image, 1),
        "bytes_per_image": round(bytes_per_step / args.batch_size, 1),
        "device": device_kind,
        "peak_flops": peak,
        "config": {
            "preset": args.preset,
            "batch_size": args.batch_size,
            "steps_per_call": spc,
            "timed_steps": args.steps * spc,
            "precision": args.precision,
            "fused": args.fused,
            "conv_pad": args.conv_pad,
            "skip_merge": args.skip_merge,
            "remat": args.remat,
            "bn_stat_samples": args.bn_stat_samples,
        },
    }
    record_last_verified(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
