#!/usr/bin/env python
"""Long-horizon parity-drift measurement: lvae_tpu vs the torch mirror
(VERDICT r4 next #1). Runs the shared-eps stochastic trajectory at
flagship scale on CPU and reports the terminal |delta test-ELBO| in bpd
against the 0.01-bpd north star (BASELINE.json; SURVEY §6).

    python tools/parity_drift.py --steps 500 --conv-pad same --skip-merge pre
    python tools/parity_drift.py --steps 500 --conv-pad torch --skip-merge post

Results are recorded in RESULTS.md (round 5). The slow-tier CI version
(reduced width, same depth/semantics) is
tests/test_parity.py::TestLongHorizonDrift.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--zdims", type=int, nargs="+", default=[32, 32, 32])
    p.add_argument("--n-filters", type=int, default=64)
    p.add_argument("--blocks-per-layer", type=int, default=2)
    p.add_argument("--conv-pad", default="same", choices=["same", "torch"])
    p.add_argument("--skip-merge", default="pre", choices=["pre", "post"])
    p.add_argument("--freebits", type=float, default=0.5)
    p.add_argument("--beta-anneal", type=int, default=200)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--n-eval", type=int, default=256)
    p.add_argument("--eval-eps", type=int, default=4)
    p.add_argument("--json", action="store_true", help="print result JSON")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # mirror runs on CPU; keep
    # both sides on the same host so the comparison is conv-roundoff, not
    # tunnel noise

    from lvae_tpu.cache import enable_persistent_cache

    enable_persistent_cache()  # flagship-scale CPU compiles take minutes
    # on this 1-core box; cache them so reruns/restarts skip straight to
    # stepping

    from tests.drift_harness import run_drift

    r = run_drift(
        steps=args.steps, batch=args.batch, zdims=tuple(args.zdims),
        n_filters=args.n_filters, blocks_per_layer=args.blocks_per_layer,
        conv_pad=args.conv_pad, skip_merge=args.skip_merge,
        free_bits=args.freebits, beta_anneal=args.beta_anneal, lr=args.lr,
        seed=args.seed, eval_every=args.eval_every, n_eval=args.n_eval,
        eval_eps=args.eval_eps,
        progress=lambda s: print(s, flush=True),
    )
    print(
        f"\nterminal ({r['steps']} steps, {args.conv_pad}-{args.skip_merge}): "
        f"test-ELBO jax {r['elbo_jax']:.4f} ({r['bpd_jax']:.5f} bpd)  "
        f"torch {r['elbo_torch']:.4f} ({r['bpd_torch']:.5f} bpd)  "
        f"|drift| {r['drift_bpd']:.6f} bpd  "
        f"[target <<0.01; wall {r['wall_s']:.0f}s]", flush=True,
    )
    if args.json:
        r2 = dict(r)
        r2["config"] = dict(r["config"])
        print(json.dumps(r2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
