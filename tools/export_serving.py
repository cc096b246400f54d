#!/usr/bin/env python
"""Export a trained run's serving surfaces to portable StableHLO artifacts.

    python tools/export_serving.py --load <run-name> [--platforms tpu cpu]

Writes ``<run_dir>/serving/{generate,reconstruct}.jaxexport`` +
``manifest.json``. The artifacts embed the weights and the full compiled
computation; a serving process needs only JAX to load them:

    from lvae_tpu.serving import load_artifact   # or inline jax.export
    gen = load_artifact("<run_dir>/serving/generate.jaxexport")
    images = gen.call(np.int32(0))

See lvae_tpu/serving.py for the surface contracts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--load", required=True, help="run name (or full run dir)")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--what", nargs="+",
                   default=["generate", "reconstruct", "encode"],
                   choices=["generate", "reconstruct", "encode"])
    p.add_argument("--artifact-dir", default=None,
                   help="where to write (default: <run_dir>/serving)")
    p.add_argument("--nimages", type=int, default=64,
                   help="batch size baked into the generate surface")
    p.add_argument("--temperature", type=float, nargs="+", default=None,
                   help="prior sampling temperature(s) baked into generate")
    p.add_argument("--mode-layers", type=int, nargs="*", default=[])
    p.add_argument("--constant-layers", type=int, nargs="*", default=[])
    p.add_argument("--batch", type=int, default=None,
                   help="pin reconstruct's batch dim (default: symbolic — "
                        "one artifact serves any batch size)")
    p.add_argument("--platforms", nargs="+", default=None,
                   choices=["tpu", "cpu", "cuda", "rocm"],
                   help="lowering platforms (default: current backend); "
                        "multiple values make one cross-platform artifact")
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the JAX backend for the export process itself")
    p.add_argument("--check", action="store_true",
                   help="deserialize each artifact and smoke-call it on the "
                        "current backend after writing")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from lvae_tpu.config import apply_platform

    apply_platform(args.platform)
    from lvae_tpu.cache import enable_persistent_cache

    enable_persistent_cache()
    from lvae_tpu.serving import export_run, load_artifact

    run_dir = args.load if os.path.isdir(args.load) else os.path.join(
        args.output_dir, args.load
    )
    if args.temperature is None:
        temperature = 1.0
    elif len(args.temperature) == 1:
        temperature = args.temperature[0]
    else:
        temperature = tuple(args.temperature)

    arts = export_run(
        run_dir,
        what=args.what,
        step=args.step,
        out_dir=args.artifact_dir,
        n_images=args.nimages,
        temperature=temperature,
        mode_layers=args.mode_layers,
        constant_layers=args.constant_layers,
        batch=args.batch,
        platforms=args.platforms,
    )
    for name, path in arts.paths.items():
        print(f"wrote {name}: {path} ({os.path.getsize(path):,} bytes)")

    if args.check:
        import numpy as np

        h, w, c = arts.manifest["img_shape"]
        if "generate" in arts.paths:
            out = load_artifact(arts.paths["generate"]).call(np.int32(0))
            print(f"check generate: out {out.shape} "
                  f"finite={bool(np.isfinite(np.asarray(out)).all())}")
        if "reconstruct" in arts.paths:
            b = args.batch or 2
            x = np.zeros((b, h, w, c), np.uint8)
            idx = np.arange(b, dtype=np.int32)
            out = load_artifact(arts.paths["reconstruct"]).call(
                x, np.int32(0), idx
            )
            print(f"check reconstruct: out_mean {out['out_mean'].shape} "
                  f"bpd[0]={float(np.asarray(out['bpd'])[0]):.4f}")
        if "encode" in arts.paths:
            b = args.batch or 2
            x = np.zeros((b, h, w, c), np.uint8)
            idx = np.arange(b, dtype=np.int32)
            out = load_artifact(arts.paths["encode"]).call(x, np.int32(0), idx)
            shapes = [tuple(m.shape) for m in out["mu"]]
            print(f"check encode: mu shapes {shapes}")


if __name__ == "__main__":
    main()
