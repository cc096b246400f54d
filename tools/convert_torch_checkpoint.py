#!/usr/bin/env python
"""Convert a PyTorch state_dict into a restorable lvae_tpu run directory.

Imports reference-style checkpoints (``torch.save(model.state_dict())`` —
SURVEY.md §2.2 boilr checkpoint save) through the name/layout mapping in
``docs/CHECKPOINT_FORMAT.md`` (implemented in ``lvae_tpu.train.convert``),
producing ``<run-dir>/config.json`` + an orbax checkpoint at step 0 that
``evaluate.py --load <run-dir>`` and ``main.py --load`` can restore.

Usage — model flags are the ordinary main.py flags and must describe the
architecture the state_dict was trained with:

    python tools/convert_torch_checkpoint.py \
        --state-dict ref_model.pt --run-dir output/converted -- \
        --dataset static_mnist --zdims 32 32 32 --downsample 1 1 1 \
        --blocks-per-layer 2 --gated --skip --learn-top-prior

The key translation assumes the documented mirror naming; pass
``--non-strict`` to keep template values for any unmatched leaves (and
report them) when importing a partially compatible state_dict.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--state-dict", required=True,
                   help="torch.save'd state_dict (or checkpoint dict with a "
                        "'state_dict'/'model' entry)")
    p.add_argument("--run-dir", required=True,
                   help="output run directory to create")
    p.add_argument("--non-strict", action="store_true",
                   help="tolerate unmatched leaves (keep fresh-init values)")
    p.add_argument("model_flags", nargs=argparse.REMAINDER,
                   help="main.py model/data flags after '--'")
    args = p.parse_args(argv)

    import torch

    from lvae_tpu.config import config_from_args
    from lvae_tpu.data.registry import stub_bundle
    from lvae_tpu.train import CheckpointManager, Experiment
    from lvae_tpu.train.checkpoint import save_config
    from lvae_tpu.train.convert import torch_state_dict_to_flax

    flags = [f for f in args.model_flags if f != "--"]
    cfg = config_from_args(flags)

    sd = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and not hasattr(sd[key], "shape"):
            sd = sd[key]

    exp = Experiment(cfg, bundle=stub_bundle(cfg.dataset))
    template = exp.init_state()
    params, batch_stats = torch_state_dict_to_flax(
        template.params, template.batch_stats, sd, strict=not args.non_strict
    )
    state = template.replace(params=params, batch_stats=batch_stats)

    os.makedirs(args.run_dir, exist_ok=True)
    save_config(args.run_dir, cfg)
    mngr = CheckpointManager(args.run_dir)
    mngr.save(state, wait=True)
    mngr.close()
    print(f"converted {len(sd)} state_dict entries -> {args.run_dir} (step 0); "
          f"evaluate with: python evaluate.py --load {args.run_dir}")


if __name__ == "__main__":
    main()
