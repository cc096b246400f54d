#!/usr/bin/env python
"""Export an lvae_tpu run as a reference-style PyTorch state_dict.

The inverse of ``tools/convert_torch_checkpoint.py``: restores a run
directory (``config.json`` + orbax checkpoint) and writes
``torch.save``-format weights keyed and laid out the way the reference's
``model.state_dict()`` is (SURVEY.md §2.2 boilr checkpoint save;
name/layout mapping in ``docs/CHECKPOINT_FORMAT.md``), so a TPU-trained
model can be loaded back into the reference implementation with a strict
``load_state_dict``.

Usage:

    python tools/export_torch_checkpoint.py \
        --load output/<run-name> [--step N] --out ref_model.pt

Runs on the CPU backend by default (no TPU needed to convert weights);
pass ``--platform ''`` to keep the default backend.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--load", required=True,
                   help="run directory (or run name under --output-dir)")
    p.add_argument("--output-dir", default="output",
                   help="where run names are resolved (default: output)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--platform", default="cpu",
                   help="JAX backend for the restore (default cpu; '' keeps "
                        "the default backend)")
    args = p.parse_args(argv)

    from lvae_tpu.config import apply_platform

    apply_platform(args.platform or None)

    import torch

    from lvae_tpu.config import config_from_dict
    from lvae_tpu.train import CheckpointManager, Experiment, load_config_dict
    from lvae_tpu.train.convert import flax_to_torch_state_dict

    run_dir = args.load if os.path.isdir(args.load) else os.path.join(
        args.output_dir, args.load
    )
    cfg = config_from_dict(load_config_dict(run_dir))
    # weight conversion needs neither kernels nor a mesh
    cfg.fused = "none"
    cfg.num_data_shards = 1
    cfg.spatial_shards = 1
    cfg.streaming = False
    exp = Experiment(cfg)
    state = CheckpointManager(run_dir, keep=cfg.keep_checkpoints).restore(
        exp.init_state(data_dep_init=False), step=args.step
    )
    sd = flax_to_torch_state_dict(state.params, state.batch_stats)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(tensors, args.out)
    n_params = sum(
        int(v.numel()) for k, v in tensors.items()
        if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))
    )
    print(
        f"exported {run_dir} step {int(state.step)} -> {args.out} "
        f"({len(tensors)} entries, {n_params:,} parameters)"
    )


if __name__ == "__main__":
    main()
