#!/usr/bin/env python
"""Train a Ladder VAE (reference: main.py — SURVEY.md §2.1, §3.1).

Example (mirrors the reference README command):

    python main.py --zdims 32 32 32 --downsample 1 1 1 --nonlin elu --skip \
        --blocks-per-layer 4 --gated --freebits 0.5 --learn-top-prior \
        --data-dep-init --seed 42 --dataset static_mnist
"""

from lvae_tpu.cache import enable_persistent_cache
from lvae_tpu.config import config_from_args
from lvae_tpu.train import Experiment, Trainer


def main(argv=None):
    enable_persistent_cache()
    cfg = config_from_args(argv)
    experiment = Experiment(cfg)
    trainer = Trainer(experiment)
    trainer.run()


if __name__ == "__main__":
    main()
