"""Parallelism: device mesh + sharding for data-parallel training."""

from lvae_tpu.parallel.mesh import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_dp_eval_step",
    "make_dp_train_step",
    "make_mesh",
    "replicated",
    "shard_batch",
]
