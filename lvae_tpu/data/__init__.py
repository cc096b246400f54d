"""Datasets: on-disk parsers, registry, and the device-resident pipeline."""

from lvae_tpu.data.device import (
    DeviceDataset,
    eval_preprocess_batch,
    fold_in_indices,
    preprocess_batch,
)
from lvae_tpu.data.registry import (
    DATASETS,
    PREPROCESS_BINARIZE,
    PREPROCESS_DEQUANTIZE,
    PREPROCESS_NONE,
    DatasetBundle,
    load_dataset,
)

__all__ = [
    "DeviceDataset",
    "eval_preprocess_batch",
    "fold_in_indices",
    "preprocess_batch",
    "DATASETS",
    "PREPROCESS_BINARIZE",
    "PREPROCESS_DEQUANTIZE",
    "PREPROCESS_NONE",
    "DatasetBundle",
    "load_dataset",
]
