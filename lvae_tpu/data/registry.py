"""Dataset registry: name -> arrays + metadata + preprocessing spec.

TPU-native replacement for the reference's ``experiment/data.py``
``DatasetLoader`` (SURVEY.md §2.1): selects a dataset by name, exposes
``img_size`` / ``color_ch`` / default likelihood, and declares which
*on-device* preprocessing the training step must apply (the reference did
binarization/dequantization on host CPU workers; here it fuses into the
jit'd step — SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np

from lvae_tpu.data import sources

# on-device preprocessing modes (applied inside the jit'd train step)
PREPROCESS_NONE = "none"              # data already in final [0,1] form
PREPROCESS_BINARIZE = "binarize"      # dynamic: x ~ Bernoulli(u8/255) per step
PREPROCESS_DEQUANTIZE = "dequantize"  # uniform: (u8 + u)/256, u ~ U[0,1)


@dataclasses.dataclass(frozen=True)
class DatasetBundle:
    """Everything the experiment needs to know about a dataset."""

    name: str
    train: np.ndarray               # uint8 NHWC
    test: np.ndarray                # uint8 NHWC
    img_size: Tuple[int, int]       # native data resolution
    padded_size: Tuple[int, int]    # model resolution (pow-2 friendly)
    color_ch: int
    preprocess: str                 # one of the PREPROCESS_* modes
    default_likelihood: str

    @property
    def data_shape(self) -> Tuple[int, int, int]:
        return (*self.img_size, self.color_ch)


def _padded(hw: int) -> int:
    """Smallest power-of-two >= hw (28 -> 32, 32 -> 32, 64 -> 64)."""
    p = 1
    while p < hw:
        p *= 2
    return p


DATASETS = (
    "static_mnist",
    "mnist",
    "cifar10",
    "svhn",
    "celeba",
    "multi_dsprites_binary_rgb",
    "multi_mnist_binary",
    "synthetic",
    "synthetic_rgb",
    "synthetic_celeba",
)

# (img_size, padded_size, color_ch, preprocess, default_likelihood) for the
# datasets whose shapes are fixed by the reference (the multiobject npz
# shapes come from their files). SVHN uses the plain single-component
# discretized logistic per BASELINE.json config 3.
_META = {
    "static_mnist": ((28, 28), (32, 32), 1, PREPROCESS_NONE, "bernoulli"),
    "mnist": ((28, 28), (32, 32), 1, PREPROCESS_BINARIZE, "bernoulli"),
    "cifar10": ((32, 32), (32, 32), 3, PREPROCESS_DEQUANTIZE,
                "discretized_logistic_mix"),
    "svhn": ((32, 32), (32, 32), 3, PREPROCESS_DEQUANTIZE,
             "discretized_logistic"),
    "celeba": ((64, 64), (64, 64), 3, PREPROCESS_DEQUANTIZE,
               "discretized_logistic_mix"),
    "synthetic": ((28, 28), (32, 32), 1, PREPROCESS_NONE, "bernoulli"),
    "synthetic_rgb": ((32, 32), (32, 32), 3, PREPROCESS_DEQUANTIZE,
                      "discretized_logistic"),
    # CelebA-shaped fixture (BASELINE config 5 offline): 64x64 RGB with the
    # celeba metadata triple, so `--dataset synthetic_celeba` exercises the
    # exact model/preprocess/likelihood a real CelebA run would use.
    "synthetic_celeba": ((64, 64), (64, 64), 3, PREPROCESS_DEQUANTIZE,
                         "discretized_logistic_mix"),
}


def stub_bundle(name: str, n: int = 8) -> DatasetBundle:
    """Metadata-faithful bundle with tiny random arrays and NO disk access.

    For uses where only shapes / preprocess / likelihood matter — model
    construction for checkpoint conversion (tools/convert_torch_checkpoint),
    compile-only dry runs — without requiring the dataset files.
    """
    if name not in _META:
        raise ValueError(
            f"no static metadata for {name!r} (multiobject shapes come from "
            f"their npz files); choose from {sorted(_META)}"
        )
    img, padded, ch, pre, lik = _META[name]
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(n, *img, ch), dtype=np.uint8)
    return DatasetBundle(name, arr, arr, img, padded, ch, pre, lik)


def bench_preset(preset: str, n_train: int):
    """(bundle, zdims, downsample) for the synthetic benchmark/profiling
    presets shared by ``bench.py`` and ``tools/profile_step.py`` — one
    source of truth so the profiled model is always the benchmarked one.
    'mnist' is the flagship 28x28 Bernoulli config; 'celeba64' is BASELINE
    config 5 (64x64 RGB, 4 stochastic layers, logistic-mixture head);
    'cifar10-deep' is BASELINE config 4 (32x32 RGB, 10 stochastic layers
    at scales 16/8/4/2, logistic-mixture head)."""
    rng = np.random.default_rng(0)
    if preset == "cifar10-deep":
        train = rng.integers(0, 256, size=(n_train, 32, 32, 3), dtype=np.uint8)
        bundle = DatasetBundle(
            "bench", train, train[:256], (32, 32), (32, 32), 3,
            PREPROCESS_DEQUANTIZE, "discretized_logistic_mix",
        )
        # 10 rungs: three at 16x16, three at 8x8, three at 4x4, one at 2x2
        return bundle, (32,) * 10, (0, 0, 1, 0, 0, 1, 0, 0, 1, 0)
    if preset == "celeba64":
        train = rng.integers(0, 256, size=(n_train, 64, 64, 3), dtype=np.uint8)
        bundle = DatasetBundle(
            "bench", train, train[:256], (64, 64), (64, 64), 3,
            PREPROCESS_DEQUANTIZE, "discretized_logistic_mix",
        )
        return bundle, (32, 32, 32, 32), (1, 1, 1, 1)
    if preset == "mnist":
        train = (rng.uniform(size=(n_train, 28, 28, 1)) < 0.5).astype(np.uint8)
        bundle = DatasetBundle(
            "bench", train, train[:256], (28, 28), (32, 32), 1,
            PREPROCESS_NONE, "bernoulli",
        )
        return bundle, (32, 32, 32), (1, 1, 1)
    raise ValueError(f"unknown bench preset {preset!r}")


def load_dataset(name: str, data_dir: str = "./data") -> DatasetBundle:
    """Build the :class:`DatasetBundle` for a dataset name.

    Mirrors the reference's dataset names (SURVEY.md §2.1 experiment/data.py:
    static_mnist, mnist (dynamic binarization), cifar10, svhn, celeba,
    multi_dsprites_binary_rgb, multi_mnist_binary) plus offline-friendly
    synthetic fixtures."""
    loaders = {
        "static_mnist": sources.load_static_mnist,
        "mnist": sources.load_mnist,
        "cifar10": sources.load_cifar10,
        "svhn": sources.load_svhn,
        "celeba": sources.load_celeba,
    }
    if name in loaders:
        train, test = loaders[name](data_dir)
        return DatasetBundle(name, train, test, *_META[name])
    if name == "multi_dsprites_binary_rgb":
        path = os.path.join(
            data_dir, "multiobject", "dsprites", "multi_dsprites_color_012.npz"
        )
        train, test = sources.load_multiobject_npz(path)
        hw = train.shape[1]
        return DatasetBundle(
            name, train, test, (hw, hw), (_padded(hw),) * 2, train.shape[-1],
            PREPROCESS_NONE, "bernoulli",
        )
    if name == "multi_mnist_binary":
        path = os.path.join(
            data_dir, "multiobject", "binary_mnist", "multi_binary_mnist_012.npz"
        )
        train, test = sources.load_multiobject_npz(path)
        hw = train.shape[1]
        return DatasetBundle(
            name, train, test, (hw, hw), (_padded(hw),) * 2, train.shape[-1],
            PREPROCESS_NONE, "bernoulli",
        )
    base, _, size = name.partition(":")
    if base in ("synthetic", "synthetic_rgb", "synthetic_celeba"):
        # Optional ':N' suffix sets the train-split size (test = N//4,
        # capped at 1024), e.g. 'synthetic_rgb:16384' for scale runs that
        # would overfit the 512-image default. Offline-only fixture names,
        # so the suffix never collides with a reference dataset spelling.
        if size:
            try:
                n_train = int(size)
            except ValueError:
                n_train = 0
            if n_train <= 0:
                raise ValueError(
                    f"bad size suffix {size!r} in {name!r}: the synthetic "
                    "fixtures take 'name:N' with a positive integer N of "
                    "train images, e.g. 'synthetic_rgb:16384'"
                ) from None
        else:
            n_train = 512
        n_test = min(max(n_train // 4, 128), 1024)
        train, test = sources.make_synthetic(
            n_train=n_train, n_test=n_test,
            img=_META[base][0][0],
            channels=1 if base == "synthetic" else 3,
            binary=base == "synthetic",
        )
        return DatasetBundle(name, train, test, *_META[base])
    raise ValueError(f"unknown dataset {name!r}; choose from {DATASETS}")
