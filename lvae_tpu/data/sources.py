"""On-disk dataset parsers (host side, run once at startup).

TPU-native replacement for the reference's torchvision / ``lib/datasets.py``
/ ``multiobject`` loading (SURVEY.md §2.1, §2.3): every dataset is parsed
into plain numpy arrays which then become device-resident (see
``lvae_tpu.data.device``). No network access is assumed anywhere — files
must already exist on disk (the box has no egress; SURVEY.md §7 "dataset
acquisition offline"). Expected layout under a ``data_dir`` root:

    static_mnist/binarized_mnist_{train,valid,test}.amat   (Larochelle split)
    mnist/{train,t10k}-images-idx3-ubyte[.gz]              (idx format)
    svhn/{train,test}_32x32.mat                            (scipy.io .mat)
    cifar10/cifar-10-batches-py/{data_batch_*,test_batch}  (python pickles)
    celeba/celeba_64.npz            (preprocessed; or img_align_celeba/*.jpg
                                     + list_eval_partition.txt, converted on
                                     first use via PIL center-crop 148 ->
                                     resize 64, cached to celeba_64.npz)
    multiobject/dsprites/multi_dsprites_color_012.npz      (multiobject pkg)
    multiobject/binary_mnist/multi_binary_mnist_012.npz

All parsers return uint8 arrays NHWC. Binary datasets use values {0, 1}.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Tuple

import numpy as np


def load_amat(path: str) -> np.ndarray:
    """Parse a Larochelle ``binarized_mnist_*.amat`` file: ASCII 0/1 floats,
    one 784-dim row per image (reference lib/datasets.py StaticBinaryMnist).

    Uses the C++ parser from ``native/amat_parser.cpp`` when available
    (~50x faster than numpy text parsing on the 50 MB train split), falling
    back to ``np.loadtxt``."""
    from lvae_tpu.data.native import load_amat_binary

    data = load_amat_binary(path)
    if data is None:
        data = np.loadtxt(path, dtype=np.float32).astype(np.uint8)
    n = data.shape[0]
    return data.reshape(n, 28, 28, 1)


def load_idx_images(path: str) -> np.ndarray:
    """Parse an MNIST idx3-ubyte image file (optionally gzipped)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"{path}: bad idx magic {magic}")
        buf = f.read(n * rows * cols)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n, rows, cols, 1)


def _first_existing(*paths: str) -> str:
    for p in paths:
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"none of the expected dataset files exist: {paths}. "
        "This box has no network access - drop the files there manually "
        "(see lvae_tpu/data/sources.py docstring for the layout)."
    )


def load_static_mnist(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """Static binarized MNIST (Larochelle split). Train = train + valid
    (the reference's evaluation convention uses the test .amat for test).
    Returns (train[60k? 50k+10k], test[10k]) uint8 {0,1} NHWC."""
    d = os.path.join(root, "static_mnist")
    train = load_amat(_first_existing(os.path.join(d, "binarized_mnist_train.amat")))
    valid_path = os.path.join(d, "binarized_mnist_valid.amat")
    if os.path.exists(valid_path):
        train = np.concatenate([train, load_amat(valid_path)], axis=0)
    test = load_amat(_first_existing(os.path.join(d, "binarized_mnist_test.amat")))
    return train, test


def load_mnist(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """Plain MNIST grayscale (for dynamic binarization). uint8 [0,255]."""
    d = os.path.join(root, "mnist")
    train = load_idx_images(
        _first_existing(
            os.path.join(d, "train-images-idx3-ubyte"),
            os.path.join(d, "train-images-idx3-ubyte.gz"),
            os.path.join(d, "raw", "train-images-idx3-ubyte"),
        )
    )
    test = load_idx_images(
        _first_existing(
            os.path.join(d, "t10k-images-idx3-ubyte"),
            os.path.join(d, "t10k-images-idx3-ubyte.gz"),
            os.path.join(d, "raw", "t10k-images-idx3-ubyte"),
        )
    )
    return train, test


def load_cifar10(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """CIFAR-10 python-pickle batches. uint8 [0,255] NHWC."""
    d = os.path.join(root, "cifar10", "cifar-10-batches-py")
    if not os.path.isdir(d):
        d = os.path.join(root, "cifar-10-batches-py")

    def read_batch(p):
        with open(p, "rb") as f:
            entry = pickle.load(f, encoding="latin1")
        return entry["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)

    train = np.concatenate(
        [read_batch(_first_existing(os.path.join(d, f"data_batch_{i}"))) for i in range(1, 6)]
    )
    test = read_batch(_first_existing(os.path.join(d, "test_batch")))
    return train, test


def load_svhn(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """SVHN cropped-digits .mat files. uint8 [0,255] NHWC."""
    from scipy.io import loadmat

    d = os.path.join(root, "svhn")

    def read(p):
        m = loadmat(p)
        # stored as (32, 32, 3, N)
        return np.transpose(m["X"], (3, 0, 1, 2))

    train = read(_first_existing(os.path.join(d, "train_32x32.mat")))
    test = read(_first_existing(os.path.join(d, "test_32x32.mat")))
    return train, test


CELEBA_CROP = 148  # center-crop size before resizing to 64 (SURVEY.md §3.5)


def load_celeba(root: str) -> Tuple[np.ndarray, np.ndarray]:
    """CelebA 64x64: center-crop 148 then resize to 64 (one-time, cached).

    Prefers a preprocessed ``celeba/celeba_64.npz`` with arrays
    ``train``/``test``; otherwise converts ``img_align_celeba/*.jpg`` using
    the official ``list_eval_partition.txt`` split (0=train/1=valid ->
    train, 2 -> test) and writes the cache."""
    d = os.path.join(root, "celeba")
    cache = os.path.join(d, "celeba_64.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["train"], z["test"]

    img_dir = os.path.join(d, "img_align_celeba")
    part_file = os.path.join(d, "list_eval_partition.txt")
    if not os.path.isdir(img_dir):
        raise FileNotFoundError(
            f"need {cache} or {img_dir} (+ list_eval_partition.txt); "
            "no network on this box to download CelebA"
        )
    from PIL import Image

    splits: dict[str, int] = {}
    if os.path.exists(part_file):
        with open(part_file) as f:
            for line in f:
                name, part = line.split()
                splits[name] = int(part)

    train_imgs, test_imgs = [], []
    for name in sorted(os.listdir(img_dir)):
        if not name.lower().endswith((".jpg", ".png")):
            continue
        img = Image.open(os.path.join(img_dir, name))
        w, h = img.size
        left, top = (w - CELEBA_CROP) // 2, (h - CELEBA_CROP) // 2
        img = img.crop((left, top, left + CELEBA_CROP, top + CELEBA_CROP))
        img = img.resize((64, 64), Image.BILINEAR)
        arr = np.asarray(img, dtype=np.uint8)
        if splits.get(name, 0) == 2:
            test_imgs.append(arr)
        else:
            train_imgs.append(arr)
    train = np.stack(train_imgs)
    test = np.stack(test_imgs) if test_imgs else train[:1]
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(cache, train=train, test=test)
    return train, test


def load_multiobject_npz(path: str, test_fraction: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """Load a ``multiobject`` package .npz (images + per-object metadata).

    Only the images are consumed by the LVAE experiment (SURVEY.md §2.3 —
    labels are unused for training). Binary datasets are stored as {0,1}
    or {0,255}; normalized to {0,1}. The last `test_fraction` of images
    becomes the test split (the npz has no official split)."""
    z = np.load(path, allow_pickle=True)
    x = z["x"] if "x" in z.files else z["images"]
    x = np.asarray(x)
    if x.ndim == 3:
        x = x[..., None]
    if x.dtype != np.uint8:
        x = x.astype(np.uint8)
    if x.max() > 1:
        x = (x > 127).astype(np.uint8)
    n_test = max(1, int(len(x) * test_fraction))
    return x[:-n_test], x[-n_test:]


def make_synthetic(
    n_train: int = 512,
    n_test: int = 128,
    img: int = 28,
    channels: int = 1,
    binary: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic data with MNIST-like structure (blobs),
    for tests/CI and offline smoke runs (SURVEY.md §4: no real datasets in
    CI). Returns uint8: {0,1} if binary else [0,255]."""
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    yy, xx = np.mgrid[0:img, 0:img].astype(np.float32)
    cx = rng.uniform(img * 0.25, img * 0.75, size=(n, 1, 1, channels))
    cy = rng.uniform(img * 0.25, img * 0.75, size=(n, 1, 1, channels))
    r = rng.uniform(img * 0.1, img * 0.3, size=(n, 1, 1, channels))
    blob = np.exp(
        -(((xx[None, :, :, None] - cx) ** 2 + (yy[None, :, :, None] - cy) ** 2))
        / (2 * r**2)
    )
    if binary:
        data = (blob > 0.5).astype(np.uint8)
    else:
        data = np.clip(blob * 255, 0, 255).astype(np.uint8)
    return data[:n_train], data[n_train:]
