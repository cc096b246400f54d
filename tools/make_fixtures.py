#!/usr/bin/env python
"""Generate offline stand-in files for every file-backed dataset.

This box has no network (SURVEY.md §0), so the real MNIST / CIFAR-10 /
SVHN / CelebA / multiobject files cannot be fetched. This tool writes
SYNTHETIC stand-ins (deterministic blob images — obviously not the real
data) in the exact on-disk formats the loaders parse, under the same
"drop files here" layout `tools/fetch_data.py` documents:

    data/static_mnist/binarized_mnist_{train,valid,test}.amat
    data/mnist/{train,t10k}-images-idx3-ubyte
    data/cifar10/cifar-10-batches-py/{data_batch_1..5,test_batch}
    data/svhn/{train,test}_32x32.mat
    data/celeba/celeba_64.npz                      (preprocessed cache)
    data/multiobject/dsprites/multi_dsprites_color_012.npz
    data/multiobject/binary_mnist/multi_binary_mnist_012.npz

Purpose: drive every parser (including the C++ .amat fast path) and every
`--dataset <name>` CLI path end-to-end without the real files. Quality
numbers from fixture runs demonstrate the pipeline, never reference
parity. Usage:

    python tools/make_fixtures.py [--data-dir ./data] [--n 2048]
"""

import argparse
import os
import pickle
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.data.sources import make_synthetic  # noqa: E402


def _blobs(n, img, channels, binary, seed):
    a, b = make_synthetic(
        n_train=n, n_test=0, img=img, channels=channels, binary=binary,
        seed=seed,
    )
    return a


def write_static_mnist(d, n):
    """Larochelle .amat: ASCII 0/1 floats, one 784-dim row per image."""
    os.makedirs(d, exist_ok=True)
    for split, count, seed in (("train", n, 1), ("valid", n // 4, 2),
                               ("test", n // 4, 3)):
        x = _blobs(count, 28, 1, True, seed).reshape(count, 784)
        path = os.path.join(d, f"binarized_mnist_{split}.amat")
        with open(path, "w") as f:
            for row in x:
                f.write(" ".join("1" if v else "0" for v in row))
                f.write("\n")
        yield path


def write_idx(path, x):
    """MNIST idx3-ubyte: big-endian magic 2051, n, rows, cols, raw bytes."""
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w))
        f.write(x.tobytes())


def write_mnist(d, n):
    os.makedirs(d, exist_ok=True)
    for name, count, seed in (("train-images-idx3-ubyte", n, 4),
                              ("t10k-images-idx3-ubyte", n // 4, 5)):
        x = _blobs(count, 28, 1, False, seed)[..., 0]
        path = os.path.join(d, name)
        write_idx(path, x)
        yield path


def write_cifar10(d, n):
    """cifar-10-batches-py pickles: dict with 'data' uint8 [N, 3072]
    laid out channel-major (N, 3, 32, 32)."""
    os.makedirs(d, exist_ok=True)
    per = max(n // 5, 2)
    for i in range(1, 6):
        x = _blobs(per, 32, 3, False, 10 + i)
        flat = x.transpose(0, 3, 1, 2).reshape(per, -1)
        path = os.path.join(d, f"data_batch_{i}")
        with open(path, "wb") as f:
            pickle.dump({"data": flat}, f)
        yield path
    x = _blobs(max(n // 4, 2), 32, 3, False, 16)
    flat = x.transpose(0, 3, 1, 2).reshape(len(x), -1)
    path = os.path.join(d, "test_batch")
    with open(path, "wb") as f:
        pickle.dump({"data": flat}, f)
    yield path


def write_svhn(d, n):
    """SVHN .mat with X stored (32, 32, 3, N)."""
    from scipy.io import savemat

    os.makedirs(d, exist_ok=True)
    for name, count, seed in (("train_32x32.mat", n, 20),
                              ("test_32x32.mat", n // 4, 21)):
        x = _blobs(count, 32, 3, False, seed).transpose(1, 2, 3, 0)
        path = os.path.join(d, name)
        savemat(path, {"X": x})
        yield path


def write_celeba(d, n):
    """Preprocessed celeba_64.npz cache (the loader's preferred input)."""
    os.makedirs(d, exist_ok=True)
    train = _blobs(n, 64, 3, False, 30)
    test = _blobs(max(n // 4, 2), 64, 3, False, 31)
    path = os.path.join(d, "celeba_64.npz")
    np.savez_compressed(path, train=train, test=test)
    yield path


def write_multiobject(root, n):
    """multiobject-package-style npz: 'x' images + per-object metadata
    (only 'x' is consumed by the experiment — SURVEY.md §2.3)."""
    for sub, fname, img, ch, seed in (
        ("dsprites", "multi_dsprites_color_012.npz", 64, 3, 40),
        ("binary_mnist", "multi_binary_mnist_012.npz", 48, 1, 41),
    ):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        # 0-2 "objects" per image: sum several blob fields, then binarize —
        # shape statistics resemble the real sets (sparse white sprites)
        parts = [
            _blobs(n, img, ch, False, seed + k).astype(np.uint16)
            for k in range(3)
        ]
        mask = np.random.default_rng(seed).integers(0, 2, size=(3, n, 1, 1, 1))
        x = ((sum(m * p for m, p in zip(mask, parts)) > 127)).astype(np.uint8)
        n_obj = mask[:, :, 0, 0, 0].sum(axis=0).astype(np.int64)
        path = os.path.join(d, fname)
        np.savez_compressed(path, x=x, n_obj=n_obj)
        yield path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="./data")
    p.add_argument("--n", type=int, default=2048,
                   help="train images per dataset (test splits are n/4)")
    p.add_argument("--only", nargs="*", default=None,
                   choices=["static_mnist", "mnist", "cifar10", "svhn",
                            "celeba", "multiobject"])
    args = p.parse_args(argv)
    root = args.data_dir

    jobs = {
        "static_mnist": lambda: write_static_mnist(
            os.path.join(root, "static_mnist"), args.n),
        "mnist": lambda: write_mnist(os.path.join(root, "mnist"), args.n),
        "cifar10": lambda: write_cifar10(
            os.path.join(root, "cifar10", "cifar-10-batches-py"), args.n),
        "svhn": lambda: write_svhn(os.path.join(root, "svhn"), args.n),
        "celeba": lambda: write_celeba(os.path.join(root, "celeba"), args.n),
        "multiobject": lambda: write_multiobject(
            os.path.join(root, "multiobject"), args.n),
    }
    for name, job in jobs.items():
        if args.only and name not in args.only:
            continue
        for path in job():
            print(f"wrote {path} ({os.path.getsize(path):,} bytes)")
    print(
        "\nNOTE: these are synthetic stand-ins for pipeline/parser tests — "
        "replace with the real files for reference-parity runs."
    )


if __name__ == "__main__":
    main()
