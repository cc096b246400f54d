#!/usr/bin/env python
"""Download the reference's datasets into the offline drop-in layout.

This box has NO network access (SURVEY.md §0) — here this script prints
the layout and exits with a clear error. On a machine with egress it
fetches each dataset into the structure `lvae_tpu/data/sources.py`
expects:

    python tools/fetch_data.py --data-dir ./data static_mnist mnist cifar10 svhn

CelebA and the multiobject npz files have no stable public direct-download
URLs (Google Drive / generated artifacts) and must be placed manually.
"""

import argparse
import gzip
import os
import shutil
import sys
import urllib.request

DATASETS = {
    "static_mnist": [
        # Larochelle's binarized MNIST split (amat text files)
        (
            "http://www.cs.toronto.edu/~larocheh/public/datasets/binarized_mnist/binarized_mnist_train.amat",
            "static_mnist/binarized_mnist_train.amat",
        ),
        (
            "http://www.cs.toronto.edu/~larocheh/public/datasets/binarized_mnist/binarized_mnist_valid.amat",
            "static_mnist/binarized_mnist_valid.amat",
        ),
        (
            "http://www.cs.toronto.edu/~larocheh/public/datasets/binarized_mnist/binarized_mnist_test.amat",
            "static_mnist/binarized_mnist_test.amat",
        ),
    ],
    "mnist": [
        (
            "https://storage.googleapis.com/cvdf-datasets/mnist/train-images-idx3-ubyte.gz",
            "mnist/train-images-idx3-ubyte.gz",
        ),
        (
            "https://storage.googleapis.com/cvdf-datasets/mnist/t10k-images-idx3-ubyte.gz",
            "mnist/t10k-images-idx3-ubyte.gz",
        ),
    ],
    "cifar10": [
        (
            "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
            "cifar10/cifar-10-python.tar.gz",
        ),
    ],
    "svhn": [
        ("http://ufldl.stanford.edu/housenumbers/train_32x32.mat", "svhn/train_32x32.mat"),
        ("http://ufldl.stanford.edu/housenumbers/test_32x32.mat", "svhn/test_32x32.mat"),
    ],
}


def fetch(url: str, dest: str) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if os.path.exists(dest):
        print(f"  exists: {dest}")
        return
    print(f"  {url} -> {dest}")
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.rename(tmp, dest)


def postprocess(name: str, data_dir: str) -> None:
    if name == "cifar10":
        import tarfile

        tar = os.path.join(data_dir, "cifar10", "cifar-10-python.tar.gz")
        out = os.path.join(data_dir, "cifar10")
        if os.path.exists(tar) and not os.path.isdir(
            os.path.join(out, "cifar-10-batches-py")
        ):
            with tarfile.open(tar) as t:
                t.extractall(out)
            print("  extracted cifar-10-batches-py/")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="*", default=list(DATASETS),
                   help=f"subset of {sorted(DATASETS)} (default: all)")
    p.add_argument("--data-dir", default="./data")
    args = p.parse_args(argv)
    names = args.datasets or list(DATASETS)

    for name in names:
        if name not in DATASETS:
            sys.exit(f"unknown dataset {name!r}; choose from {sorted(DATASETS)}")
        print(f"[{name}]")
        try:
            for url, rel in DATASETS[name]:
                fetch(url, os.path.join(args.data_dir, rel))
            postprocess(name, args.data_dir)
        except OSError as e:
            print(
                f"  FAILED ({e}). This machine may have no network access - "
                "place the files manually (layout in lvae_tpu/data/sources.py).",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
