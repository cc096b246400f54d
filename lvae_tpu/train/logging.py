"""Console + TensorBoard logging with the reference's metric names.

Replaces boilr's SummaryWriter plumbing and EMA'd console prints
(SURVEY.md §2.2, §5 "Metrics / logging"): scalars ``elbo/train``,
``elbo/test``, per-layer KL diagnostics ``kl/layer_i``, and image grids.
The EMA itself is computed on device in the train step; this module only
formats and writes already-fetched host values.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import numpy as np


class MetricLogger:
    def __init__(self, run_dir: str, enable_tb: bool = True):
        self.run_dir = run_dir
        self._tb = None
        # multi-host hygiene: metrics are fully replicated (SPMD), so only
        # process 0 writes — N processes printing/TB-writing the same
        # values would interleave consoles and race on the event files
        import jax

        self._primary = jax.process_index() == 0
        if enable_tb and self._primary:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    # ------------------------------------------------------------------
    def log_train(self, step: int, ema: Mapping[str, np.ndarray], images_per_sec: Optional[float] = None) -> str:
        kl_layers = np.asarray(ema["kl_layers"])
        line = (
            f"[train] step {step:>7d}  elbo {float(ema['elbo']):>10.2f}  "
            f"recons {float(ema['ll']):>10.2f}  kl {float(ema['kl']):>8.2f}"
        )
        if images_per_sec is not None:
            line += f"  {images_per_sec:>8.0f} img/s"
        if self._primary:
            print(line, flush=True)
        if self._tb is not None:
            self._tb.add_scalar("elbo/train", float(ema["elbo"]), step)
            self._tb.add_scalar("recons/train", float(ema["ll"]), step)
            self._tb.add_scalar("kl/train", float(ema["kl"]), step)
            self._tb.add_scalar("loss/train", float(ema["loss"]), step)
            for i, v in enumerate(kl_layers):
                self._tb.add_scalar(f"kl/layer_{i}", float(v), step)
            if images_per_sec is not None:
                self._tb.add_scalar("perf/images_per_sec", images_per_sec, step)
        return line

    def log_deferred(self, step: int, images_per_sec: float) -> None:
        """Console-only progress line for ``--defer-metrics`` (no D2H
        readback; the printed rate is a dispatch rate, not execution
        throughput — bench.py is the honest measurement). Single-writer
        like every other log method."""
        if self._primary:
            print(
                f"[train] step {step:>7d}  (metrics deferred)  "
                f"{images_per_sec:>8.0f} img/s dispatched",
                flush=True,
            )

    def log_test(self, step: int, metrics: Mapping[str, float]) -> str:
        line = (
            f"[test ] step {step:>7d}  elbo {metrics['elbo']:>10.2f}  "
            f"recons {metrics['ll']:>10.2f}  kl {metrics['kl']:>8.2f}"
        )
        if "bpd" in metrics:
            line += f"  bpd {metrics['bpd']:.4f}"
        if self._primary:
            print(line, flush=True)
        if self._tb is not None:
            for k, v in metrics.items():
                if np.isscalar(v) or np.ndim(v) == 0:
                    self._tb.add_scalar(f"{k}/test", float(v), step)
        return line

    def log_images(self, tag: str, step: int, grid_hwc: np.ndarray) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, grid_hwc, step, dataformats="HWC")

    def close(self):
        if self._tb is not None:
            self._tb.close()
