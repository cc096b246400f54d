"""Evaluation: importance-weighted log-likelihood, image grids."""

from lvae_tpu.eval.iwll import evaluate_iwll, make_iwll_step
from lvae_tpu.eval.viz import make_grid, save_image_grid

__all__ = ["evaluate_iwll", "make_iwll_step", "make_grid", "save_image_grid"]
