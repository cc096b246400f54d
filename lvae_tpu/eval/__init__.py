"""Evaluation: importance-weighted log-likelihood, image grids."""

from lvae_tpu.eval.viz import make_grid, save_image_grid

__all__ = ["make_grid", "save_image_grid"]
