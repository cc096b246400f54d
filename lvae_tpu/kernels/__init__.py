"""Pallas TPU kernels for the hot elementwise chains.

Each kernel has a pure-XLA reference implementation in ``lvae_tpu.ops``
kept forever as the correctness oracle (SURVEY.md §7 stage 7); tests
compare them allclose. Kernels run in interpreter mode automatically on
non-TPU backends so the same code path is testable on CPU.
"""

from lvae_tpu.kernels.logsumexp_pallas import pallas_logsumexp
from lvae_tpu.kernels.stochastic_pallas import fused_sample_kl

__all__ = ["pallas_logsumexp", "fused_sample_kl"]
