"""Model zoo: the Ladder VAE and its building blocks."""

from lvae_tpu.models.blocks import (
    GateLayer,
    MergeLayer,
    ResBlockWithResampling,
    ResidualBlock,
)
from lvae_tpu.models.likelihoods import (
    LIKELIHOODS,
    make_likelihood,
    sample_from_likelihood,
)
from lvae_tpu.models.lvae import LadderVAE, TopDownLayer
from lvae_tpu.models.stochastic import NormalStochasticBlock

__all__ = [
    "GateLayer",
    "MergeLayer",
    "ResBlockWithResampling",
    "ResidualBlock",
    "LIKELIHOODS",
    "make_likelihood",
    "sample_from_likelihood",
    "LadderVAE",
    "TopDownLayer",
    "NormalStochasticBlock",
]
