"""Data-dependent initialization.

Replaces boilr's ``--data-dep-init`` (SURVEY.md §2.2: "rescale conv
weights from first-batch activation stats"). Runs BEFORE jit'd training
as a pure params -> params transform (SURVEY.md §7 hard part 3):

Sequential scheme (a la Salimans & Kingma weight-norm init, which boilr's
hook-based version implements): walk the convolutions in execution order;
for each, run a forward on a real batch, rescale that conv's kernel by
1/std and shift its bias by -mean/std (per output channel). Processing
them in order is essential — rescaling all convs at once from one
forward's statistics compounds upstream growth multiplicatively and
overflows ``exp(0.5 * log_var)`` in the stochastic layers. One forward
per conv; the jitted capture program is compiled once and reused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.traverse_util import flatten_dict, unflatten_dict


def _is_conv(mdl, method_name: str) -> bool:
    return isinstance(mdl, (nn.Conv, nn.ConvTranspose)) and method_name == "__call__"


# Convs whose initialization is INTENTIONAL and must survive the rescale:
# the stochastic blocks' Gaussian parameter heads (near-zero normal(1e-2)
# init is the deep-ladder stability fix — models/stochastic.py: q ~= p ~=
# N(0,1) at step 0 so the initial KL is ~0) and the likelihood head's
# param_conv (same argument for the output distribution). With per-channel
# std ~1e-2 the max_gain=10 clamp would blow exactly these up 10x
# (VERDICT round 2 weak #5).
_EXCLUDED_CONVS = ("conv_in_p", "conv_in_q", "param_conv")


def data_dependent_init(
    model,
    variables: dict,
    x: jnp.ndarray,
    rngs: dict,
    n_iter: int = 1,
    eps: float = 1e-6,
    max_gain: float = 10.0,
) -> dict:
    """Return `variables` with conv params rescaled from activation stats.

    `max_gain` bounds each conv's rescale factor (dead-channel guard).
    The deliberately near-zero-initialized Gaussian/likelihood parameter
    heads are excluded (see ``_EXCLUDED_CONVS``).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    mutable = ["intermediates"] + (["batch_stats"] if batch_stats else [])

    @jax.jit
    def capture(params):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        _, mut = model.apply(
            vs, x, train=True, rngs=rngs, mutable=mutable,
            capture_intermediates=_is_conv,
        )
        return mut["intermediates"]

    # Conv paths in execution order: flax records intermediates in call
    # order, but jit SORTS dict keys when flattening pytrees — so the
    # ordering must come from one unjitted apply, not from `capture`.
    vs0 = dict({"params": params}, **({"batch_stats": batch_stats} if batch_stats else {}))
    _, mut0 = model.apply(
        vs0, x, train=True, rngs=rngs, mutable=mutable,
        capture_intermediates=_is_conv,
    )
    conv_paths = [
        p[:-1]
        for p in flatten_dict(mut0["intermediates"]).keys()
        if not any(comp in _EXCLUDED_CONVS for comp in p)
    ]

    for _ in range(n_iter):
        for conv_path in conv_paths:
            inter = flatten_dict(capture(params))
            out = inter[conv_path + ("__call__",)][0]
            mean = jnp.mean(out, axis=tuple(range(out.ndim - 1)))
            std = jnp.clip(
                jnp.std(out, axis=tuple(range(out.ndim - 1))),
                1.0 / max_gain,
                max_gain,
            ) + eps
            flat_params = flatten_dict(params)
            kpath = conv_path + ("kernel",)
            bpath = conv_path + ("bias",)
            if kpath not in flat_params:
                continue
            flat_params[kpath] = flat_params[kpath] / std
            if bpath in flat_params:
                flat_params[bpath] = (flat_params[bpath] - mean) / std
            params = unflatten_dict(flat_params)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
