"""Pallas logsumexp over the importance-sample axis.

The reduction at the heart of the IW-LL evaluator (SURVEY.md §2.4
"logsumexp over importance samples"): [k, B] elbo samples -> [B]
``logsumexp`` in one VMEM pass (max + exp + sum + log fused, no
intermediate [k, B] exp materialized in HBM). Columns are tiled over a
1-D grid so arbitrary batch sizes stream through VMEM.

Oracle: ``jax.nn.logsumexp`` / the scan-based online accumulator in
``lvae_tpu.eval.iwll`` (tested allclose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, out_ref):
    x = x_ref[:]
    m = jnp.max(x, axis=0, keepdims=True)
    # guard fully -inf columns (padding or fully-masked samples):
    # exp(-inf - -inf) is NaN, and so is 0 * (safe_m + log(0)); select the
    # -inf fallback with where instead of arithmetic masking.
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(x - safe_m), axis=0, keepdims=True)
    out_ref[:] = jnp.where(jnp.isfinite(m), safe_m + jnp.log(s), -jnp.inf)


def _lse_impl(x: jnp.ndarray, block_cols: int) -> jnp.ndarray:
    k, b = x.shape
    nblk = pl.cdiv(b, block_cols)
    pad = nblk * block_cols - b
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, nblk * block_cols), x.dtype),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (k, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, block_cols), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x)
    return out[0, :b]


# ---------------------------------------------------------------------------
# SPMD partitioning: the reduction runs over axis 0 (the k importance
# samples) independently per column, so the op shards freely over B —
# each device reduces its local columns with zero communication — while
# the k axis must replicate. Registered for both partitioners (Shardy
# sharding_rule + GSPMD callbacks), same pattern as
# kernels/mixture_pallas.py; without this the sharded IW-LL eval step
# could not use the kernel at all (a bare pallas_call is opaque to the
# SPMD partitioner and its operands would replicate).
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _col_spec(sharding):
    spec = tuple(sharding.spec) + (None, None)
    return spec[1]


def _lse_infer(block_cols, mesh, arg_shapes, result_shape):
    xs = arg_shapes[0].sharding
    return NamedSharding(xs.mesh, PartitionSpec(_col_spec(xs)))


def _lse_partition(block_cols, mesh, arg_shapes, result_shape):
    xs = arg_shapes[0].sharding
    col = _col_spec(xs)
    m = xs.mesh
    args = (NamedSharding(m, PartitionSpec(None, col)),)
    res = NamedSharding(m, PartitionSpec(col))

    def lower_fn(x):
        return _lse_impl(x, block_cols)

    return m, lower_fn, res, args


_lse_cp = custom_partitioning(_lse_impl, static_argnums=(1,))
_lse_cp.def_partition(
    partition=_lse_partition,
    infer_sharding_from_operands=_lse_infer,
    sharding_rule="k b -> b",
    need_replication_factors=("k",),
)


def pallas_logsumexp(x: jnp.ndarray, block_cols: int = 512) -> jnp.ndarray:
    """logsumexp over axis 0 of a 2-D [k, B] array -> [B]. Shards over B
    on any mesh (see the partitioning note above)."""
    if x.ndim != 2:
        raise ValueError(f"expected [k, B], got shape {x.shape}")
    return _lse_cp(x, block_cols)
