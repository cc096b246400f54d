"""Fused stochastic-block kernel: on-core RNG + reparameterization + KL.

The Pallas fusion target from SURVEY.md §3.4 / BASELINE.json: the
elementwise chain between the (mu, log_var) conv projections and the
latent injection —

    sigma_q = exp(0.5 lvq); eps ~ N(0,1); z = muq + sigma_q * eps
    kl = 0.5 (e^{lvq-lvp} + (muq-mup)^2 e^{-lvp} - 1 - lvq + lvp)

— executed in ONE VMEM pass per latent tensor. Versus the XLA path this
(a) generates the Gaussian noise on-core via the TPU PRNG + Box–Muller
(no threefry kernel, no eps round-trip through HBM), and (b) carries a
hand-written elementwise VJP so the backward pass is a single fused
kernel too (cotangents of z and kl -> all four parameter grads), with
only the four parameter maps + the recovered eps as residuals.

The convs themselves stay in XLA where they tile onto the MXU. The
pure-XLA oracle lives in ``lvae_tpu.ops.stochastic``; tests assert the
KL matches exactly and the z stream is distributionally correct (the
PRNG stream necessarily differs from jax.random's threefry).

Kernels run with ``interpret=True`` off-TPU so CPU CI exercises the same
code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits -> uniform in (0, 1]: top 24 bits scaled, never zero.

    Mosaic has no uint32->f32 cast; the 24-bit value is bitcast to int32
    (always positive) and converted from there."""
    i24 = pltpu.bitcast(
        jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
    )
    return (i24.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)


def _kl_terms(qmu, qlv, pmu, plv):
    return 0.5 * (
        jnp.exp(qlv - plv) + (qmu - pmu) ** 2 * jnp.exp(-plv) - 1.0 - qlv + plv
    )


_GOLDEN32 = -1640531527  # 0x9E3779B9 (splitmix/Weyl increment) as int32


def _fwd_kernel(seed_ref, qmu_ref, qlv_ref, pmu_ref, plv_ref, z_ref, kl_ref):
    """On-TPU path: Gaussian noise generated on-core (PRNG + Box-Muller).

    Seeding uses BOTH 32-bit words of the jax.random key, with the grid
    block id mixed in MULTIPLICATIVELY (Weyl sequence, pid * 0x9E3779B9)
    rather than added — so per-block streams of different calls are not
    integer shifts of one another (an additive ``seed + program_id``
    would alias block b of call s with block b+1 of call s-1; ADVICE r1).
    Mosaic's ``prng_seed`` accepts at most TWO operands on hardware —
    passing program_id as a third compiled in interpret mode but fails
    on the chip ("Setting seed with more than 2 values is not
    supported"), hence the explicit two-word mix."""
    pid = pl.program_id(0)
    pltpu.prng_seed(
        seed_ref[0] ^ (pid * _GOLDEN32),
        seed_ref[1] ^ ((pid + 1) * 1327217885),  # distinct odd constant
    )
    shape = qmu_ref.shape
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)

    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    z_ref[:] = qmu + jnp.exp(0.5 * qlv) * eps
    kl_ref[:] = _kl_terms(qmu, qlv, pmu, plv)


def _fwd_eps_kernel(eps_ref, qmu_ref, qlv_ref, pmu_ref, plv_ref, z_ref, kl_ref):
    """Off-TPU (interpret) path: eps precomputed by jax.random — the TPU
    interpreter's prng_random_bits returns zeros, so CI feeds real noise
    through the same fused math instead."""
    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    z_ref[:] = qmu + jnp.exp(0.5 * qlv) * eps_ref[:]
    kl_ref[:] = _kl_terms(qmu, qlv, pmu, plv)


def _bwd_kernel(qmu_ref, qlv_ref, pmu_ref, plv_ref, eps_ref, gz_ref, gkl_ref,
                dqmu_ref, dqlv_ref, dpmu_ref, dplv_ref):
    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    eps, gz, gkl = eps_ref[:], gz_ref[:], gkl_ref[:]

    diff = qmu - pmu
    inv_pvar = jnp.exp(-plv)
    var_ratio = jnp.exp(qlv - plv)
    sigma_q = jnp.exp(0.5 * qlv)

    # z = qmu + sigma_q * eps ;  kl = 0.5(var_ratio + diff^2 inv_pvar - 1 - qlv + plv)
    dqmu_ref[:] = gz + gkl * diff * inv_pvar
    dqlv_ref[:] = gz * 0.5 * sigma_q * eps + gkl * 0.5 * (var_ratio - 1.0)
    dpmu_ref[:] = -gkl * diff * inv_pvar
    dplv_ref[:] = gkl * 0.5 * (1.0 - var_ratio - diff * diff * inv_pvar)


# Elementwise tiling: everything is flattened to (rows, _LANES) and
# streamed through VMEM in (_BLOCK_ROWS, _LANES) blocks — bounded VMEM
# footprint for any tensor size (full-array specs OOM scoped vmem for
# production batch sizes).
_LANES = 1024          # 8 fp32 sublanes x 128 lanes
_BLOCK_ROWS = 256


def _to_tiles(x: jnp.ndarray):
    n = x.size
    rows = pl.cdiv(n, _LANES)
    pad = rows * _LANES - n
    flat = x.reshape(-1)
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(rows, _LANES)


def _from_tiles(t: jnp.ndarray, shape, n: int):
    return t.reshape(-1)[:n].reshape(shape)


def _tiled_specs(n_tensors: int, rows: int):
    block = (min(_BLOCK_ROWS, rows), _LANES)
    spec = pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM)
    return [spec] * n_tensors, pl.cdiv(rows, block[0])


def _run_fwd(key: jax.Array, qmu, qlv, pmu, plv):
    shape, n = qmu.shape, qmu.size
    tiles = [_to_tiles(t) for t in (qmu, qlv, pmu, plv)]
    rows = tiles[0].shape[0]
    specs, grid = _tiled_specs(4, rows)
    out_sds = jax.ShapeDtypeStruct(tiles[0].shape, qmu.dtype)
    out_specs = tuple(_tiled_specs(2, rows)[0])

    if _interpret():
        eps = jax.random.normal(key, (rows, _LANES), dtype=qmu.dtype)
        z, kl = pl.pallas_call(
            _fwd_eps_kernel,
            out_shape=(out_sds, out_sds),
            grid=(grid,),
            in_specs=_tiled_specs(5, rows)[0],
            out_specs=out_specs,
            interpret=True,
        )(eps, *tiles)
    else:
        z, kl = pl.pallas_call(
            _fwd_kernel,
            out_shape=(out_sds, out_sds),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
            out_specs=out_specs,
        )(_seed_from_key(key), *tiles)
    return _from_tiles(z, shape, n), _from_tiles(kl, shape, n)


def _run_bwd(qmu, qlv, pmu, plv, eps, gz, gkl):
    shape, n = qmu.shape, qmu.size
    tiles = [_to_tiles(t) for t in (qmu, qlv, pmu, plv, eps, gz, gkl)]
    rows = tiles[0].shape[0]
    specs, grid = _tiled_specs(7, rows)
    out_sds = jax.ShapeDtypeStruct(tiles[0].shape, qmu.dtype)
    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=(out_sds,) * 4,
        grid=(grid,),
        in_specs=specs,
        out_specs=tuple(_tiled_specs(4, rows)[0]),
        interpret=_interpret(),
    )(*tiles)
    return tuple(_from_tiles(o, shape, n) for o in outs)


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Both 32-bit words of the key as int32 [2] (full key entropy)."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    if data.size < 2:  # defensive: some key impls carry a single word
        data = jnp.concatenate([data, data])
    # bitcast, not value-convert: words >= 2^31 must keep all their bits
    return jax.lax.bitcast_convert_type(data[-2:], jnp.int32)


# ---------------------------------------------------------------------------
# Reduced variant: z map + IN-KERNEL per-sample KL accumulation
# (BASELINE.json north star: "reparameterization, KL, and free-bits-clamped
# KL accumulation fused in a single Pallas kernel" — the spatial/channel
# accumulation happens here; the batch-mean free-bits clamp itself is a
# [L]-sized op that stays in the loss, ops/math.py free_bits_kl). Versus
# the elementwise variant this never materializes the [B,h,w,zc] KL map in
# HBM: the kernel emits per-sample partial sums [B, 128] that a trailing
# lane reduction collapses to [B].
# ---------------------------------------------------------------------------

def _div_cap(x: int, cap: int, multiple: int) -> int:
    """Largest divisor of x that is <= cap and a multiple of `multiple`
    (0 if none exists)."""
    d = min(cap, x) // multiple * multiple
    while d >= multiple:
        if x % d == 0:
            return d
        d -= multiple
    return 0


def _lane_partial_sum(block: jnp.ndarray) -> jnp.ndarray:
    """(Bb, Fb) -> (Bb, 128) partial sums by folding 128-lane slices.
    Static unrolled loop: Mosaic supports 128-aligned lane slices, but not
    the minor-dim reshape a (Bb, Fb//128, 128) view would need."""
    bb, fb = block.shape
    acc = block[:, :128]
    for c in range(1, fb // 128):
        acc = acc + block[:, c * 128 : (c + 1) * 128]
    return acc


def _fwd_reduce_kernel(seed_ref, qmu_ref, qlv_ref, pmu_ref, plv_ref,
                       z_ref, klp_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    pid = i * pl.num_programs(1) + j
    pltpu.prng_seed(
        seed_ref[0] ^ (pid * _GOLDEN32),
        seed_ref[1] ^ ((pid + 1) * 1327217885),
    )
    shape = qmu_ref.shape
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    eps = jnp.sqrt(-2.0 * jnp.log(_uniform_from_bits(b1))) * jnp.cos(
        _TWO_PI * _uniform_from_bits(b2)
    )
    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    z_ref[:] = qmu + jnp.exp(0.5 * qlv) * eps
    part = _lane_partial_sum(_kl_terms(qmu, qlv, pmu, plv))

    @pl.when(j == 0)
    def _init():
        klp_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        klp_ref[:] += part


def _fwd_reduce_eps_kernel(eps_ref, qmu_ref, qlv_ref, pmu_ref, plv_ref,
                           z_ref, klp_ref):
    """Interpret-mode (CPU CI) twin: eps precomputed by jax.random."""
    j = pl.program_id(1)
    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    z_ref[:] = qmu + jnp.exp(0.5 * qlv) * eps_ref[:]
    part = _lane_partial_sum(_kl_terms(qmu, qlv, pmu, plv))

    @pl.when(j == 0)
    def _init():
        klp_ref[:] = part

    @pl.when(j > 0)
    def _acc():
        klp_ref[:] += part


def _bwd_reduce_kernel(qmu_ref, qlv_ref, pmu_ref, plv_ref, eps_ref, gz_ref,
                       gkl_ref, dqmu_ref, dqlv_ref, dpmu_ref, dplv_ref):
    """Backward of the reduced variant: the KL cotangent arrives PER SAMPLE
    ([Bb, 128] replicated lanes; one column is broadcast over the feature
    axis) instead of elementwise."""
    qmu, qlv = qmu_ref[:], qlv_ref[:]
    pmu, plv = pmu_ref[:], plv_ref[:]
    eps, gz = eps_ref[:], gz_ref[:]
    gkl = gkl_ref[:, :1]  # (Bb, 1) -> broadcasts over the feature axis

    diff = qmu - pmu
    inv_pvar = jnp.exp(-plv)
    var_ratio = jnp.exp(qlv - plv)
    sigma_q = jnp.exp(0.5 * qlv)

    dqmu_ref[:] = gz + gkl * diff * inv_pvar
    dqlv_ref[:] = gz * 0.5 * sigma_q * eps + gkl * 0.5 * (var_ratio - 1.0)
    dpmu_ref[:] = -gkl * diff * inv_pvar
    dplv_ref[:] = gkl * 0.5 * (1.0 - var_ratio - diff * diff * inv_pvar)


def _reduce_dims(shape) -> Tuple[int, int, int, int]:
    """(B, F, Bb, Fb) for the [B, F] layout, or (0, 0, 0, 0) if the shape
    can't be tiled without padding (fall back to the elementwise path)."""
    b, f = shape[0], 1
    for d in shape[1:]:
        f *= d
    # Block caps sized for scoped VMEM with Mosaic's double buffering: the
    # backward kernel streams 10 (Bb, Fb) tiles + outputs; (128, 1024)
    # keeps it ~10 MB of the 16 MB limit ((256, 1024) OOMs at 20.25 MB).
    bb = _div_cap(b, 128, 8)
    fb = _div_cap(f, 1024, 128)
    return (b, f, bb, fb) if (bb and fb) else (0, 0, 0, 0)


def _run_fwd_reduced(key, qmu, qlv, pmu, plv, b, f, bb, fb):
    shape = qmu.shape
    tiles = [t.reshape(b, f) for t in (qmu, qlv, pmu, plv)]
    grid = (b // bb, f // fb)
    spec = pl.BlockSpec((bb, fb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    klp_spec = pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((b, f), qmu.dtype),
        jax.ShapeDtypeStruct((b, 128), qmu.dtype),
    )
    if _interpret():
        eps = jax.random.normal(key, (b, f), dtype=qmu.dtype)
        z, klp = pl.pallas_call(
            _fwd_reduce_eps_kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[spec] * 5,
            out_specs=(spec, klp_spec),
            interpret=True,
        )(eps, *tiles)
    else:
        z, klp = pl.pallas_call(
            _fwd_reduce_kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4,
            out_specs=(spec, klp_spec),
        )(_seed_from_key(key), *tiles)
    return z.reshape(shape), jnp.sum(klp, axis=-1)


def _run_bwd_reduced(qmu, qlv, pmu, plv, eps, gz, gkl_b, b, f, bb, fb):
    shape = qmu.shape
    tiles = [t.reshape(b, f) for t in (qmu, qlv, pmu, plv, eps, gz)]
    gkl_lanes = jnp.broadcast_to(gkl_b[:, None], (b, 128))
    grid = (b // bb, f // fb)
    spec = pl.BlockSpec((bb, fb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    gkl_spec = pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((b, f), qmu.dtype)
    outs = pl.pallas_call(
        _bwd_reduce_kernel,
        out_shape=(out_sds,) * 4,
        grid=grid,
        in_specs=[spec] * 6 + [gkl_spec],
        out_specs=(spec,) * 4,
        interpret=_interpret(),
    )(*tiles, gkl_lanes)
    return tuple(o.reshape(shape) for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_sample_kl_reduced(key, q_mu, q_log_var, p_mu, p_log_var):
    b, f, bb, fb = _reduce_dims(q_mu.shape)
    z, kl_b = _run_fwd_reduced(key, q_mu, q_log_var, p_mu, p_log_var,
                               b, f, bb, fb)
    return z, kl_b


def _fwd_reduced_rule(key, q_mu, q_log_var, p_mu, p_log_var):
    b, f, bb, fb = _reduce_dims(q_mu.shape)
    z, kl_b = _run_fwd_reduced(key, q_mu, q_log_var, p_mu, p_log_var,
                               b, f, bb, fb)
    eps = (z - q_mu) * jnp.exp(-0.5 * q_log_var)
    return (z, kl_b), (q_mu, q_log_var, p_mu, p_log_var, eps)


def _bwd_reduced_rule(residuals, cotangents):
    q_mu, q_log_var, p_mu, p_log_var, eps = residuals
    gz, gkl_b = cotangents
    b, f, bb, fb = _reduce_dims(q_mu.shape)
    dqmu, dqlv, dpmu, dplv = _run_bwd_reduced(
        q_mu, q_log_var, p_mu, p_log_var, eps, gz, gkl_b, b, f, bb, fb
    )
    return None, dqmu, dqlv, dpmu, dplv


_fused_sample_kl_reduced.defvjp(_fwd_reduced_rule, _bwd_reduced_rule)


def fused_sample_kl_per_sample(
    key: jax.Array,
    q_mu: jnp.ndarray,
    q_log_var: jnp.ndarray,
    p_mu: jnp.ndarray,
    p_log_var: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(z [B,...], kl_per_sample [B]) with the KL reduction in-kernel.

    Falls back to the elementwise kernel + an XLA sum when the shape
    can't be tiled without padding (F not a multiple of 128)."""
    b, f, bb, fb = _reduce_dims(q_mu.shape)
    if not bb:
        z, kl = fused_sample_kl(key, q_mu, q_log_var, p_mu, p_log_var)
        axes = tuple(range(1, kl.ndim))
        return z, jnp.sum(kl, axis=axes)
    return _fused_sample_kl_reduced(key, q_mu, q_log_var, p_mu, p_log_var)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_sample_kl(
    key: jax.Array,
    q_mu: jnp.ndarray,
    q_log_var: jnp.ndarray,
    p_mu: jnp.ndarray,
    p_log_var: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(z, kl_elementwise) — fused equivalent of
    ``ops.stochastic.normal_rsample`` + ``ops.stochastic.gaussian_kl``."""
    z, kl = _run_fwd(key, q_mu, q_log_var, p_mu, p_log_var)
    return z, kl


def _fwd_rule(key, q_mu, q_log_var, p_mu, p_log_var):
    z, kl = _run_fwd(key, q_mu, q_log_var, p_mu, p_log_var)
    # recover eps instead of storing it: eps = (z - mu) * exp(-0.5 lv)
    eps = (z - q_mu) * jnp.exp(-0.5 * q_log_var)
    return (z, kl), (q_mu, q_log_var, p_mu, p_log_var, eps)


def _bwd_rule(residuals, cotangents):
    q_mu, q_log_var, p_mu, p_log_var, eps = residuals
    gz, gkl = cotangents
    dqmu, dqlv, dpmu, dplv = _run_bwd(
        q_mu, q_log_var, p_mu, p_log_var, eps, gz, gkl
    )
    return None, dqmu, dqlv, dpmu, dplv


fused_sample_kl.defvjp(_fwd_rule, _bwd_rule)
