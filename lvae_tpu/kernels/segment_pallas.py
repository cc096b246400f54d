"""Fused inter-conv elementwise segment: [dropout ->] batchnorm -> act.

VERDICT round-2 item #2: the measured bottleneck is the full-resolution
stage (61% of step time, HBM-bound), and the elementwise chains BETWEEN
the convs — dropout of the previous conv's output, train-mode batchnorm,
nonlinearity (`bacdbacd` residual blocks interleave exactly
``conv -> d -> b -> a -> conv``) — are pure byte traffic. This kernel
executes one whole segment per HBM pass:

forward (train):
  pass A  read x, regenerate the dropout mask on-core (TPU PRNG, uint8
          threshold semantics identical to models.blocks.FastDropout),
          accumulate per-channel sum / sum-of-squares of u = drop(x)
  (tiny XLA glue: biased batch mean/var, flax-identical)
  pass B  read x, regenerate the same mask, write
          y = act(gamma * (u - mean) * rsqrt(var + eps) + beta)

backward (given g, with only x + the [C]-sized stats as residuals —
no saved mask, no saved activations):
  pass C  read x, g; recompute u, xhat, z, act'(z); accumulate
          per-channel sum(dz) and sum(dz * xhat)   (these ARE dbeta/dgamma)
  pass D  read x, g; recompute; write
          dx = mask_scale * gamma * r * (dz - m1 - xhat * m2)
          (the full train-mode batchnorm backward incl. the batch-stats
          correction terms m1 = mean(dz), m2 = mean(dz * xhat))

Versus XLA's schedule this saves the materialized dropout output / mask
residual and the separate normalize read, and the backward re-derives
everything from x instead of reading saved intermediates.

Layout: x is flattened to [N, C] and FOLDED to [N/f, f*C] rows with
f = 128 // C when C < 128 (64-channel tensors would otherwise waste half
the VPU lanes); per-channel vectors are tiled f times and the f partial
groups are summed outside. All four passes share one grid and one
per-block PRNG seeding, so the regenerated masks agree bit-for-bit.

Oracle: the plain flax chain (FastDropout + nn.BatchNorm + nonlin);
tests assert forward/backward/stats allclose with dropout off, and mask
statistics + cross-pass determinism with dropout on. Off-TPU the kernels
run in interpret mode with the mask bits precomputed by jax.random
(the interpreter's prng returns zeros), exercising the same math.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvae_tpu.ops.math import bits8_keep_threshold
from lvae_tpu.kernels.stochastic_pallas import (
    _GOLDEN32,
    _div_cap,
    _interpret,
    _seed_from_key,
)

_ODD2 = 1327217885  # distinct odd constant for the second seed word


def _seed_block(seed_ref):
    pid = pl.program_id(0)
    pltpu.prng_seed(
        seed_ref[0] ^ (pid * _GOLDEN32),
        seed_ref[1] ^ ((pid + 1) * _ODD2),
    )


def _mask_from_bits(bits_u32, t: int):
    """uint32 random bits -> (keep mask, scale) with FastDropout semantics:
    keep iff (bits & 255) < t, survivors scaled by 256/t (exact
    expectation at the realized, 1/256-quantized keep rate)."""
    b8 = jax.lax.bitwise_and(bits_u32, jnp.uint32(255))
    return b8 < jnp.uint32(t)


def _elu(z):
    # expm1 is unsupported by Mosaic: series below |z| < 0.04 (rel err
    # ~2e-8), direct exp(z) - 1 above (cancellation bounded: rel ~3e-6)
    em1 = jnp.where(
        z > -0.04,
        z * (1.0 + 0.5 * z * (1.0 + z * (1.0 / 3.0) * (1.0 + 0.25 * z))),
        jnp.exp(z) - 1.0,
    )
    return jnp.where(z > 0.0, z, em1)


def _act_fn(act: str):
    if act == "elu":
        return _elu, lambda z: jnp.where(z > 0.0, 1.0, jnp.exp(z))
    if act == "relu":
        one = lambda z: jnp.where(z > 0.0, 1.0, 0.0)
        return (lambda z: jnp.maximum(z, 0.0)), one
    raise ValueError(f"unsupported fused-segment act {act!r}")


def _dropped(x_ref, bits, t: int):
    """u = drop(x) in fp32 given precomputed keep mask bits."""
    x = x_ref[:].astype(jnp.float32)
    if t >= 256:
        return x
    return jnp.where(bits, x * (256.0 / t), 0.0)


def _block_bits(shape, t: int, interp_bits_ref):
    """Keep-mask for this block: on-TPU from the core PRNG (seeded per
    block), in interpret mode from the precomputed uint8 operand."""
    if t >= 256:
        return None
    if interp_bits_ref is not None:
        return interp_bits_ref[:] < jnp.uint32(t)
    raw = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _mask_from_bits(raw, t)


# ---------------------------------------------------------------------------
# kernels (all share the 1-D row-block grid)
# ---------------------------------------------------------------------------


def _stats_kernel(t, interp, *refs):
    if interp:
        bits_ref, x_ref, out_ref = refs
    else:
        seed_ref, x_ref, out_ref = refs
        bits_ref = None
        if t < 256:
            _seed_block(seed_ref)
    mask = _block_bits(x_ref.shape, t, bits_ref)
    u = _dropped(x_ref, mask, t) if mask is not None else x_ref[:].astype(jnp.float32)
    s1 = jnp.sum(u, axis=0, keepdims=True)
    s2 = jnp.sum(u * u, axis=0, keepdims=True)
    part = jnp.concatenate([s1, s2], axis=0)  # [2, fC]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = part

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        out_ref[:] += part


def _apply_kernel(t, act, interp, *refs):
    if interp:
        bits_ref, x_ref, s_ref, b_ref, y_ref = refs
    else:
        seed_ref, x_ref, s_ref, b_ref, y_ref = refs
        bits_ref = None
        if t < 256:
            _seed_block(seed_ref)
    f, _ = _act_fn(act)
    mask = _block_bits(x_ref.shape, t, bits_ref)
    u = _dropped(x_ref, mask, t) if mask is not None else x_ref[:].astype(jnp.float32)
    z = u * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = f(z).astype(y_ref.dtype)


def _bwd_reduce_kernel(t, act, interp, *refs):
    if interp:
        bits_ref, x_ref, g_ref, s_ref, b_ref, mu_ref, r_ref, out_ref = refs
    else:
        seed_ref, x_ref, g_ref, s_ref, b_ref, mu_ref, r_ref, out_ref = refs
        bits_ref = None
        if t < 256:
            _seed_block(seed_ref)
    _, fp = _act_fn(act)
    mask = _block_bits(x_ref.shape, t, bits_ref)
    u = _dropped(x_ref, mask, t) if mask is not None else x_ref[:].astype(jnp.float32)
    z = u * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    dz = g_ref[:].astype(jnp.float32) * fp(z)
    xhat = (u - mu_ref[:].astype(jnp.float32)) * r_ref[:].astype(jnp.float32)
    s1 = jnp.sum(dz, axis=0, keepdims=True)          # -> dbeta
    s2 = jnp.sum(dz * xhat, axis=0, keepdims=True)   # -> dgamma
    part = jnp.concatenate([s1, s2], axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = part

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        out_ref[:] += part


def _bwd_apply_kernel(t, act, interp, *refs):
    if interp:
        (bits_ref, x_ref, g_ref, s_ref, b_ref, mu_ref, r_ref, gr_ref,
         m12_ref, dx_ref) = refs
    else:
        (seed_ref, x_ref, g_ref, s_ref, b_ref, mu_ref, r_ref, gr_ref,
         m12_ref, dx_ref) = refs
        bits_ref = None
        if t < 256:
            _seed_block(seed_ref)
    _, fp = _act_fn(act)
    mask = _block_bits(x_ref.shape, t, bits_ref)
    u = _dropped(x_ref, mask, t) if mask is not None else x_ref[:].astype(jnp.float32)
    z = u * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    dz = g_ref[:].astype(jnp.float32) * fp(z)
    xhat = (u - mu_ref[:].astype(jnp.float32)) * r_ref[:].astype(jnp.float32)
    m1 = m12_ref[0:1, :].astype(jnp.float32)
    m2 = m12_ref[1:2, :].astype(jnp.float32)
    du = gr_ref[:].astype(jnp.float32) * (dz - m1 - xhat * m2)  # gamma * r
    if mask is not None:
        du = jnp.where(mask, du * (256.0 / t), 0.0)
    dx_ref[:] = du.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------

_ROW_CAP = 512


def _fold_dims(shape) -> Tuple[int, int, int, int]:
    """(N, C, f, rows_t): flatten [..., C] to [N, C], fold f pixels per row
    so lanes = f*C (128 when C divides 128). (0,)*4 if untileable."""
    c = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    if 128 % c == 0:
        f = 128 // c
    elif c % 128 == 0:
        f = 1
    else:
        return 0, 0, 0, 0  # lane-unfriendly channel count: plain XLA path
    if n % f:
        return 0, 0, 0, 0
    rows = n // f
    rows_t = _div_cap(rows, _ROW_CAP, 8)
    if not rows_t:
        return 0, 0, 0, 0
    return n, c, f, rows_t


def _vec(v, f):
    """[C] -> [1, f*C] (tiled) fp32."""
    return jnp.tile(v.astype(jnp.float32), f)[None, :]


def _unfold_sum(row, f, c):
    """[fC] -> [C]: sum the f folded copies."""
    return row.reshape(f, c).sum(axis=0)


def _common_specs(rows_t, fc):
    tile = pl.BlockSpec((rows_t, fc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, fc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    two = pl.BlockSpec((2, fc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return tile, vec, two


def _rand_operand(key, rows, fc, t):
    """Leading operand carrying the randomness: interpret mode precomputes
    uint32 (bits & 255) values with jax.random; on TPU only the 2-word
    seed goes in (SMEM)."""
    if _interpret():
        bits = jax.random.bits(key, (rows, fc), jnp.uint8).astype(jnp.uint32)
        return bits, None
    return None, _seed_from_key(key)


def _call(kernel, static, key, tiles, vecs, twos, out_shape, out_specs,
          rows, rows_t, fc, t):
    """Shared pallas_call builder: [rand, *tiles, *vecs, *twos] -> outs."""
    tile, vec, two = _common_specs(rows_t, fc)
    interp = _interpret()
    bits, seed = _rand_operand(key, rows, fc, t)
    if interp:
        lead, lead_spec = bits, tile
    else:
        lead, lead_spec = seed, pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(kernel, *static, interp),
        out_shape=out_shape,
        grid=(rows // rows_t,),
        in_specs=[lead_spec] + [tile] * len(tiles) + [vec] * len(vecs)
        + [two] * len(twos),
        out_specs=out_specs,
        interpret=interp,
    )(lead, *tiles, *vecs, *twos)


def _segment_fwd_impl(x, gamma, beta, key, t, act, eps):
    n, c, f, rows_t = _fold_dims(x.shape)
    fc = f * c
    rows = n // f
    xt = x.reshape(rows, fc)
    tile, vec, two = _common_specs(rows_t, fc)

    sums = _call(
        _stats_kernel, (t,), key, [xt], [], [],
        jax.ShapeDtypeStruct((2, fc), jnp.float32), two,
        rows, rows_t, fc, t,
    )
    mean = _unfold_sum(sums[0], f, c) / n
    mean2 = _unfold_sum(sums[1], f, c) / n
    var = mean2 - mean * mean  # biased, flax-identical
    r = jax.lax.rsqrt(var + eps)
    scale = gamma.astype(jnp.float32) * r
    shift = beta.astype(jnp.float32) - mean * scale

    y = _call(
        _apply_kernel, (t, act), key, [xt], [_vec(scale, f), _vec(shift, f)],
        [], jax.ShapeDtypeStruct((rows, fc), x.dtype), tile,
        rows, rows_t, fc, t,
    )
    return y.reshape(x.shape), mean, var, r


def _segment_bwd_impl(x, gamma, beta, key, g, mean, r, t, act, eps):
    n, c, f, rows_t = _fold_dims(x.shape)
    fc = f * c
    rows = n // f
    xt = x.reshape(rows, fc)
    gt = g.reshape(rows, fc)
    tile, vec, two = _common_specs(rows_t, fc)

    scale = gamma.astype(jnp.float32) * r
    shift = beta.astype(jnp.float32) - mean * scale
    vecs = [_vec(scale, f), _vec(shift, f), _vec(mean, f), _vec(r, f)]

    sums = _call(
        _bwd_reduce_kernel, (t, act), key, [xt, gt], vecs, [],
        jax.ShapeDtypeStruct((2, fc), jnp.float32), two,
        rows, rows_t, fc, t,
    )
    dbeta = _unfold_sum(sums[0], f, c)
    dgamma = _unfold_sum(sums[1], f, c)
    m12 = jnp.stack(
        [jnp.tile(dbeta / n, f), jnp.tile(dgamma / n, f)]
    )  # [2, fC]

    dx = _call(
        _bwd_apply_kernel, (t, act), key,
        [xt, gt], vecs + [_vec(gamma.astype(jnp.float32) * r, f)], [m12],
        jax.ShapeDtypeStruct((rows, fc), x.dtype), tile,
        rows, rows_t, fc, t,
    )
    return dx.reshape(x.shape), dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_segment(x, gamma, beta, key, t, act, eps):
    y, mean, var, _ = _segment_fwd_impl(x, gamma, beta, key, t, act, eps)
    return y, mean, var


def _fwd_rule(x, gamma, beta, key, t, act, eps):
    y, mean, var, r = _segment_fwd_impl(x, gamma, beta, key, t, act, eps)
    return (y, mean, var), (x, gamma, beta, key, mean, r)


def _bwd_rule(t, act, eps, res, cots):
    x, gamma, beta, key, mean, r = res
    g, _gmean, _gvar = cots  # running-stat branches carry no gradient
    dx, dgamma, dbeta = _segment_bwd_impl(
        x, gamma, beta, key, g, mean, r, t, act, eps
    )
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype), None


_fused_segment.defvjp(_fwd_rule, _bwd_rule)


def segment_supported(shape, c: int, act: str) -> bool:
    """Can the fused kernel tile this tensor? (static predicate)"""
    if act not in ("elu", "relu"):
        return False
    return _fold_dims((*shape[:-1], c))[0] != 0


def fused_dropout_bn_act(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    key: Optional[jax.Array],
    *,
    rate: float = 0.0,
    act: str = "elu",
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode fused [dropout ->] batchnorm -> act over the channel-last
    tensor ``x``. Returns ``(y, batch_mean, batch_var)`` — the caller owns
    the running-stat update (flax formula: new = m*old + (1-m)*batch).

    ``rate`` uses FastDropout's uint8-threshold semantics (realized keep
    rate quantized to 1/256, exact-expectation rescale); ``rate=0`` (or a
    rate below the 8-bit resolution) skips the mask entirely."""
    t = bits8_keep_threshold(rate)
    if t <= 0:
        # degenerate rate ~ 1.0: everything dropped; u == 0 everywhere
        zeros = jnp.zeros(x.shape[-1], jnp.float32)
        y = jnp.broadcast_to(
            _act_fn(act)[0](beta.astype(jnp.float32)).astype(x.dtype), x.shape
        )
        return y, zeros, zeros
    if t < 256 and key is None:
        raise ValueError("dropout requested but no PRNG key provided")
    if key is None:
        key = jax.random.key(0)  # unused when t == 256 (no mask)
    return _fused_segment(x, gamma, beta, key, t, act, eps)
