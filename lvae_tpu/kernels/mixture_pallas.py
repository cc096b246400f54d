"""Fused discretized-logistic-mixture log-prob kernel (PixelCNN++ head).

The optional Pallas likelihood fusion named in SURVEY.md §2.4: the
mixture head is ~20% of the CelebA-64 train step (profiled — RESULTS.md)
and is purely elementwise per pixel, with a [K, C] working set per pixel
that XLA materializes as a stack of [B,H,W,K,C] intermediates in both
directions. This kernel keeps the whole per-pixel mixture computation —
channel autoregression, cancellation-free bin log-probs, log-softmax over
components, logsumexp — in VMEM: the forward reads x + the 100-channel
parameter map once and writes one [B,H,W] output; the hand-derived VJP
reads the same plus the incoming cotangent and writes compact parameter
gradients.

Layout: per-pixel quantities are processed as [(H*W), K, B] tiles — the
batch-minor physical layout XLA already uses for the conv outputs, so the
wrapper's transpose/reshape is layout-preserving; the channel-group
slicing (pi / means / log_scales / coeffs, k-major per the reference
parameter convention) is a permutation XLA fuses around the kernel.

Oracle: ``lvae_tpu.ops.likelihoods.discretized_logistic_mix_log_prob``
(tests assert forward allclose and gradients vs ``jax.grad`` of the
oracle). C == 3 and tile-friendly shapes only; anything else falls back
to the XLA oracle. Runs in interpret mode off-TPU so CPU CI exercises
the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _div_cap(x: int, cap: int, multiple: int) -> int:
    d = min(cap, x) // multiple * multiple
    while d >= multiple:
        if x % d == 0:
            return d
        d -= multiple
    return 0


# ---------------------------------------------------------------------------
# shared per-block math (fp32). All refs are [hw_t, K, b_t] blocks except
# the x channels ([hw_t, 1, b_t]) and the output ([hw_t, 1, b_t]).
# ---------------------------------------------------------------------------


def _softplus(x):
    """log(1 + e^x) without log1p/expm1 (unsupported by Mosaic): the
    shifted form max(x,0) + log(1 + e^-|x|) has a log argument in [1, 2],
    where plain log is exact to fp32 eps."""
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _log_sigmoid(x):
    return -_softplus(-x)


def _log1mexp(d):
    """log(1 - e^-d) for d > 0 without expm1: direct form above d = 1e-2
    (subtraction keeps >5 significant digits there), series below it
    (log(1-e^-d) = log d - d/2 + d^2/24 + O(d^4))."""
    safe = jnp.maximum(d, 1e-2)
    direct = jnp.log(1.0 - jnp.exp(-safe))
    series = jnp.log(jnp.maximum(d, 1e-30)) - 0.5 * d + d * d * (1.0 / 24.0)
    return jnp.where(d < 1e-2, series, direct)


def _inv_expm1(d):
    """1 / (e^d - 1) for d > 0 without expm1: 1/d - 1/2 + d/12 + O(d^3)
    below 1e-2, direct above."""
    safe = jnp.maximum(d, 1e-2)
    direct = 1.0 / (jnp.exp(safe) - 1.0)
    series = 1.0 / jnp.maximum(d, 1e-30) - 0.5 + d * (1.0 / 12.0)
    return jnp.where(d < 1e-2, series, direct)


def _bin_logprob_and_grads(xs, m, ls, half_bin, want_grads):
    """log P(bin containing xs) under a logistic(m, exp(ls)) discretized
    with half-bin width `half_bin` on the [-1, 1] scale, plus (optionally)
    d/dm and d/dls. Mirrors ops.likelihoods (interior via the
    cancellation-free identity; edge bins via log-cdf / log-sf), built
    from Mosaic-supported primitives only."""
    inv_s = jnp.exp(-ls)
    centered = xs - m
    a = inv_s * (centered - half_bin)        # minus_in
    d = (2.0 * half_bin) * inv_s             # delta > 0
    plus_in = a + d

    log_interior = (
        plus_in + _log1mexp(d) - _softplus(a) - _softplus(plus_in)
    )
    log_left = _log_sigmoid(plus_in)
    log_right = _log_sigmoid(-a)

    is_left = xs < -1.0 + half_bin
    is_right = xs > 1.0 - half_bin
    lp = jnp.where(is_left, log_left, jnp.where(is_right, log_right, log_interior))
    if not want_grads:
        return lp, None, None

    sig_a = jax.nn.sigmoid(a)
    sig_p = jax.nn.sigmoid(plus_in)
    # interior: dL/da = 1 - sig(a) - sig(a+d); dL/dd = 1 + 1/(e^d - 1) - sig(a+d)
    dL_da_int = 1.0 - sig_a - sig_p
    dL_dd_int = 1.0 + _inv_expm1(d) - sig_p
    # left edge (L = log_sigmoid(plus_in)): dL/da = 1-sig(plus), dL/dd same
    dL_da_left = 1.0 - sig_p
    dL_dd_left = 1.0 - sig_p
    # right edge (L = log_sigmoid(-a)): dL/da = -sig(a), dL/dd = 0
    dL_da = jnp.where(
        is_left, dL_da_left, jnp.where(is_right, -sig_a, dL_da_int)
    )
    dL_dd = jnp.where(is_left, dL_dd_left, jnp.where(is_right, 0.0, dL_dd_int))
    # a = inv_s*(centered - hb): da/dm = -inv_s, da/dls = -a; dd/dls = -d
    dm = dL_da * (-inv_s)
    dls = -a * dL_da - d * dL_dd
    return lp, dm, dls


def _mixture_core(refs, k, n_bins, want_grads):
    """Compute per-component log-probs s_k [hw,K,b] and (for bwd) the packed
    c-major gradient pieces. `refs` holds fp32 blocks: x3 [hw,3,b], pi
    [hw,K,b], and means/ls/co each [hw,3K,b] in c-major row order (rows
    c*K+j) so the transcendental-heavy bin math runs on 3K=30-row tiles
    (94% sublane utilization) instead of per-channel 10-row tiles."""
    half_bin = 1.0 / (n_bins - 1)
    x3 = refs["x3"]
    x0, x1 = x3[:, 0:1, :], x3[:, 1:2, :]

    co = jnp.tanh(refs["co"])
    ls_floor = -7.0
    means = refs["means"]
    # autoregression (PixelCNN++): m1 += tanh(co_0)*x0; m2 += tanh(co_1)*x0
    # + tanh(co_2)*x1  (c-major groups of K rows)
    adj = jnp.concatenate(
        [
            jnp.zeros_like(means[:, :k, :]),
            co[:, :k, :] * x0,
            co[:, k : 2 * k, :] * x0 + co[:, 2 * k :, :] * x1,
        ],
        axis=1,
    )
    m = means + adj
    xs_pack = jnp.concatenate(
        [jnp.broadcast_to(x3[:, c : c + 1, :], m[:, :k, :].shape) for c in range(3)],
        axis=1,
    )
    ls = jnp.maximum(refs["ls"], ls_floor)
    lp, dm, dls = _bin_logprob_and_grads(xs_pack, m, ls, half_bin, want_grads)
    s = lp[:, :k, :] + lp[:, k : 2 * k, :] + lp[:, 2 * k :, :]

    out = {}
    if want_grads:
        out["dm"] = dm
        # clip: gradient blocked where the raw log_scale was floored
        out["dls"] = jnp.where(refs["ls"] > ls_floor, dls, 0.0)
        out["co"] = co
    # log_softmax over components (K = sublane dim, axis 1)
    pi = refs["pi"]
    pi_max = jnp.max(pi, axis=1, keepdims=True)
    pi_lse = pi_max + jnp.log(jnp.sum(jnp.exp(pi - pi_max), axis=1, keepdims=True))
    log_pi = pi - pi_lse
    out["s_k"] = s + log_pi
    out["log_pi"] = log_pi
    return out


def _load(refs_in):
    names = ("x3", "pi", "means", "ls", "co")
    return {n: r[:].astype(jnp.float32) for n, r in zip(names, refs_in)}


def _fwd_kernel(k, n_bins, *refs):
    *ins, out_ref = refs
    r = _load(ins)
    core = _mixture_core(r, k, n_bins, want_grads=False)
    s_k = core["s_k"]
    m = jnp.max(s_k, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(s_k - m), axis=1, keepdims=True))
    out_ref[:] = lse.astype(out_ref.dtype)


def _bwd_kernel(k, n_bins, *refs):
    *ins, g_ref, dpi_ref, dm_ref, dls_ref, dco_ref, dx_ref = refs
    r = _load(ins)
    core = _mixture_core(r, k, n_bins, want_grads=True)
    s_k = core["s_k"]
    mx = jnp.max(s_k, axis=1, keepdims=True)
    e = jnp.exp(s_k - mx)
    w = e / jnp.sum(e, axis=1, keepdims=True)     # posterior over components
    g = g_ref[:].astype(jnp.float32)              # [hw, 1, b]
    gw = g * w                                    # dL/ds_k  [hw, K, b]
    # log_softmax bwd, using sum_k w == 1:  dpi = g * (w - softmax(pi))
    dpi_ref[:] = (g * (w - jnp.exp(core["log_pi"]))).astype(dpi_ref.dtype)

    gw3 = jnp.concatenate([gw, gw, gw], axis=1)   # broadcast over channels
    dm = gw3 * core["dm"]
    dm_ref[:] = dm.astype(dm_ref.dtype)
    dls_ref[:] = (gw3 * core["dls"]).astype(dls_ref.dtype)
    # autoregression coeff grads through tanh (c-major groups)
    x3 = r["x3"]
    x0, x1 = x3[:, 0:1, :], x3[:, 1:2, :]
    co = core["co"]
    dm1, dm2 = dm[:, k : 2 * k, :], dm[:, 2 * k :, :]
    dco = jnp.concatenate(
        [
            dm1 * x0 * (1.0 - co[:, :k, :] ** 2),
            dm2 * x0 * (1.0 - co[:, k : 2 * k, :] ** 2),
            dm2 * x1 * (1.0 - co[:, 2 * k :, :] ** 2),
        ],
        axis=1,
    )
    dco_ref[:] = dco.astype(dco_ref.dtype)
    # x cotangent (on the [-1,1] scale, x2 chain rule applied): the bin
    # log-prob depends on (xs_c - m_c) so its direct term is -dL/dm_c; the
    # autoregression adds tanh(co)-weighted couplings into earlier channels.
    sk = lambda t: jnp.sum(t, axis=1, keepdims=True)
    dm0 = dm[:, :k, :]
    dxs0 = -sk(dm0) + sk(dm1 * co[:, :k, :]) + sk(dm2 * co[:, k : 2 * k, :])
    dxs1 = -sk(dm1) + sk(dm2 * co[:, 2 * k :, :])
    dxs2 = -sk(dm2)
    dx_ref[:] = (
        2.0 * jnp.concatenate([dxs0, dxs1, dxs2], axis=1)
    ).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _dims(x, params, k, bwd=False):
    if x.ndim != 4:  # [B, H, W, C] only (the oracle allows extra leading dims)
        return None
    b = x.shape[0]
    hw = x.shape[1] * x.shape[2]
    c = x.shape[-1]
    if c != 3 or params.shape[-1] != k * (1 + 3 * c):
        return None
    # Tile caps sized for Mosaic's 16 MB scoped-vmem budget with double
    # buffering (measured on hardware): fwd streams 13 fp32 [hw_t, K, b_t]
    # operands ((128,128) overflowed by 128 KB -> 64); bwd streams 14 in +
    # 10 out ((64,128) overflowed by 1.1 MB -> 32).
    hw_t = _div_cap(hw, 32 if bwd else 64, 8)
    b_t = _div_cap(b, 128, 8)
    if not hw_t or not b_t:
        return None
    return b, hw, hw_t, b_t


def _to_kb(arr, hw, b):
    """[B,H,W,Q] -> [(HW), Q, B] (layout-preserving on batch-minor data)."""
    q = arr.shape[-1]
    return jnp.transpose(arr, (1, 2, 3, 0)).reshape(hw, q, b)


def _operands(x, params, k, b, hw):
    """Slice x and the reference-layout parameter map into the kernel's
    5 packed operands: x3 [(HW),3,B], pi [(HW),K,B], and means/ls/co each
    [(HW),3K,B] in c-major row order (the oracle's [K, C] slabs are
    k-major; the c-major regrouping is a strided gather XLA fuses)."""
    xs = 2.0 * x - 1.0
    x3 = _to_kb(xs, hw, b)
    pt = _to_kb(params, hw, b)
    pi = pt[:, :k, :]
    cmaj = lambda base: jnp.concatenate(
        [pt[:, base + c : base + 3 * k : 3, :] for c in range(3)], axis=1
    )
    return [x3, pi, cmaj(k), cmaj(4 * k), cmaj(7 * k)]


def _spec(q, hw_t, b_t):
    return pl.BlockSpec(
        (hw_t, q, b_t), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )


def _operand_specs(k, hw_t, b_t):
    # x3, pi, means, ls, co
    return [
        _spec(3, hw_t, b_t),
        _spec(k, hw_t, b_t),
        _spec(3 * k, hw_t, b_t),
        _spec(3 * k, hw_t, b_t),
        _spec(3 * k, hw_t, b_t),
    ]


def _run_fwd(x, params, k, n_bins):
    b, hw, hw_t, b_t = _dims(x, params, k)
    ops = _operands(x, params, k, b, hw)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k, n_bins),
        out_shape=jax.ShapeDtypeStruct((hw, 1, b), jnp.float32),
        grid=(hw // hw_t, b // b_t),
        in_specs=_operand_specs(k, hw_t, b_t),
        out_specs=_spec(1, hw_t, b_t),
        interpret=_interpret(),
    )(*ops)
    h, w = x.shape[1], x.shape[2]
    return jnp.transpose(out.reshape(h, w, b), (2, 0, 1))


def _run_bwd(x, params, g, k, n_bins):
    b, hw, hw_t, b_t = _dims(x, params, k, bwd=True)
    ops = _operands(x, params, k, b, hw)
    gt = _to_kb(g[..., None].astype(jnp.float32), hw, b)
    kb = lambda q: jax.ShapeDtypeStruct((hw, q, b), jnp.float32)
    dpi, dm, dls, dco, dxs = pl.pallas_call(
        functools.partial(_bwd_kernel, k, n_bins),
        out_shape=(kb(k), kb(3 * k), kb(3 * k), kb(3 * k), kb(3)),
        grid=(hw // hw_t, b // b_t),
        in_specs=_operand_specs(k, hw_t, b_t) + [_spec(1, hw_t, b_t)],
        out_specs=(
            _spec(k, hw_t, b_t),
            _spec(3 * k, hw_t, b_t),
            _spec(3 * k, hw_t, b_t),
            _spec(3 * k, hw_t, b_t),
            _spec(3, hw_t, b_t),
        ),
        interpret=_interpret(),
    )(*ops, gt)
    # reassemble [..., K*(1+3C)] in the reference k-major layout (inverse
    # of the c-major grouping), back to [B, H, W, :]
    kmaj = lambda t: jnp.stack(
        [t[:, c * k : (c + 1) * k, :] for c in range(3)], axis=2
    ).reshape(hw, 3 * k, b)
    dp = jnp.concatenate([dpi, kmaj(dm), kmaj(dls), kmaj(dco)], axis=1)
    h, w = x.shape[1], x.shape[2]
    back = lambda t: jnp.transpose(t.reshape(h, w, -1, b), (3, 0, 1, 2))
    return back(dp), back(dxs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_mix(x, params, k, n_bins):
    return _run_fwd(x, params, k, n_bins)


def _fwd_rule(x, params, k, n_bins):
    return _run_fwd(x, params, k, n_bins), (x, params)


def _bwd_rule(k, n_bins, res, g):
    x, params = res
    dparams, dx = _run_bwd(x, params, g, k, n_bins)
    return dx.astype(x.dtype), dparams.astype(params.dtype)


_fused_mix.defvjp(_fwd_rule, _bwd_rule)


def fused_mix_log_prob(
    x: jnp.ndarray,
    params: jnp.ndarray,
    n_components: int = 10,
    n_bins: int = 256,
) -> jnp.ndarray:
    """Drop-in fused version of
    ``ops.likelihoods.discretized_logistic_mix_log_prob`` (same [B, H, W]
    output, full gradients wrt both arguments). Falls back to the XLA
    oracle for C != 3, extra leading dims, or tile-unfriendly shapes."""
    from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

    if _dims(x, params, n_components) is None:
        # match the fused path's fp32 compute (callers may hand us raw
        # bf16 conv outputs; the likelihood contract is fp32 math)
        return discretized_logistic_mix_log_prob(
            x.astype(jnp.float32), params.astype(jnp.float32),
            n_components, n_bins,
        )
    # no dtype cast here: operands stream to the kernel in their storage
    # dtype (bf16 conv outputs stay bf16 — half the boundary traffic) and
    # _load upcasts per block; fp32 compute either way.
    return _fused_mix(x, params, n_components, n_bins)
