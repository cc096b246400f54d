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

Layout: per-pixel quantities are processed as [(H*W), rows, B] tiles —
the batch-minor physical layout XLA already uses for the conv outputs,
so the wrapper's transpose/reshape is layout-preserving. The parameter
map streams in as ONE operand in its NATIVE channel layout
([pi (K)] ++ [means (3K)] ++ [log_scales (3K)] ++ [coeffs (3K)], slabs
c-fastest: row 3j+c is component j, channel c); all slab slicing, the
channel autoregression (sublane shifts + iota masks), the per-component
channel sum, and the gradient reassembly happen IN-KERNEL, so the
wrapper does no regrouping at all — round 2's c-major regroup cost a
read+write of ~the whole 100-channel map around each kernel call in
both directions (the stated reason the kernel lost ~5% end-to-end,
VERDICT r2 weak #1).

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


def _shift_down(t):
    """Row r of the result holds row r-1 of `t` (row 0 zero-filled)."""
    return jnp.concatenate([jnp.zeros_like(t[:, :1, :]), t[:, :-1, :]], axis=1)


def _shift_up(t):
    """Row r of the result holds row r+1 of `t` (last row zero-filled)."""
    return jnp.concatenate([t[:, 1:, :], jnp.zeros_like(t[:, :1, :])], axis=1)


def _row_mod3(shape):
    """(row_index % 3) over a [hw, R, b] block (R = 3K interleaved rows)."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return r - 3 * (r // 3)


def _mixture_core(refs, k, n_bins, want_grads):
    """Per-component log-probs s_k [hw,K,b] (and the bwd pieces) computed
    directly in the NATIVE slab layout: means/ls/co rows are 3j+c
    (component j, channel c — the conv output's own channel order), so
    the transcendental-heavy bin math runs on 3K=30-row tiles and nothing
    is regrouped outside the kernel. The channel autoregression becomes a
    sublane shift: row 3j+1 needs co[3j], row 3j+2 needs co[3j+1] and
    co[3j+2]."""
    half_bin = 1.0 / (n_bins - 1)
    x3 = refs["x3"]
    x0, x1 = x3[:, 0:1, :], x3[:, 1:2, :]

    pt = refs["pt"]
    pi = pt[:, :k, :]
    means = pt[:, k : 4 * k, :]
    ls_raw = pt[:, 4 * k : 7 * k, :]
    co = jnp.tanh(pt[:, 7 * k :, :])
    ls_floor = -7.0

    mod3 = _row_mod3(means.shape)
    co_m1 = _shift_down(co)  # row r holds tanh(co[r-1])
    # autoregression (PixelCNN++), interleaved rows:
    #   r = 3j+1 (c=1): += co[3j]*x0         = co_m1*x0
    #   r = 3j+2 (c=2): += co[3j+1]*x0 + co[3j+2]*x1 = co_m1*x0 + co*x1
    adj = jnp.where(mod3 >= 1, co_m1 * x0, 0.0) + jnp.where(
        mod3 == 2, co * x1, 0.0
    )
    m = means + adj
    # xs row r must hold x channel (r % 3): tile the 3 channels K times
    xs_pack = jnp.concatenate([x3] * k, axis=1)
    ls = jnp.maximum(ls_raw, ls_floor)
    lp, dm, dls = _bin_logprob_and_grads(xs_pack, m, ls, half_bin, want_grads)
    # per-component channel sum: s_j = lp[3j] + lp[3j+1] + lp[3j+2]
    s = jnp.concatenate(
        [
            lp[:, 3 * j : 3 * j + 1, :]
            + lp[:, 3 * j + 1 : 3 * j + 2, :]
            + lp[:, 3 * j + 2 : 3 * j + 3, :]
            for j in range(k)
        ],
        axis=1,
    )

    out = {}
    if want_grads:
        out["dm"] = dm
        # clip: gradient blocked where the raw log_scale was floored
        out["dls"] = jnp.where(ls_raw > ls_floor, dls, 0.0)
        out["co"] = co
        out["co_m1"] = co_m1
        out["mod3"] = mod3
    # log_softmax over components (K = sublane dim, axis 1)
    pi_max = jnp.max(pi, axis=1, keepdims=True)
    pi_lse = pi_max + jnp.log(jnp.sum(jnp.exp(pi - pi_max), axis=1, keepdims=True))
    log_pi = pi - pi_lse
    out["s_k"] = s + log_pi
    out["log_pi"] = log_pi
    return out


def _load(refs_in):
    names = ("x3", "pt")
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
    *ins, g_ref, dp_ref, dx_ref = refs
    r = _load(ins)
    core = _mixture_core(r, k, n_bins, want_grads=True)
    s_k = core["s_k"]
    mx = jnp.max(s_k, axis=1, keepdims=True)
    e = jnp.exp(s_k - mx)
    w = e / jnp.sum(e, axis=1, keepdims=True)     # posterior over components
    g = g_ref[:].astype(jnp.float32)              # [hw, 1, b]
    gw = g * w                                    # dL/ds_k  [hw, K, b]
    # log_softmax bwd, using sum_k w == 1:  dpi = g * (w - softmax(pi))
    dpi = g * (w - jnp.exp(core["log_pi"]))

    # expand gw over channels: row 3j+c needs gw_j
    gw3 = jnp.concatenate(
        [gw[:, j : j + 1, :] for j in range(k) for _ in range(3)], axis=1
    )
    dm = gw3 * core["dm"]
    dls = gw3 * core["dls"]
    # autoregression coeff grads through tanh, interleaved rows:
    #   dco[3j]   = dm[3j+1] * x0 * (1-co[3j]^2)    -> dm_p1 * x0
    #   dco[3j+1] = dm[3j+2] * x0 * (1-co[3j+1]^2)  -> dm_p1 * x0
    #   dco[3j+2] = dm[3j+2] * x1 * (1-co[3j+2]^2)  -> dm    * x1
    x3 = r["x3"]
    x0, x1 = x3[:, 0:1, :], x3[:, 1:2, :]
    co, co_m1, mod3 = core["co"], core["co_m1"], core["mod3"]
    dm_p1 = _shift_up(dm)
    dco = jnp.where(mod3 == 2, dm * x1, dm_p1 * x0) * (1.0 - co * co)
    # single output in the native parameter layout — no reassembly outside
    dp_ref[:] = jnp.concatenate([dpi, dm, dls, dco], axis=1).astype(dp_ref.dtype)

    # x cotangent (on the [-1,1] scale, x2 chain rule applied): the bin
    # log-prob depends on (xs_c - m_c) so its direct term is -dm_r; the
    # autoregression adds tanh(co)-weighted couplings into earlier
    # channels. Row identities (see _mixture_core):
    #   dxs0 = sum_r [ r%3==0 ? -dm : dm*co_m1 ]
    #   dxs1 = sum_r [ r%3==1 ? -dm : (r%3==2 ? dm*co : 0) ]
    #   dxs2 = sum_r [ r%3==2 ? -dm : 0 ]
    sk = lambda t: jnp.sum(t, axis=1, keepdims=True)
    dxs0 = sk(jnp.where(mod3 == 0, -dm, dm * co_m1))
    dxs1 = sk(jnp.where(mod3 == 1, -dm, jnp.where(mod3 == 2, dm * co, 0.0)))
    dxs2 = sk(jnp.where(mod3 == 2, -dm, 0.0))
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


def _operands(x, params, b, hw):
    """The kernel's 2 operands: x3 [(HW),3,B] and the parameter map
    [(HW),K(1+3C),B] in its NATIVE channel layout (no regrouping — the
    only wrapper work is the layout-preserving batch-minor transpose)."""
    xs = 2.0 * x - 1.0
    return [_to_kb(xs, hw, b), _to_kb(params, hw, b)]


def _spec(q, hw_t, b_t):
    return pl.BlockSpec(
        (hw_t, q, b_t), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )


def _operand_specs(k, hw_t, b_t):
    # x3, pt
    return [_spec(3, hw_t, b_t), _spec(10 * k, hw_t, b_t)]


def _run_fwd(x, params, k, n_bins):
    b, hw, hw_t, b_t = _dims(x, params, k)
    ops = _operands(x, params, b, hw)
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
    ops = _operands(x, params, b, hw)
    gt = _to_kb(g[..., None].astype(jnp.float32), hw, b)
    kb = lambda q: jax.ShapeDtypeStruct((hw, q, b), jnp.float32)
    dp, dxs = pl.pallas_call(
        functools.partial(_bwd_kernel, k, n_bins),
        out_shape=(kb(10 * k), kb(3)),
        grid=(hw // hw_t, b // b_t),
        in_specs=_operand_specs(k, hw_t, b_t) + [_spec(1, hw_t, b_t)],
        out_specs=(_spec(10 * k, hw_t, b_t), _spec(3, hw_t, b_t)),
        interpret=_interpret(),
    )(*ops, gt)
    # dp already leaves the kernel in the reference channel layout
    h, w = x.shape[1], x.shape[2]
    back = lambda t: jnp.transpose(t.reshape(h, w, -1, b), (3, 0, 1, 2))
    return back(dp), back(dxs)


# ---------------------------------------------------------------------------
# SPMD partitioning. A bare ``pallas_call`` is an opaque custom call that
# GSPMD cannot shard — on a mesh its operands would replicate (all-gather
# of the full-resolution activations), destroying exactly the scaling the
# mesh exists for. But the mixture head is per-pixel elementwise: any
# sharding of (B, H, W) is embarrassingly parallel, each device just runs
# the kernel on its local block with zero communication. So the fwd and
# bwd pallas wrappers are registered via ``custom_partitioning`` with an
# elementwise sharding rule over the batch/space dims (channel and
# parameter dims must replicate — the autoregression couples channels).
# Works under both partitioners: the Shardy ``sharding_rule`` string and
# the GSPMD ``infer_sharding_from_operands`` callback say the same thing.
# The per-shard lowering re-runs the tile check on LOCAL shapes and falls
# back to the XLA oracle when a shard is tile-unfriendly (e.g. a local
# batch < 8), so partitioning never changes semantics.
# ---------------------------------------------------------------------------

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _fwd_any(x, params, k, n_bins):
    """Fused fwd with per-shape oracle fallback (global or per-shard)."""
    if _dims(x, params, k) is None:
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        return discretized_logistic_mix_log_prob(
            x.astype(jnp.float32), params.astype(jnp.float32), k, n_bins
        )
    return _run_fwd(x, params, k, n_bins)


def _bwd_any(x, params, g, k, n_bins):
    """Fused bwd with per-shape oracle-VJP fallback. Returns (dparams, dx)
    in fp32 (the custom_vjp rule casts back to the operand dtypes)."""
    if _dims(x, params, k, bwd=True) is None:
        from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

        _, vjp = jax.vjp(
            lambda xx, pp: discretized_logistic_mix_log_prob(xx, pp, k, n_bins),
            x.astype(jnp.float32),
            params.astype(jnp.float32),
        )
        dx, dp = vjp(g.astype(jnp.float32))
        return dp, dx
    return _run_bwd(x, params, g, k, n_bins)


def _batch_spec(*shardings):
    """PartitionSpec entries for the (B, H, W) dims, merged across the
    operands (specs may be shorter than the rank; for each dim the first
    operand that shards it wins). A mesh axis may appear in only ONE dim
    of the merged spec: operands may legally disagree about which dim an
    axis shards (x batch-sharded, params height-sharded over the same
    axis — GSPMD would resolve that with a reshard, not an error), and
    naively merging them emits a PartitionSpec with a duplicate axis,
    which crashes compilation (DuplicateSpecError). The first dim that
    claims an axis keeps it; a later multi-axis tuple entry keeps its
    non-conflicting remainder (dropping only the already-claimed axes,
    not the whole dim); the partition rule's ``args`` shardings then
    force any disagreeing operand to reshard."""
    out = [None, None, None]
    used = set()
    for sh in shardings:
        spec = tuple(sh.spec) + (None,) * 3
        for i in range(3):
            if out[i] is not None or spec[i] is None:
                continue
            axes = spec[i] if isinstance(spec[i], tuple) else (spec[i],)
            keep = tuple(a for a in axes if a not in used)
            if not keep:
                continue
            out[i] = keep if isinstance(spec[i], tuple) else keep[0]
            used.update(keep)
    return tuple(out)


def _fwd_infer(k, n_bins, mesh, arg_shapes, result_shape):
    # Merge BOTH operands (exactly as _fwd_partition does): params is the
    # conv output, the side most likely to carry a sharding — inferring
    # from x alone would propose a replicated result for a replicated-x/
    # sharded-params call and GSPMD would materialize it with an
    # all-gather, re-introducing the replication cost this rule avoids.
    spec = _batch_spec(arg_shapes[0].sharding, arg_shapes[1].sharding)
    return NamedSharding(arg_shapes[0].sharding.mesh, PartitionSpec(*spec))


def _fwd_partition(k, n_bins, mesh, arg_shapes, result_shape):
    xs = arg_shapes[0].sharding
    spec = _batch_spec(xs, arg_shapes[1].sharding)
    m = xs.mesh
    args = (
        NamedSharding(m, PartitionSpec(*spec, None)),
        NamedSharding(m, PartitionSpec(*spec, None)),
    )
    res = NamedSharding(m, PartitionSpec(*spec))

    def lower_fn(x, p):
        return _fwd_any(x, p, k, n_bins)

    return m, lower_fn, res, args


def _bwd_infer(k, n_bins, mesh, arg_shapes, result_shape):
    spec = _batch_spec(
        arg_shapes[0].sharding, arg_shapes[1].sharding, arg_shapes[2].sharding
    )
    m = arg_shapes[0].sharding.mesh
    sh = NamedSharding(m, PartitionSpec(*spec, None))
    return (sh, sh)


def _bwd_partition(k, n_bins, mesh, arg_shapes, result_shape):
    spec = _batch_spec(
        arg_shapes[0].sharding, arg_shapes[1].sharding, arg_shapes[2].sharding
    )
    m = arg_shapes[0].sharding.mesh
    full = NamedSharding(m, PartitionSpec(*spec, None))
    args = (full, full, NamedSharding(m, PartitionSpec(*spec)))
    res = (full, full)

    def lower_fn(x, p, g):
        return _bwd_any(x, p, g, k, n_bins)

    return m, lower_fn, res, args


_fwd_cp = custom_partitioning(_fwd_any, static_argnums=(2, 3))
_fwd_cp.def_partition(
    partition=_fwd_partition,
    infer_sharding_from_operands=_fwd_infer,
    sharding_rule="b h w c, b h w q -> b h w",
    need_replication_factors=("c", "q"),
)

_bwd_cp = custom_partitioning(_bwd_any, static_argnums=(3, 4))
_bwd_cp.def_partition(
    partition=_bwd_partition,
    infer_sharding_from_operands=_bwd_infer,
    sharding_rule="b h w c, b h w q, b h w -> b h w q, b h w c",
    need_replication_factors=("c", "q"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_mix(x, params, k, n_bins):
    return _fwd_cp(x, params, k, n_bins)


def _fwd_rule(x, params, k, n_bins):
    return _fwd_cp(x, params, k, n_bins), (x, params)


def _bwd_rule(k, n_bins, res, g):
    x, params = res
    dparams, dx = _bwd_cp(x, params, g, k, n_bins)
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
