"""Long-horizon cross-framework trajectory-drift harness (VERDICT r4 #1).

Runs the SAME stochastic training trajectory — shared data stream, shared
per-(step, layer) standard-normal eps draws, identical warmup-beta +
free-bits loss, Adamax — through lvae_tpu and the torch mirror
(tests/torch_mirror.py), both in fp32 on CPU, and measures the terminal
test-ELBO gap in bpd. This converts "parity is staged" (8-step f64
trajectory equality, tests/test_parity.py) into "parity DRIFT IS BOUNDED
over a real training horizon": the two implementations may diverge in
parameter space through fp32 conv-roundoff chaos, but if the semantics
match, the *quality* gap must stay far below the 0.01-bpd target
(BASELINE.json north star; SURVEY §6, §7 hard part 1).

Shared randomness: eps is drawn once per step per layer from one numpy
Philox stream and injected on both sides (LadderVAE ``forced_eps``, the
mirror's ``eps``) — the trajectories run the REAL stochastic objective,
not the z=mu mode objective. Dropout is 0 (the only non-shareable noise).

Used by tools/parity_drift.py (the full flagship-scale run recorded in
RESULTS.md) and tests/test_parity.py::TestLongHorizonDrift (slow tier,
reduced width, same depth/semantics).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from lvae_tpu.models.lvae import LadderVAE
from lvae_tpu.ops.math import crop_img_tensor, free_bits_kl, pad_img_tensor


def make_blob_data(n: int, img: int, rng: np.random.Generator) -> np.ndarray:
    """Structured binary images: low-res Gaussian logits, 4x nearest
    upsample, sigmoid, Bernoulli sample — spatially correlated pixels so a
    ladder VAE has real structure to learn (unlike iid-noise synthetics)."""
    assert img % 4 == 0 or img == 28, img
    low = img // 4
    logits = rng.normal(size=(n, low, low, 1)).astype(np.float32) * 2.0
    up = np.kron(logits, np.ones((1, 4, 4, 1), np.float32))[:, :img, :img]
    p = 1.0 / (1.0 + np.exp(-up))
    return (rng.uniform(size=p.shape) < p).astype(np.float32)


def fwd_eps(m, x, eps_list, train):
    """LadderVAE forward with per-layer injected eps (z = mu + sigma*eps);
    same pad/crop/reduction contract as LadderVAE.__call__."""
    x_pad = pad_img_tensor(x, m.img_size)
    bu = m.bottomup_pass(x_pad, train=train)
    td, info = m.topdown_pass(bu, train=train, forced_eps=list(eps_list))
    td = crop_img_tensor(td, m.data_size)
    ll, _ = m.likelihood_head(td, x)
    return {
        "ll": jnp.sum(ll, axis=(1, 2, 3)),
        "kl_sep": jnp.stack(
            [jnp.sum(k, axis=(1, 2, 3)) for k in info["kl_elementwise"]]
        ),
    }


def _latent_shapes(model, variables, x):
    out = model.apply(
        variables, x, train=False, rngs={"sample": jax.random.key(0)}
    )
    return [z.shape[1:] for z in out["z"]]


def _beta(step: int, anneal: int) -> float:
    # linear_anneal(step, 0, 1, anneal) as a python float — bit-identical
    # on both sides because it multiplies the loss as a scalar
    if anneal <= 0:
        return 1.0
    return min(1.0, step / float(anneal))


def run_drift(
    steps: int = 500,
    batch: int = 32,
    zdims=(32, 32, 32),
    n_filters: int = 64,
    blocks_per_layer: int = 2,
    img: int = 28,
    conv_pad: str = "same",
    skip_merge: str = "pre",
    free_bits: float = 0.5,
    beta_anneal: int = 200,
    lr: float = 3e-4,
    seed: int = 0,
    n_train: int = 2048,
    n_eval: int = 256,
    eval_eps: int = 4,
    eval_every: int | None = None,
    progress=None,
) -> dict:
    """Run the shared-trajectory battery; return drift metrics.

    Returns dict with 'history' rows (step, loss_jax, loss_torch,
    eval records) and the terminal 'elbo_jax'/'elbo_torch'/'drift_bpd'.
    """
    import torch

    from tests.torch_mirror import LadderVAET, port_params_to_torch

    torch.manual_seed(0)
    rng = np.random.default_rng(seed)
    pad = 32 if img == 28 else img
    dims = img * img  # bernoulli, 1 channel
    ln2 = float(np.log(2.0))

    train_x = make_blob_data(n_train, img, rng)
    eval_x = make_blob_data(n_eval, img, rng)

    kw = dict(
        z_dims=tuple(zdims),
        downsample=(1,) * len(zdims),
        blocks_per_layer=blocks_per_layer,
        n_filters=n_filters,
        stochastic_skip=True,
        gated=True,
        learn_top_prior=True,
        img_size=(pad, pad),
        data_size=(img, img),
        batchnorm=True,
        dropout_rate=0.0,
        conv_pad=conv_pad,
        skip_merge_mode=skip_merge,
        likelihood="bernoulli",
    )
    model = LadderVAE(color_ch=1, **kw)
    x0 = jnp.asarray(train_x[:batch])
    variables = model.init(
        {"params": jax.random.key(seed), "sample": jax.random.key(1)},
        x0, train=True,
    )
    z_shapes = _latent_shapes(model, variables, x0)

    tmodel = LadderVAET(color_ch=1, **kw)
    port_params_to_torch(
        variables["params"], variables.get("batch_stats", {}), tmodel
    )

    # --- jax side ---
    tx = optax.adamax(lr, b1=0.9, b2=0.999, eps=1e-8)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def jstep(params, bstats, opt, x, eps, beta):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bstats}, x, eps, True,
                mutable=["batch_stats"], method=fwd_eps,
            )
            kl_fb = free_bits_kl(out["kl_sep"], free_bits)
            loss = -(out["ll"].mean() - beta * kl_fb.sum())
            elbo = out["ll"].mean() - out["kl_sep"].sum(axis=0).mean()
            return loss, (mut["batch_stats"], elbo)

        (loss, (nbs, elbo)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), nbs, nopt, loss, elbo

    @jax.jit
    def jeval(params, bstats, x, eps):
        out = model.apply(
            {"params": params, "batch_stats": bstats}, x, eps, False,
            method=fwd_eps,
        )
        return (out["ll"] - out["kl_sep"].sum(axis=0)).mean()

    # --- torch side ---
    topt = torch.optim.Adamax(
        tmodel.parameters(), lr=lr, betas=(0.9, 0.999), eps=1e-8
    )

    def tstep(x_np, eps_np, beta):
        tmodel.train()
        xt = torch.from_numpy(x_np).permute(0, 3, 1, 2)
        eps_t = [torch.from_numpy(e).permute(0, 3, 1, 2) for e in eps_np]
        out = tmodel(xt, eps=eps_t)
        kl_mean = out["kl_sep"].mean(dim=1)
        kl_fb = torch.clamp(kl_mean, min=free_bits) if free_bits > 0 else kl_mean
        loss = -(out["ll"].mean() - beta * kl_fb.sum())
        topt.zero_grad()
        loss.backward()
        topt.step()
        return float(loss.detach())

    def teval(x_np, eps_np):
        tmodel.eval()
        xt = torch.from_numpy(x_np).permute(0, 3, 1, 2)
        eps_t = [torch.from_numpy(e).permute(0, 3, 1, 2) for e in eps_np]
        with torch.no_grad():
            out = tmodel(xt, eps=eps_t)
            return float((out["ll"] - out["kl_sep"].sum(dim=0)).mean())

    def eval_both(params, bstats):
        # shared-eps test ELBO, averaged over eval_eps draws; eval batches
        # of `batch` to keep the torch side's memory flat
        ej, et = 0.0, 0.0
        n_batches = n_eval // batch
        erng = np.random.default_rng(seed + 999)
        for d in range(eval_eps):
            for bi in range(n_batches):
                xb = eval_x[bi * batch:(bi + 1) * batch]
                eps = [
                    erng.normal(size=(batch,) + s).astype(np.float32)
                    for s in z_shapes
                ]
                ej += float(jeval(params, bstats, jnp.asarray(xb),
                                  [jnp.asarray(e) for e in eps]))
                et += teval(xb, eps)
        k = eval_eps * n_batches
        return ej / k, et / k

    history = []
    t0 = time.time()
    for step in range(steps):
        bidx = rng.integers(0, n_train, size=batch)
        xb = train_x[bidx]
        eps = [
            rng.normal(size=(batch,) + s).astype(np.float32)
            for s in z_shapes
        ]
        beta = _beta(step, beta_anneal)
        params, bstats, opt, lj, _ = jstep(
            params, bstats, opt, jnp.asarray(xb),
            [jnp.asarray(e) for e in eps], beta,
        )
        lt = tstep(xb, eps, beta)
        if eval_every and (step + 1) % eval_every == 0:
            ej, et = eval_both(params, bstats)
            row = dict(
                step=step + 1, loss_jax=float(lj), loss_torch=lt,
                elbo_jax=ej, elbo_torch=et,
                drift_bpd=abs(ej - et) / (dims * ln2),
            )
            history.append(row)
            if progress:
                progress(
                    f"step {row['step']:>5}  loss j/t "
                    f"{row['loss_jax']:.3f}/{row['loss_torch']:.3f}  "
                    f"test-elbo j/t {ej:.3f}/{et:.3f}  "
                    f"drift {row['drift_bpd']:.6f} bpd  "
                    f"[{time.time() - t0:.0f}s]"
                )

    ej, et = eval_both(params, bstats)
    return {
        "history": history,
        "elbo_jax": ej,
        "elbo_torch": et,
        "bpd_jax": -ej / (dims * ln2),
        "bpd_torch": -et / (dims * ln2),
        "drift_bpd": abs(ej - et) / (dims * ln2),
        "steps": steps,
        "wall_s": time.time() - t0,
        "config": dict(
            steps=steps, batch=batch, zdims=tuple(zdims), n_filters=n_filters,
            blocks_per_layer=blocks_per_layer, img=img, conv_pad=conv_pad,
            skip_merge=skip_merge, free_bits=free_bits,
            beta_anneal=beta_anneal, lr=lr, seed=seed,
        ),
    }
