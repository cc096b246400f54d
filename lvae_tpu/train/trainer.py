"""Experiment + Trainer: the training-loop framework.

Replaces boilr's ``Trainer`` / ``VIExperimentManager`` and the reference's
``experiment/experiment_manager.py`` ``LVAEExperiment`` (SURVEY.md §2.1,
§2.2, §3.1): factories (``make_model`` / ``make_optimizer`` / data), the
hot loop around the jit'd train step, and the periodic hooks — EMA'd
console/TB logging with per-layer KL, test-set evaluation, sample /
reconstruction image dumps, and checkpoint save/resume.

TPU-native structure: the loop body is ONE jitted function (gather +
preprocess + fwd/bwd + Adamax + on-device metric EMA) with donated state;
the host only feeds index vectors and occasionally reads back the EMA.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.config import ExperimentConfig
from lvae_tpu.data import DeviceDataset, load_dataset
from lvae_tpu.data.registry import DatasetBundle
from lvae_tpu.eval.viz import save_image_grid
from lvae_tpu.models import LadderVAE
from lvae_tpu.train.checkpoint import (
    CheckpointManager,
    load_config_dict,
    save_config,
)
from lvae_tpu.train.init import data_dependent_init
from lvae_tpu.train.logging import MetricLogger
from lvae_tpu.train.state import (
    LossConfig,
    TrainState,
    create_train_state,
    make_eval_accum_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def p0print(*args, **kwargs) -> None:
    """Single-writer console print: process 0 only. Multi-host runs
    otherwise interleave N copies of every banner / notice (metrics are
    fully replicated, so all processes would print identical lines)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def resolve_fused(
    policy: str, likelihood: str, backend: str, n_mesh_devices: int = 1
) -> dict:
    """Map the ``--fused`` policy string to per-kernel booleans.

    ``auto`` (the default) enables exactly the kernels that measured an
    end-to-end win on this backend (RESULTS.md round 3): the native-layout
    mixture-head kernel (+3.6% img/s, -16% bytes at celeba64-b128) on TPU
    when the model actually has a mixture head — nothing else. The
    stochastic kernel ties XLA's fusion at flagship shapes and the
    [d]ba segment kernel loses 2x, so both stay opt-in. Explicit
    spellings: ``stochastic`` / ``mixture`` / ``segments`` pick one
    kernel; ``pallas`` = stochastic+mixture (round-2 spelling, kept for
    stored run configs); ``all`` = everything.

    ``n_mesh_devices``: the mixture kernel is registered with the SPMD
    partitioner (``custom_partitioning`` elementwise-over-(B,H,W) rule,
    kernels/mixture_pallas.py), so it shards on any mesh with zero extra
    communication and ``auto`` enables it mesh or not. The stochastic and
    segment kernels remain bare ``pallas_call``s — opaque custom calls
    GSPMD cannot shard, so their operands would replicate (all-gather of
    full-resolution activations) or lowering fails. Explicit spellings
    that pick those two on a mesh warn but stay honored (for single-chip
    A/B runs whose stored config is later re-run sharded).

    NOTE: callers must clamp ``num_data_shards`` / ``spatial_shards`` to
    the devices actually available BEFORE constructing the Experiment
    (evaluate.py does) — the count here is taken from the config, not
    from a built mesh, so an unclamped config would warn about a mesh
    that never materializes.
    """
    mixture_head = likelihood == "discretized_logistic_mix"
    if policy == "auto":
        return dict(
            fused_stochastic=False,
            fused_mixture=mixture_head and backend == "tpu",
            fused_segments=False,
        )
    resolved = dict(
        fused_stochastic=policy in ("stochastic", "pallas", "all"),
        fused_mixture=mixture_head and policy in ("mixture", "pallas", "all"),
        fused_segments=policy in ("segments", "all"),
    )
    if n_mesh_devices > 1 and (
        resolved["fused_stochastic"] or resolved["fused_segments"]
    ):
        p0print(
            f"warning: --fused {policy} enables the stochastic/segment "
            f"Pallas kernels on a {n_mesh_devices}-device mesh — those are "
            "opaque to the SPMD partitioner, so their operands replicate "
            "across the mesh (or lowering fails); single-chip wins do not "
            "carry over. (The mixture kernel is mesh-safe.) Prefer --fused "
            "auto/mixture/none for sharded runs."
        )
    return resolved


def make_model(cfg: ExperimentConfig, bundle: DatasetBundle) -> LadderVAE:
    """Model factory (reference LVAEExperiment.make_model)."""
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else None
    return LadderVAE(
        color_ch=bundle.color_ch,
        z_dims=tuple(cfg.zdims),
        blocks_per_layer=cfg.blocks_per_layer,
        n_filters=cfg.n_filters,
        stochastic_skip=cfg.skip,
        skip_merge_mode=cfg.skip_merge,
        gated=cfg.gated,
        downsample=tuple(cfg.downsample),
        learn_top_prior=cfg.learn_top_prior,
        img_size=bundle.padded_size,
        data_size=bundle.img_size,
        likelihood=cfg.likelihood or bundle.default_likelihood,
        batchnorm=cfg.batchnorm,
        bn_stat_samples=cfg.bn_stat_samples,
        dropout_rate=cfg.dropout,
        dropout_impl=cfg.dropout_impl,
        nonlin=cfg.nonlin,
        res_block_type=cfg.residual_type,
        merge_type=cfg.merge_layers,
        resample_mode=cfg.resample_mode,
        conv_pad=cfg.conv_pad,
        no_initial_downscaling=cfg.no_initial_downscaling,
        **resolve_fused(
            cfg.fused,
            cfg.likelihood or bundle.default_likelihood,
            jax.default_backend(),
            max(cfg.num_data_shards, 1) * max(cfg.spatial_shards, 1),
        ),
        dtype=dtype,
        remat=cfg.remat,
    )


def make_loss_config(cfg: ExperimentConfig, bundle: DatasetBundle) -> LossConfig:
    h, w = bundle.img_size
    return LossConfig(
        free_bits=cfg.freebits,
        beta_anneal_steps=cfg.beta_anneal,
        preprocess=bundle.preprocess,
        ema_decay=cfg.ema_decay,
        max_grad_norm=cfg.max_grad_norm,
        data_dims=h * w * bundle.color_ch,
    )


class Experiment:
    """Owns config, model, optimizer, data (reference LVAEExperiment)."""

    def __init__(self, cfg: ExperimentConfig, bundle: Optional[DatasetBundle] = None):
        self.cfg = cfg
        self.bundle = bundle if bundle is not None else load_dataset(
            cfg.dataset, cfg.data_dir
        )
        self.model = make_model(cfg, self.bundle)
        self.loss_cfg = make_loss_config(cfg, self.bundle)
        self.tx = make_optimizer(cfg.lr, cfg.max_grad_norm, cfg.grad_accum)
        self.train_data = DeviceDataset(self.bundle.train)
        self.test_data = DeviceDataset(self.bundle.test)
        # jit once; rebuilding per evaluate() call would recompile at every
        # test interval (jax.jit caches by function identity)
        self._eval_step = jax.jit(make_eval_step(self.model, self.loss_cfg))
        self._eval_init, accum = make_eval_accum_step(
            self.model, self.loss_cfg, len(cfg.zdims)
        )
        # Evaluation parallelizes over the data mesh like training: the
        # batch (and its index vector) shard on the data axis, state and
        # the accumulator replicate; XLA inserts the cross-device reduction
        # for the masked sums. Per-image eval keys make the result
        # independent of the device count (up to summation order).
        self.mesh = None
        if cfg.num_data_shards > 1 or cfg.spatial_shards > 1:
            from lvae_tpu.parallel import make_mesh, replicated, shard_batch

            # 2-D (data, space) mesh when --spatial-shards > 1: training
            # activations shard over image height too (eval stays
            # batch-sharded only — its per-image vmap layout makes height
            # sharding pointless there)
            self.mesh = make_mesh(
                max(cfg.num_data_shards, 1), spatial=cfg.spatial_shards
            )
            rep = replicated(self.mesh)
            sh = shard_batch(self.mesh)
            self._eval_accum = jax.jit(
                accum,
                in_shardings=(rep, sh, sh, rep, rep, rep),
                out_shardings=rep,
                donate_argnums=(5,),
            )
            # multi-process feeding (see evaluate()): the carry and key
            # must be GLOBAL arrays, so build them inside a jit pinned to
            # the mesh (harmless single-process; jitted once here so
            # evaluate() calls don't re-trace)
            self._eval_init_global = jax.jit(self._eval_init, out_shardings=rep)
            self._eval_key_global = jax.jit(
                lambda: jax.random.key(0), out_shardings=rep
            )
        else:
            self._eval_accum = jax.jit(accum, donate_argnums=(5,))

    # ------------------------------------------------------------------
    def init_state(self, data_dep_init: Optional[bool] = None) -> TrainState:
        """Fresh train state. ``data_dep_init=False`` skips the conv-rescale
        stats pass even when the config requests it — callers that restore a
        checkpoint over the result (evaluate.py, --load / --auto-resume)
        would otherwise waste one forward per conv on init that is
        immediately overwritten."""
        if data_dep_init is None:
            data_dep_init = self.cfg.data_dep_init
        x0 = jnp.zeros(
            (min(self.cfg.batch_size, 8), *self.bundle.data_shape), jnp.float32
        )
        state = create_train_state(
            self.model, self.tx, x0, self.cfg.seed, len(self.cfg.zdims),
            rng_impl=self.cfg.rng_impl,
        )
        if data_dep_init:
            k = jax.random.key(self.cfg.seed + 2)
            batch = np.asarray(self.bundle.train[: self.cfg.batch_size])
            from lvae_tpu.data.device import eval_preprocess_batch

            x = eval_preprocess_batch(jnp.asarray(batch), self.bundle.preprocess)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            new_vars = data_dependent_init(
                self.model, variables, x, {"sample": k, "dropout": k}
            )
            state = state.replace(
                params=new_vars["params"],
                batch_stats=new_vars.get("batch_stats", state.batch_stats),
            )
        return state

    # ------------------------------------------------------------------
    def evaluate(self, state: TrainState, max_batches: Optional[int] = None) -> dict:
        """Full test-set ELBO (deterministic preprocessing). Variable-size
        last batch is padded + masked (one compiled shape); all reductions
        accumulate on device and the host fetches a single small dict at
        the end (no per-batch readbacks — DESIGN.md §2b). All eval
        randomness (binarization + latent draws) is keyed per-image on the
        global dataset index, so the metrics are invariant to
        ``--test-batch-size`` and sweep order."""
        bs = min(self.cfg.test_batch_size, self.test_data.n)
        if self.mesh is not None:
            # the sharded batch axis must divide evenly over the DATA axis
            # (eval never shards on 'space'); round up and let the
            # pad+mask absorb the difference
            s = self.mesh.shape["data"]
            bs = -(-bs // s) * s
        # Multi-process: the accum jit's shardings span processes, so every
        # array input must be GLOBAL — carry/key from the mesh-pinned jits,
        # batch/index assembled layout-agnostically from the full host
        # arrays (each device materializes only its own shard).
        from lvae_tpu.parallel import eval_batch_stream

        multi = self.mesh is not None and jax.process_count() > 1
        if multi:
            carry = self._eval_init_global()
            key = self._eval_key_global()
        else:
            carry = self._eval_init()
            key = jax.random.key(0)
        for jidx, batch, n_valid in eval_batch_stream(
            self.mesh, self.test_data, self.bundle.test, bs, max_batches
        ):
            # host scalars replicate by value under multi-process feeding
            n_dev = np.int32(n_valid) if multi else jnp.asarray(n_valid)
            carry = self._eval_accum(state, batch, jidx, key, n_dev, carry)
        tot = jax.device_get(carry)
        count = max(float(tot["count"]), 1.0)
        metrics = {k: float(tot[k]) / count for k in ("ll", "kl", "elbo")}
        metrics["kl_layers"] = np.asarray(tot["kl_layers"]) / count
        metrics["bpd"] = -metrics["elbo"] / (self.loss_cfg.data_dims * np.log(2.0))
        return metrics

    def dump_images(self, state: TrainState, run_dir: str, step: int,
                    logger: Optional[MetricLogger] = None,
                    n_samples: int = 64) -> None:
        """Prior-sample and reconstruction grids (reference additional_testing)."""
        if jax.process_count() > 1:
            # the image jits here are unsharded: only process 0 computes +
            # writes (N hosts writing the same PNGs would collide on a
            # shared FS) — check BEFORE local_copy so the other N-1 hosts
            # skip a full D2H transfer of the train state
            if jax.process_index() != 0:
                return
            from lvae_tpu.parallel import multihost

            state = multihost.local_copy(state)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        samples = self.model.apply(
            variables, n_samples, method="sample_prior",
            rngs={"sample": jax.random.key(step)},
        )["out_mean"]
        img_dir = os.path.join(run_dir, "imgs")
        g1 = save_image_grid(
            np.asarray(samples), os.path.join(img_dir, f"sample_{step}.png")
        )
        # reconstructions: first 32 test images, interleaved orig/recon
        eval_step = self._eval_step
        n = min(32, self.test_data.n)
        idx = jnp.arange(n)
        batch = self.test_data.gather(idx)
        out = eval_step(state, batch, jax.random.key(0), idx)
        from lvae_tpu.data.device import eval_preprocess_batch

        orig = np.asarray(
            eval_preprocess_batch(batch, self.bundle.preprocess, idx)
        )
        recon = np.asarray(out["out_mean"])
        pairs = np.stack([orig, recon], axis=1).reshape(-1, *orig.shape[1:])
        g2 = save_image_grid(
            pairs, os.path.join(img_dir, f"recon_{step}.png"), ncol=8
        )
        # spatial KL heatmaps: batch-mean per-location KL of each layer,
        # upsampled (nearest) to a common resolution, one tile per layer
        # (the per-location KL the stochastic block preserves — SURVEY.md
        # §2.1 lib/stochastic.py)
        maps = []
        hmax = max(m.shape[1] for m in out["kl_spatial"])
        wmax = max(m.shape[2] for m in out["kl_spatial"])
        for m in out["kl_spatial"]:
            mm = np.asarray(m).mean(axis=0)  # [h, w]
            mm = mm / max(mm.max(), 1e-8)
            mm = np.repeat(np.repeat(mm, hmax // mm.shape[0], 0), wmax // mm.shape[1], 1)
            maps.append(mm[..., None])
        g3 = save_image_grid(
            np.stack(maps), os.path.join(img_dir, f"kl_spatial_{step}.png"),
            ncol=len(maps), pad_value=1.0,
        )
        if logger is not None:
            logger.log_images("samples", step, g1)
            logger.log_images("reconstructions", step, g2)
            logger.log_images("kl_spatial", step, g3)


class Trainer:
    """The train loop (reference: boilr Trainer.run)."""

    def __init__(self, experiment: Experiment):
        self.exp = experiment
        self.cfg = experiment.cfg

    def _mesh_checks_and_constraint(self):
        """Validate batch/height divisibility over the mesh and return the
        activation sharding-constraint hook (None without a spatial axis)."""
        cfg, exp = self.cfg, self.exp
        if exp.mesh is None:
            return None
        if cfg.num_data_shards > 1 and cfg.batch_size % cfg.num_data_shards:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"num_data_shards {cfg.num_data_shards}"
            )
        if cfg.spatial_shards > 1:
            # the constraint applies to the PRE-PAD batch (the model pads
            # to padded_size afterwards, with GSPMD re-balancing there),
            # so the data height is what must tile over the space axis
            h = exp.bundle.data_shape[0]
            if h % cfg.spatial_shards:
                raise ValueError(
                    f"image height {h} not divisible by "
                    f"spatial_shards {cfg.spatial_shards}"
                )
        from lvae_tpu.parallel.mesh import activation_constraint

        return activation_constraint(exp.mesh)

    def run(self) -> TrainState:
        """Run training to ``max_steps``. SIGTERM (preemption, job
        schedulers) is mapped to the KeyboardInterrupt path for the
        duration of the run, so both loops save a final checkpoint and
        exit cleanly instead of dying mid-step — paired with
        ``--auto-resume`` this makes preempted runs restartable
        (SURVEY.md §5 failure recovery; the reference loses unsaved
        progress on SIGTERM)."""
        import signal

        def _to_interrupt(signum, frame):
            raise KeyboardInterrupt

        try:
            prev = signal.signal(signal.SIGTERM, _to_interrupt)
            installed = True
        except ValueError:      # not the main thread — leave signals alone
            installed = False
        try:
            return self._run_impl()
        finally:
            if installed:
                signal.signal(signal.SIGTERM, prev or signal.SIG_DFL)

    def _adopt_stored_stream_impl(self, stored_dir: str) -> ExperimentConfig:
        """Data-order continuity on resume: the streaming impl stored in
        the resumed run's config.json wins over the command line / the
        current default. The two backends shuffle differently, so
        switching impls mid-run silently changes the data stream and
        breaks the bitwise resume guarantee; runs from before the
        ArrayLoader existed stored no ``stream_impl`` key — they ran
        grain. To switch impls intentionally, edit the run's config.json
        (and forfeit bitwise resume-exactness across the switch)."""
        cfg = self.cfg
        if not cfg.streaming:
            return cfg
        try:
            stored = load_config_dict(stored_dir)
        except (OSError, ValueError):
            return cfg
        if not stored.get("streaming"):
            return cfg
        stored_impl = stored.get("stream_impl", "grain")
        if stored_impl != cfg.stream_impl:
            import dataclasses

            p0print(
                f"resume: adopting --stream-impl {stored_impl} from the "
                f"run's stored config (this invocation had "
                f"{cfg.stream_impl!r}) — shuffle orders differ between "
                "streaming impls, so the stored impl must continue for "
                "resume-exact data order", flush=True,
            )
            cfg = dataclasses.replace(cfg, stream_impl=stored_impl)
            self.cfg = cfg
        return cfg

    def _run_impl(self) -> TrainState:
        cfg, exp = self.cfg, self.exp
        if jax.process_count() > 1 and exp.mesh is None:
            # Without a mesh there is no gradient psum: every process would
            # train its own diverging replica on its own data copy while
            # racing on the shared checkpoint directory. (The streaming
            # path has an equivalent guard in _run_streaming for the
            # spatial-mesh-only case.)
            raise ValueError(
                f"{jax.process_count()} processes but no device mesh "
                "(num_data_shards and spatial_shards are both 1) — pass "
                "--num-data-shards > 1 so gradients are synchronized "
                "across hosts"
            )
        run_name = cfg.make_run_name()
        run_dir = os.path.join(cfg.output_dir, run_name)

        if cfg.debug_nans:
            # the moral equivalent of a sanitizer for this codebase
            # (SURVEY.md §5 "race detection / sanitizers")
            jax.config.update("jax_debug_nans", True)
        profile_range = None
        if cfg.profile:
            a, b = cfg.profile.split("-")
            profile_range = (int(a), int(b))

        ckpt = None
        logger = MetricLogger(run_dir, enable_tb=not cfg.dry_run)
        if not cfg.dry_run:
            os.makedirs(run_dir, exist_ok=True)
            ckpt = CheckpointManager(run_dir, keep=cfg.keep_checkpoints)

        will_restore = bool(cfg.load) or (
            cfg.auto_resume and ckpt is not None and ckpt.latest_step() is not None
        )
        state = exp.init_state(data_dep_init=False if will_restore else None)
        try:
            if cfg.load:
                load_dir = cfg.load if os.path.isdir(cfg.load) else os.path.join(
                    cfg.output_dir, cfg.load
                )
                restore = CheckpointManager(load_dir, keep=cfg.keep_checkpoints)
                state = restore.restore(state)
                p0print(
                    f"resumed from {load_dir} at step {int(state.step)}", flush=True
                )
                cfg = self._adopt_stored_stream_impl(load_dir)
            elif cfg.auto_resume and ckpt is not None and ckpt.latest_step() is not None:
                # failure recovery: restart with the same run name picks up the
                # latest checkpoint automatically (SURVEY.md §5 "failure
                # detection ... orbax auto-restore of latest step on startup").
                # The run dir's config.json is still the ORIGINAL one here —
                # save_config below runs only after impl reconciliation.
                cfg = self._adopt_stored_stream_impl(run_dir)
                state = ckpt.restore(state)
                p0print(f"auto-resumed {run_dir} at step {int(state.step)}", flush=True)
        finally:
            if not cfg.dry_run and jax.process_index() == 0:
                # one writer on shared filesystems; written after restore so a
                # resumed run's stored stream impl is reconciled first — and in
                # a finally so a failed restore (corrupt/missing checkpoint)
                # still leaves the run dir self-describing for evaluate/resume
                # tooling (config.json next to the checkpoints-dir scaffolding)
                save_config(run_dir, cfg)

        if exp.mesh is not None and jax.process_count() > 1:
            # multi-process jits only accept GLOBAL arrays: promote the
            # (seed-deterministic, identical-everywhere) freshly-built or
            # checkpoint-restored state to a fully-replicated global pytree
            from lvae_tpu.parallel import replicate_to_mesh

            state = replicate_to_mesh(state, exp.mesh)

        k = max(1, cfg.steps_per_call)
        if k > 1 and cfg.max_steps % k:
            # both loops check `step >= max_steps` only between k-step
            # dispatches, so a non-multiple overshoots by up to k-1 steps
            p0print(
                f"warning: max_steps {cfg.max_steps} is not a multiple of "
                f"steps-per-call {k}; the run will stop at step "
                f"{-(-cfg.max_steps // k) * k}", flush=True,
            )

        if cfg.streaming:
            return self._run_streaming(state, run_dir, logger, ckpt)
        constrain = self._mesh_checks_and_constraint()
        if k > 1:
            from lvae_tpu.train.state import make_multi_train_step

            base_step = make_multi_train_step(
                exp.model, exp.tx, exp.loss_cfg, k, constrain
            )
        else:
            base_step = make_train_step(exp.model, exp.tx, exp.loss_cfg, constrain)

        if exp.mesh is not None:
            from lvae_tpu.parallel import make_dp_train_step

            # the one mesh Experiment.__init__ built — train and eval must
            # never construct meshes independently or they could diverge
            train_step = make_dp_train_step(
                base_step, exp.mesh, idx_batch_axis=1 if k > 1 else 0
            )
        else:
            train_step = jax.jit(base_step, donate_argnums=(0,))

        p0print(
            f"run {run_name}: {exp.train_data.n} train / {exp.test_data.n} test "
            f"images, model {exp.model.likelihood} likelihood, "
            f"{sum(x.size for x in jax.tree_util.tree_leaves(state.params)):,} params",
            flush=True,
        )

        if cfg.batch_size > exp.train_data.n:
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds the training set "
                f"({exp.train_data.n} images) — epoch batching would yield "
                "nothing"
            )

        step = int(state.step)
        t_last = time.time()
        steps_since_log = 0
        data = exp.train_data.array
        steps_per_epoch = exp.train_data.n // cfg.batch_size

        def index_stream():
            """Endless stream of [batch] (k=1) or [k, batch] index arrays,
            reshuffling each epoch. Epoch e's shuffle is a pure function of
            (seed, e) and the stream starts at the restored step, so a
            preempted + resumed run consumes exactly the batch sequence an
            uninterrupted run would (resume-exact data order — the
            reference reshuffles from scratch on restart)."""
            epoch, pos = divmod(step, steps_per_epoch)
            buf = []
            while True:
                erng = np.random.default_rng((cfg.seed, epoch))
                for bi, idx in enumerate(
                    exp.train_data.epoch_indices(erng, cfg.batch_size)
                ):
                    if bi < pos:
                        continue
                    if k == 1:
                        yield idx
                    else:
                        buf.append(idx)
                        if len(buf) == k:
                            yield np.stack(buf)
                            buf = []
                pos = 0
                epoch += 1

        def crossed(interval):
            return (step // interval) > ((step - k) // interval)

        # Multi-process feeding: a jit whose in_shardings span processes
        # only accepts GLOBAL arrays. The replicated dataset converts once
        # (identical on every host by construction); the per-dispatch index
        # vector assembles layout-agnostically (each device slices its own
        # shard from the full host vector). Single-process runs keep the
        # plain fast path — behavior is byte-identical there.
        if exp.mesh is not None and jax.process_count() > 1:
            from lvae_tpu.parallel import make_global_sharded, replicate_to_mesh

            data = replicate_to_mesh(data, exp.mesh)
            to_idx = lambda i: make_global_sharded(  # noqa: E731
                exp.mesh, i, batch_axis=1 if k > 1 else 0
            )
        else:
            to_idx = jnp.asarray

        # Bound the async dispatch queue: a cheap scalar sync every
        # _PACE dispatches. Thousands of un-awaited dispatches stall this
        # box's tunneled runtime outright (observed at ~1250 in flight),
        # and on any backend an unbounded queue just buffers host-side.
        _PACE = 64
        calls_since_sync = 0
        tracing = False
        try:
            for idx in index_stream():
                if step >= cfg.max_steps:
                    break
                if profile_range and not tracing and step >= profile_range[0]:
                    jax.profiler.start_trace(os.path.join(run_dir, "trace"))
                    tracing = True
                state, _ = train_step(state, data, to_idx(idx))
                step += k
                steps_since_log += k
                calls_since_sync += 1
                if calls_since_sync >= _PACE:
                    jax.block_until_ready(state.step)
                    calls_since_sync = 0
                if profile_range and tracing and step >= profile_range[1]:
                    jax.block_until_ready(state.ema)
                    jax.profiler.stop_trace()
                    print(
                        f"profiler trace for steps "
                        f"{profile_range[0]}-{profile_range[1]} written to "
                        f"{os.path.join(run_dir, 'trace')}", flush=True,
                    )
                    profile_range = None
                    tracing = False

                if crossed(cfg.log_interval):
                    if cfg.defer_metrics:
                        dt = time.time() - t_last
                    else:
                        # Fetch BEFORE stopping the clock: device_get drains
                        # the async queue, so dt then covers the EXECUTION of
                        # every step in the interval (block_until_ready does
                        # not gate execution on this runtime — DESIGN.md §2b;
                        # timing dispatch-only here once inflated the printed
                        # rate ~20%).
                        ema = jax.device_get(state.ema)
                        dt = time.time() - t_last
                    ips = steps_since_log * cfg.batch_size / dt if dt > 0 else 0.0
                    if cfg.defer_metrics:
                        # No D2H readback: on remote-TPU (tunneled) runtimes a
                        # device->host transfer stalls the host until the whole
                        # async queue has executed (DESIGN.md §2b), bubbling
                        # the dispatch pipeline. Values are fetched once at
                        # the end of the run. NOTE the img/s printed here is a
                        # dispatch rate, not execution throughput — bench.py
                        # is the honest measurement.
                        jax.block_until_ready(state.step)
                        logger.log_deferred(step, ips)
                    else:
                        logger.log_train(step, ema, images_per_sec=ips)
                    t_last = time.time()
                    steps_since_log = 0
                if crossed(cfg.test_interval):
                    m = exp.evaluate(state)
                    logger.log_test(step, m)
                    if not cfg.dry_run:
                        exp.dump_images(state, run_dir, step, logger)
                    t_last = time.time()
                    steps_since_log = 0
                if ckpt is not None and crossed(cfg.checkpoint_interval):
                    ckpt.save(state)
        except KeyboardInterrupt:
            p0print("interrupted — saving final checkpoint", flush=True)

        if cfg.defer_metrics:
            logger.log_train(step, jax.device_get(state.ema))
        if ckpt is not None:
            ckpt.save(state, wait=True)
            ckpt.close()
        logger.close()
        return state

    def _run_streaming(self, state, run_dir, logger, ckpt):
        """Host-pipeline loop (``--streaming``): batches stream from the
        host; preprocessing still runs on device in the jitted step. For
        datasets too large for HBM residency. Backend per
        ``--stream-impl``: 'array' (default; permutation + batched gather,
        host never binds) or 'grain' (worker threads, for disk-bound
        per-record sources) — data/streaming.py module docstring. Composes
        with ``--steps-per-call`` (k-batch stacks under lax.scan) and
        ``--num-data-shards`` (batch sharded over the data mesh, each
        host's pipeline reading its process-strided dataset slice)."""
        cfg, exp = self.cfg, self.exp
        from lvae_tpu.data.streaming import (
            ArrayLoader,
            GrainLoader,
            make_sharded_streaming_step,
            make_streaming_train_step,
        )

        try:
            loader_cls = {"array": ArrayLoader, "grain": GrainLoader}[
                cfg.stream_impl
            ]
        except KeyError:
            raise ValueError(
                f"unknown stream_impl {cfg.stream_impl!r} "
                "(expected 'array' or 'grain')"
            ) from None

        k = max(1, cfg.steps_per_call)
        n_proc = jax.process_count()
        # batch % num_data_shards is validated by _mesh_checks_and_constraint
        # below; the per-process split is streaming-specific
        if cfg.batch_size % n_proc:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide evenly over "
                f"{n_proc} processes"
            )
        if n_proc > 1 and cfg.num_data_shards <= 1:
            # Without a mesh there is no gradient psum: each process would
            # train its own diverging replica on its data shard and the
            # checkpoint would capture only one of them.
            raise ValueError(
                f"streaming with {n_proc} processes requires "
                "--num-data-shards > 1 (a data-parallel mesh) so gradients "
                "are synchronized across hosts"
            )
        self._mesh_checks_and_constraint()   # divisibility validation
        if exp.mesh is not None:
            step_fn, put = make_sharded_streaming_step(
                exp.model, exp.tx, exp.loss_cfg, exp.mesh, steps_per_call=k
            )
        else:
            step_fn = jax.jit(
                make_streaming_train_step(exp.model, exp.tx, exp.loss_cfg, k),
                donate_argnums=(0,),
            )
            put = jnp.asarray
        loader = loader_cls(
            np.asarray(exp.bundle.train),
            cfg.batch_size // n_proc,
            seed=cfg.seed,
            steps_per_call=k,
            shard_index=jax.process_index(),
            shard_count=n_proc,
        )
        step = int(state.step)
        t_last = time.time()
        steps_since_log = 0
        p0print(
            f"streaming pipeline ({cfg.stream_impl}), batch {cfg.batch_size}, "
            f"{k} steps/call, {cfg.num_data_shards} data shards", flush=True,
        )
        try:
            # start_step: resume-exact fast-forward (O(1) random-access
            # slice of the shuffled stream) — same guarantee as the
            # device-resident index_stream
            for batch in loader.epochs(start_step=step):
                if step >= cfg.max_steps:
                    break
                state, _ = step_fn(state, put(batch))
                step += k
                steps_since_log += k
                if (step // cfg.log_interval) > ((step - k) // cfg.log_interval):
                    dt = time.time() - t_last
                    ips = steps_since_log * cfg.batch_size / dt if dt > 0 else 0.0
                    if cfg.defer_metrics:
                        jax.block_until_ready(state.step)
                        logger.log_deferred(step, ips)
                    else:
                        logger.log_train(step, jax.device_get(state.ema),
                                         images_per_sec=ips)
                    t_last, steps_since_log = time.time(), 0
                if (step // cfg.test_interval) > ((step - k) // cfg.test_interval):
                    logger.log_test(step, exp.evaluate(state))
                    t_last, steps_since_log = time.time(), 0
                if ckpt is not None and (
                    (step // cfg.checkpoint_interval)
                    > ((step - k) // cfg.checkpoint_interval)
                ):
                    ckpt.save(state)
        except KeyboardInterrupt:
            p0print("interrupted — saving final checkpoint", flush=True)
        if cfg.defer_metrics:
            logger.log_train(step, jax.device_get(state.ema))
        if ckpt is not None:
            ckpt.save(state, wait=True)
            ckpt.close()
        logger.close()
        return state
