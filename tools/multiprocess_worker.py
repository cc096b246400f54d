"""Worker process for the REAL multi-process data-parallel smoke run.

Spawned pairwise by ``tests/test_multiprocess.py`` (also runnable by hand):

    python tools/multiprocess_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; ``jax.distributed`` plus gloo CPU
collectives over localhost TCP make the resulting 2x4-device job a genuine
multi-process SPMD run on one box — the closest this no-pod environment
gets to a TPU pod, and the first place ``jax.process_count() > 1``
actually executes (SURVEY.md §2.5 multi-host story; the reference has no
distributed support at all). The data flow is exactly the production
multi-host recipe from ``lvae_tpu.parallel.multihost``:

- ``multihost.initialize`` brings up the distributed runtime,
- ``multihost.global_mesh`` spans ALL processes' devices,
- the replicated dataset and train state are assembled as global arrays,
- ``multihost.make_global_batch_indices`` assembles the globally-sharded
  batch index vector (each device slices out its own shard; the heavy
  image gather happens on device from the replicated dataset),
- the jitted train step's gradient psum crosses the process boundary via
  the gloo collective (on a pod: ICI/DCN, same program).

Prints one ``RESULT {json}`` line the parent test parses; any assertion
failure or hang fails the spawning test.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    # The axon TPU plugin ignores a shell-level JAX_PLATFORMS override, and
    # two processes must not share the single tunneled chip anyway; force
    # the CPU backend before it initializes, and select the gloo
    # cross-process collective implementation (TCP over localhost).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import jax.numpy as jnp
    import numpy as np

    from lvae_tpu.config import ExperimentConfig
    from lvae_tpu.data.registry import load_dataset
    from lvae_tpu.parallel import make_dp_train_step, multihost
    from lvae_tpu.parallel.mesh import replicated
    from lvae_tpu.train import Experiment, make_train_step
    from lvae_tpu.train.state import create_train_state

    multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4

    batch = 16
    bundle = load_dataset("synthetic")
    cfg = ExperimentConfig(
        dataset="synthetic", zdims=(4, 4), downsample=(1, 1),
        blocks_per_layer=1, n_filters=8, skip=True, gated=True,
        learn_top_prior=True, batch_size=batch, dropout=0.1, seed=0,
        rng_impl="threefry", dry_run=True,
    )
    exp = Experiment(cfg, bundle=bundle)

    mesh = multihost.global_mesh()
    rep = replicated(mesh)

    # Identical-by-construction on every process, materialized directly as
    # globally-replicated arrays by running init as one SPMD program.
    x0 = jnp.zeros((8, *bundle.data_shape), jnp.float32)
    state = jax.jit(
        lambda: create_train_state(
            exp.model, exp.tx, x0, cfg.seed, len(cfg.zdims),
            rng_impl=cfg.rng_impl,
        ),
        out_shardings=rep,
    )()
    data_g = jax.make_array_from_process_local_data(
        rep, np.asarray(bundle.train)
    )
    step = make_dp_train_step(
        make_train_step(exp.model, exp.tx, exp.loss_cfg), mesh
    )

    # Sanity: this process feeds a strict, disjoint slice of the batch.
    local = multihost.host_local_indices(np.arange(batch))
    assert len(local) == batch // nproc
    assert local[0] == pid * (batch // nproc)

    elbo = float("nan")
    for i in range(3):
        idx = np.arange(batch) + i * batch
        idx_g = multihost.make_global_batch_indices(mesh, idx)
        state, metrics = step(state, data_g, idx_g)
        elbo = float(jax.device_get(metrics["elbo"]))

    # Production spatial orientation check: global_mesh(spatial=2)'s
    # row-major layout must keep every spatial group on ONE process (halos
    # ride ICI within a host; only the gradient psum crosses hosts).
    mesh_prod = multihost.global_mesh(spatial=2)
    for row in np.asarray(mesh_prod.devices):
        assert len({d.process_index for d in row}) == 1, row

    # Second leg: the same 3 steps on a 2-D (data, space) mesh whose
    # device grid is deliberately TRANSPOSED (unlike the production layout
    # above) so every spatial pair spans both processes — the conv halo
    # exchanges (not just the gradient psum) must cross the process
    # boundary through the gloo collective. threefry + identical
    # seed/batches => the trajectory must agree with the data-parallel leg
    # up to fp reassociation in the differently-sharded reductions.
    from jax.sharding import Mesh

    from lvae_tpu.parallel.mesh import SPATIAL_AXIS, activation_constraint

    grid = np.asarray(jax.devices()).reshape(2, -1).T   # [n_data, 2]
    mesh_sp = Mesh(grid, ("data", SPATIAL_AXIS))
    state_sp = jax.jit(
        lambda: create_train_state(
            exp.model, exp.tx, x0, cfg.seed, len(cfg.zdims),
            rng_impl=cfg.rng_impl,
        ),
        out_shardings=jax.sharding.NamedSharding(
            mesh_sp, jax.sharding.PartitionSpec()
        ),
    )()
    data_sp = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh_sp, jax.sharding.PartitionSpec()),
        np.asarray(bundle.train),
    )
    step_sp = make_dp_train_step(
        make_train_step(
            exp.model, exp.tx, exp.loss_cfg, activation_constraint(mesh_sp)
        ),
        mesh_sp,
    )
    elbo_sp = float("nan")
    for i in range(3):
        idx = np.arange(batch) + i * batch
        idx_g = multihost.make_global_batch_indices(mesh_sp, idx)
        if i == 0:
            # Guard against silent batch corruption on this non-contiguous
            # layout (data shards span processes): the assembled array must
            # have the GLOBAL batch shape and every addressable shard must
            # hold exactly its global slice's values — a per-host
            # contiguous-slice assembly here would produce global shape
            # (batch/2,) with divergent cross-process "replicas".
            assert idx_g.shape == idx.shape, idx_g.shape
            for s in idx_g.addressable_shards:
                np.testing.assert_array_equal(np.asarray(s.data), idx[s.index[0]])
        state_sp, metrics_sp = step_sp(state_sp, data_sp, idx_g)
        elbo_sp = float(jax.device_get(metrics_sp["elbo"]))

    # Third leg: the STREAMING per-host shard path (data/streaming.py /
    # trainer._run_streaming recipe) executed for real across processes:
    # each process's host pipeline (ArrayLoader — the --stream-impl
    # default) reads only its process_index-strided slice of the dataset
    # and contributes its local half of the globally B-sharded batch via
    # make_array_from_process_local_data; the gradient psum again crosses
    # the process boundary. SPMD means both processes must end with
    # bitwise-identical replicated state — the parent test asserts the
    # param checksums match.
    from lvae_tpu.data.streaming import ArrayLoader, make_sharded_streaming_step

    loader = ArrayLoader(
        np.asarray(bundle.train), batch // nproc,
        seed=cfg.seed, shard_index=pid, shard_count=nproc,
    )
    assert loader.n == len(bundle.train) // nproc
    step_stream, put = make_sharded_streaming_step(
        exp.model, exp.tx, exp.loss_cfg, mesh
    )
    state_st = jax.jit(
        lambda: create_train_state(
            exp.model, exp.tx, x0, cfg.seed, len(cfg.zdims),
            rng_impl=cfg.rng_impl,
        ),
        out_shardings=rep,
    )()
    elbo_st = float("nan")
    for batch_np, _ in zip(loader.epochs(), range(3)):
        state_st, metrics_st = step_stream(state_st, put(batch_np))
        elbo_st = float(jax.device_get(metrics_st["elbo"]))
    param_sum_st = float(
        jax.device_get(
            sum(
                jnp.sum(jnp.abs(x))
                for x in jax.tree_util.tree_leaves(state_st.params)
            )
        )
    )

    # Fourth leg: multi-process EVALUATION — Experiment.evaluate and the
    # IW-LL sweep with their sharded jits fed global arrays (the
    # make_global_sharded batch/index assembly and mesh-pinned carry/key).
    # SPMD: both processes must report identical metrics.
    import dataclasses

    from lvae_tpu.eval.iwll import evaluate_iwll

    exp_eval = Experiment(
        dataclasses.replace(cfg, num_data_shards=len(jax.devices())),
        bundle=bundle,
    )
    em = exp_eval.evaluate(state_st, max_batches=2)
    iw = evaluate_iwll(exp_eval, state_st, n_samples=2, max_batches=1)

    # Image dumps pull the replicated state process-local; only process 0
    # computes + writes (multi-writer PNG collisions on shared FS).
    import tempfile

    # per-process dir: on this one-box test a shared path would let
    # process 1 observe process 0's writes and muddy the assertion
    img_run_dir = os.path.join(tempfile.gettempdir(), f"mpimg_{port}_{pid}")
    exp_eval.dump_images(state_st, img_run_dir, step=3, n_samples=4)
    wrote_images = os.path.isdir(os.path.join(img_run_dir, "imgs"))

    # Fifth leg: the SPMD-partitioned mixture Pallas kernel
    # (custom_partitioning, kernels/mixture_pallas.py) under REAL
    # multi-process GSPMD — the batch shards across both processes'
    # devices, each runs the kernel on its local block (tile-friendly:
    # 8 rows/device), and the replicated output must match the
    # locally-computed XLA oracle on every process.
    from jax.sharding import NamedSharding, PartitionSpec

    from lvae_tpu.kernels.mixture_pallas import fused_mix_log_prob
    from lvae_tpu.ops.likelihoods import discretized_logistic_mix_log_prob

    rng5 = np.random.default_rng(5)
    bk = 8 * len(jax.devices())
    xk = np.round(
        rng5.uniform(size=(bk, 8, 8, 3)) * 255.0
    ).astype(np.float32) / 255.0
    pk = rng5.normal(size=(bk, 8, 8, 100)).astype(np.float32)
    shd = NamedSharding(mesh, PartitionSpec("data"))
    per = bk // nproc
    xg = jax.make_array_from_process_local_data(
        shd, xk[pid * per : (pid + 1) * per]
    )
    pg = jax.make_array_from_process_local_data(
        shd, pk[pid * per : (pid + 1) * per]
    )
    mix_out = jax.jit(
        fused_mix_log_prob, in_shardings=(shd, shd), out_shardings=rep
    )(xg, pg)
    mix_want = discretized_logistic_mix_log_prob(
        jnp.asarray(xk), jnp.asarray(pk)
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(mix_out)), np.asarray(mix_want),
        rtol=1e-5, atol=1e-5,
    )

    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "nproc": jax.process_count(),
                "ndev": len(jax.devices()),
                "step": int(jax.device_get(state.step)),
                "elbo": elbo,
                "elbo_spatial": elbo_sp,
                "spatial_mesh": {str(k): int(v) for k, v in mesh_sp.shape.items()},
                "elbo_stream": elbo_st,
                "stream_step": int(jax.device_get(state_st.step)),
                "stream_shard_n": loader.n,
                "param_sum_stream": param_sum_st,
                "eval_elbo": em["elbo"],
                "iw_ll": iw["iw_ll"],
                "wrote_images": wrote_images,
                "mixture_sharded_ok": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
