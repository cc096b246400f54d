"""lvae_tpu — a TPU-native Ladder-VAE framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of the PyTorch reference
`addtt/ladder-vae-pytorch` (plus its `boilr` training framework and
`multiobject` dataset dependencies), built TPU-first:

- pure-functional flax.linen model returning a per-layer ELBO pytree
- a single jit'd ``train_step(state, batch, rng)`` with on-device
  preprocessing (dynamic binarization / uniform dequantization)
- device-resident datasets (HBM-resident uint8 arrays, gathered on device)
- data parallelism via ``jax.sharding.Mesh`` + sharding annotations
- Pallas kernels for the fused stochastic block (reparameterization +
  analytic KL) and the importance-weighted log-likelihood logsumexp
- orbax checkpointing, TensorBoard + console logging with EMA'd metrics
  and per-layer KL diagnostics, mirroring the reference CLI

Layer map (see SURVEY.md §1 for the reference's structure this mirrors):
  ops/       — math + distribution primitives (reference: lib/{utils,stochastic,likelihoods}.py)
  models/    — LadderVAE + blocks                (reference: models/lvae.py, lib/nn.py)
  data/      — datasets + device pipelines       (reference: experiment/data.py, lib/datasets.py, multiobject)
  train/     — trainer, state, logging, init     (reference: boilr Trainer / experiment managers)
  eval/      — IW-LL evaluator, image grids      (reference: evaluate.py + boilr test procedure)
  parallel/  — mesh + sharding (new; reference is single-device)
  kernels/   — Pallas TPU kernels (new; reference relies on cuDNN/ATen)
"""

__version__ = "0.1.0"
