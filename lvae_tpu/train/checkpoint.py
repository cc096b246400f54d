"""Checkpoint save/restore with the reference's run-directory contract.

Replaces boilr's checkpointing (SURVEY.md §2.2, §5): state (params, opt
state, batchnorm stats, step, EMA metrics, PRNG key) is saved under
``<output_dir>/checkpoints/<run_name>/`` keeping the last N steps, and the
run's full config is stored as ``config.json`` next to it so
``evaluate.py --load <run_name>`` can rebuild the experiment exactly
(the reference reconstructs the experiment from the stored args).
Backed by orbax's async CheckpointManager.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from lvae_tpu.train.state import TrainState


def _state_to_tree(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema": state.ema,
        # typed PRNG keys are not serializable; store the raw key data
        "rng_data": jax.random.key_data(state.rng),
    }


def _impl_for_key_data(data) -> str:
    """PRNG impl inferred from the raw key-data shape: rbg keys carry four
    uint32 words, threefry two."""
    return "rbg" if data.shape[-1] == 4 else "threefry2x32"


def _tree_to_state(tree: dict, template: TrainState) -> TrainState:
    # Re-wrap with the impl the STORED data implies (rbg key data is [4]x
    # uint32 vs threefry's [2]; wrap_key_data defaults to threefry). Using
    # the stored shape rather than the template keeps checkpoints written
    # under one --rng-impl restorable after the default changed: the run
    # continues on the restored key's own impl.
    return TrainState(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        ema=tree["ema"],
        rng=jax.random.wrap_key_data(
            tree["rng_data"], impl=_impl_for_key_data(tree["rng_data"])
        ),
    )


class CheckpointManager:
    def __init__(self, run_dir: str, keep: int = 2, save_interval: int = 1):
        self.dir = os.path.abspath(os.path.join(run_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_interval
            ),
            # registering the handler lets item_metadata() work on a fresh
            # manager instance (restore-time rng-impl shape detection below)
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        step = int(state.step)
        self._mngr.save(step, args=ocp.args.StandardSave(_state_to_tree(state)))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        tmpl_tree = _state_to_tree(template)
        # rng-impl migration: a checkpoint written under a different
        # --rng-impl stores 2 key words where the template expects 4 (or
        # vice versa). Read the STORED shape from the checkpoint metadata
        # and adapt the template before restoring — no exception-driven
        # retry, so an unrelated restore failure (e.g. a param shape
        # mismatch from wrong architecture flags) surfaces as-is.
        # _tree_to_state then wraps the restored data with the impl its own
        # shape implies, so old checkpoints stay restorable after the
        # default changed.
        try:
            stored = tuple(self._mngr.item_metadata(step).tree["rng_data"].shape)
        except Exception as e:  # noqa: BLE001 — see below
            # orbax's metadata accessor is version-specific (works on the
            # pinned 0.11.x) and may raise anything from KeyError to its
            # own IO errors on older/interrupted checkpoints. Metadata is
            # only an optimization here (it enables rng-impl migration), so
            # ANY failure must degrade to a plain restore — but loudly, so
            # a genuinely broken accessor stays visible.
            logging.warning(
                "checkpoint metadata unreadable (%s: %s) — rng-impl "
                "migration disabled for this restore", type(e).__name__, e,
            )
            stored = None
        if stored is not None and stored != tuple(tmpl_tree["rng_data"].shape):
            impl = "rbg" if stored[-1] == 4 else "threefry2x32"
            tmpl_tree["rng_data"] = jax.random.key_data(
                jax.random.key(0, impl=impl)
            )
        tree = self._mngr.restore(
            step, args=ocp.args.StandardRestore(tmpl_tree)
        )
        return _tree_to_state(tree, template)

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_config(run_dir: str, config: Any) -> None:
    """Write the run's config dataclass as JSON (evaluate.py rebuilds from it)."""
    os.makedirs(run_dir, exist_ok=True)
    d = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else dict(config)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(d, f, indent=2, default=str)


def load_config_dict(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "config.json")) as f:
        return json.load(f)
