"""Graceful preemption: SIGTERM during training saves a final checkpoint
and exits cleanly, and --auto-resume continues from it (SURVEY.md §5
failure recovery — the reference has no SIGTERM handling and loses any
progress since its last periodic checkpoint)."""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import main
main.main([
    "--dataset", "synthetic", "--zdims", "4", "4", "--downsample", "1", "1",
    "--blocks-per-layer", "1", "--n-filters", "8", "--batch-size", "16",
    "--max-steps", "1000000", "--log-interval", "25",
    "--test-interval", "100000000", "--checkpoint-interval", "100000000",
    "--run-name", "term", "--output-dir", {out!r},
    ] + {extra!r})
"""


def _spawn(tmp_path, extra=()):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(out=str(tmp_path), extra=list(extra))],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        cwd=REPO,
        env=env,
    )


# ---------------------------------------------------------------------------
# Chaos composition (VERDICT r4 next #6): SIGTERM mid-epoch with EVERY
# distribution feature on at once — --streaming --stream-impl array
# --num-data-shards 4 --spatial-shards 2 --steps-per-call 4 — then
# --auto-resume, asserting the final state is BITWISE identical to an
# uninterrupted run. The pieces (resume-exact data order, sharded stream,
# spatial mesh, SIGTERM checkpoint) are tested separately elsewhere; this
# composes them on the 8-device virtual mesh (SURVEY §4
# "distributed-without-a-cluster").
# ---------------------------------------------------------------------------

_CHAOS_FLAGS = [
    # synthetic:96 -> bpe = 96/16 = 6 steps/epoch; SIGTERM lands on a
    # steps-per-call (4) boundary, so most interrupt points are mid-epoch
    "--dataset", "synthetic:96", "--zdims", "4", "4",
    "--downsample", "1", "1", "--blocks-per-layer", "1",
    "--n-filters", "8", "--batch-size", "16", "--dropout", "0.0",
    "--streaming", "--stream-impl", "array", "--num-data-shards", "4",
    "--spatial-shards", "2", "--steps-per-call", "4",
    "--log-interval", "4", "--test-interval", "100000000",
    "--checkpoint-interval", "100000000", "--seed", "7",
]

_CHAOS_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")
import main
main.main({flags!r} + [
    "--max-steps", {max_steps!r}, "--run-name", {run!r},
    "--output-dir", {out!r},
] + {extra!r})
"""

_DIGEST_CHILD = """
import dataclasses, hashlib
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from lvae_tpu.config import config_from_dict
from lvae_tpu.train import CheckpointManager, Experiment, load_config_dict

run_dir = {run!r}
cfg = dataclasses.replace(
    config_from_dict(load_config_dict(run_dir)), dry_run=True
)
exp = Experiment(cfg)
st = CheckpointManager(run_dir, keep=2).restore(
    exp.init_state(data_dep_init=False)
)
h = hashlib.sha256()
h.update(str(int(st.step)).encode())
for tree in (st.params, st.opt_state, st.batch_stats, st.ema):
    for leaf in jax.tree_util.tree_leaves(tree):
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
print("STEP", int(st.step))
print("DIGEST", h.hexdigest())
"""


def _chaos_env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return env


def _run_child(code, timeout=560):
    r = subprocess.run(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=_chaos_env(), timeout=timeout,
    )
    return r.returncode, r.stdout


def _digest(tmp_path, run):
    rc, out = _run_child(
        _DIGEST_CHILD.format(run=os.path.join(str(tmp_path), run))
    )
    assert rc == 0, f"digest child failed:\n{out}"
    step = int(out.split("STEP", 1)[1].split()[0])
    dig = out.split("DIGEST", 1)[1].split()[0]
    return step, dig


@pytest.mark.slow
def test_chaos_sigterm_composed_resume_is_bitwise(tmp_path):
    # phase 1: open-ended composed run, preempt after the first [train] log
    code = _CHAOS_CHILD.format(
        flags=_CHAOS_FLAGS, max_steps="1000000", run="chaos",
        out=str(tmp_path), extra=[],
    )
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=_chaos_env(),
    )
    try:
        deadline = time.time() + 400
        for line in p.stdout:
            if "[train]" in line or time.time() > deadline:
                break
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=240)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, f"chaos child did not exit cleanly:\n{out}"
    assert "interrupted — saving final checkpoint" in out

    ckdir = os.path.join(tmp_path, "chaos", "checkpoints")
    s1 = max(int(d) for d in os.listdir(ckdir))
    assert s1 >= 4 and s1 % 4 == 0  # dispatch-aligned preemption point
    target = s1 + 16  # 4 more dispatches, crossing epoch boundaries (bpe 6)

    # phase 2: auto-resume the SAME run dir to the target step
    rc, out2 = _run_child(
        _CHAOS_CHILD.format(
            flags=_CHAOS_FLAGS, max_steps=str(target), run="chaos",
            out=str(tmp_path), extra=["--auto-resume"],
        )
    )
    assert rc == 0, f"resume child failed:\n{out2}"
    assert f"auto-resumed" in out2 and f"step {s1}" in out2

    # phase 3: uninterrupted reference run to the same target
    rc, out3 = _run_child(
        _CHAOS_CHILD.format(
            flags=_CHAOS_FLAGS, max_steps=str(target), run="ref",
            out=str(tmp_path), extra=[],
        )
    )
    assert rc == 0, f"reference child failed:\n{out3}"

    step_a, dig_a = _digest(tmp_path, "chaos")
    step_b, dig_b = _digest(tmp_path, "ref")
    assert step_a == step_b == target
    assert dig_a == dig_b, (
        "interrupted+resumed final state differs from uninterrupted "
        f"(step {target}):\nchaos: {dig_a}\nref:   {dig_b}"
    )


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_auto_resume_continues(tmp_path):
    p = _spawn(tmp_path)
    try:
        # wait until the hot loop is demonstrably running (a [train] log),
        # then preempt it
        deadline = time.time() + 300
        for line in p.stdout:
            if "[train]" in line or time.time() > deadline:
                break
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, f"child did not exit cleanly:\n{out}"
    assert "interrupted — saving final checkpoint" in out

    # the only checkpoint interval was huge, so any checkpoint on disk came
    # from the SIGTERM path
    ckdir = os.path.join(tmp_path, "term", "checkpoints")
    steps = [int(d) for d in os.listdir(ckdir)]
    assert steps and max(steps) > 0

    # restartability: --auto-resume picks up the preempted step
    p2 = _spawn(tmp_path, extra=["--auto-resume"])
    try:
        resumed_at = None
        deadline = time.time() + 300
        for line in p2.stdout:
            if line.startswith("auto-resumed"):
                resumed_at = int(line.rsplit("step", 1)[1])
            if "[train]" in line or time.time() > deadline:
                break
        p2.send_signal(signal.SIGTERM)
        out2, _ = p2.communicate(timeout=120)
    finally:
        if p2.poll() is None:
            p2.kill()
    assert p2.returncode == 0, f"resume child did not exit cleanly:\n{out2}"
    assert resumed_at == max(steps), f"expected resume at {max(steps)}:\n{out2}"
