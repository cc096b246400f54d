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
