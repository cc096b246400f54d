"""CI smoke for the two driver artifacts.

``bench.py`` (round-end throughput JSON) and ``__graft_entry__``
(single-chip compile check + multi-chip dry run) are executed by the
round driver, not by users — bitrot there silently costs a round's
benchmark/validation. These tests run both on the CPU backend the suite
already forces (conftest), so the code paths stay green even when the
TPU tunnel is unreachable.
"""

import json

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_bench_smoke_emits_one_json_line(capsys):
    import bench

    bench.main(["--smoke"])
    out = capsys.readouterr().out.strip().splitlines()
    d = json.loads(out[-1])
    assert d["metric"] == "train_images_per_sec_per_chip"
    assert d["unit"] == "images/sec/chip"
    assert d["value"] > 0
    assert d["flops_per_image"] > 0
    # smoke runs on the CPU backend here; the baseline ratio only applies
    # to the mnist preset but must still be present (may be tiny on CPU)
    assert "vs_baseline" in d and "mfu" in d


@pytest.mark.slow
def test_graft_entry_forward_compiles_and_is_finite():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0],)
    assert bool(jnp.all(jnp.isfinite(out)))
