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


class TestLivenessRetry:
    """assert_device_alive must survive transient tunnel outages (retry
    with backoff) and, on final failure, emit the documented structured
    JSON citing the last verified result — never a bare empty record
    (BENCH_r04.json's `parsed: null` is the motivating corpse)."""

    def test_retries_until_probe_succeeds(self):
        import bench

        calls = {"probe": 0, "sleep": []}

        def fake_probe(timeout_s):
            calls["probe"] += 1
            return calls["probe"] >= 3  # two failures, then revival

        bench.assert_device_alive(
            timeout_s=1.0, retries=3, backoff_s=42.0,
            _probe=fake_probe, _sleep=lambda s: calls["sleep"].append(s),
        )
        assert calls["probe"] == 3
        assert calls["sleep"] == [42.0, 42.0]  # backoff between retries only

    def test_immediate_success_probes_once(self):
        import bench

        calls = {"probe": 0}

        def fake_probe(timeout_s):
            calls["probe"] += 1
            return True

        bench.assert_device_alive(_probe=fake_probe, _sleep=lambda s: 0)
        assert calls["probe"] == 1

    def test_final_failure_emits_structured_json(self, capsys, monkeypatch, tmp_path):
        import bench

        # divert the hard exit so the test can inspect stdout
        exited = {}
        monkeypatch.setattr(bench.os, "_exit", lambda rc: exited.update(rc=rc))
        last = tmp_path / "last.json"
        last.write_text(json.dumps({
            "value": 35317.0, "unit": "images/sec/chip",
            "vs_baseline": 3.53, "timestamp_utc": "2026-08-18T19:48:00Z",
        }))
        monkeypatch.setattr(bench, "LAST_VERIFIED_PATH", str(last))

        bench.assert_device_alive(
            timeout_s=1.0, retries=3, backoff_s=5.0,
            _probe=lambda t: False, _sleep=lambda s: None,
        )
        assert exited["rc"] == 2
        out = capsys.readouterr().out.strip().splitlines()
        d = json.loads(out[-1])
        # the documented failure schema: success-envelope keys + diagnosis
        assert d["metric"] == "train_images_per_sec_per_chip"
        assert d["value"] is None and d["vs_baseline"] is None
        assert d["error"] == "device_unreachable"
        assert "3 liveness probes" in d["detail"]
        assert d["last_verified"]["value"] == 35317.0
        assert d["last_verified"]["timestamp_utc"] == "2026-08-18T19:48:00Z"

    def test_final_failure_without_history_still_parses(self, capsys, monkeypatch):
        import bench

        exited = {}
        monkeypatch.setattr(bench.os, "_exit", lambda rc: exited.update(rc=rc))
        monkeypatch.setattr(bench, "LAST_VERIFIED_PATH", "/nonexistent/x.json")
        bench.assert_device_alive(
            timeout_s=1.0, retries=2, backoff_s=5.0,
            _probe=lambda t: False, _sleep=lambda s: None,
        )
        assert exited["rc"] == 2
        d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert d["error"] == "device_unreachable"
        assert d["last_verified"] is None

    def test_success_records_last_verified(self, monkeypatch, tmp_path):
        import bench

        last = tmp_path / "last.json"
        monkeypatch.setattr(bench, "LAST_VERIFIED_PATH", str(last))
        bench.record_last_verified({
            "value": 123.0, "unit": "images/sec/chip", "vs_baseline": 0.01,
            "mfu": 0.3, "config": {"preset": "mnist"}, "device": "cpu",
        })
        d = json.loads(last.read_text())
        assert d["value"] == 123.0
        assert d["config"] == {"preset": "mnist"}
        assert "timestamp_utc" in d


@pytest.mark.slow
def test_graft_entry_forward_compiles_and_is_finite():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0],)
    assert bool(jnp.all(jnp.isfinite(out)))
