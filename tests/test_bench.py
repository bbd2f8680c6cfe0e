"""bench.py contract tests (CPU): algorithm pick and JSON emission."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_pick_algo_cpu_falls_back_to_merged():
    """On a non-TPU backend the Pallas kernels can't compile; the driver
    benchmark must select the jnp pipeline."""
    assert bench.pick_algo() == "merged"


def test_main_emits_one_json_line_last(monkeypatch, capsys):
    """The driver contract: exactly one JSON line on stdout, emitted as the
    LAST act (after every diagnostic — round-3 regression: the JSON printed
    first and the diagnostics scrolled it out of the driver's tail
    capture), even when only one configuration succeeds."""
    calls = []
    order = []

    class FakeResult:
        throughput_best = 1234.5
        min_s = 1.0

        def line(self):
            return "fake"

    def fake_benchmark(name, algo, batch, iters, inner=1):
        calls.append((name, algo, batch))
        if len(calls) > 1:
            raise RuntimeError("boom")        # diagnostics may fail freely
        return FakeResult()

    monkeypatch.setattr("qtesla_tpu.utils.timing.benchmark_polymul",
                        fake_benchmark)
    # the cpu-mesh subprocess is exercised by the slow-tier test below
    monkeypatch.setattr(bench, "_cpu_mesh_validation",
                        lambda: order.append("mesh"))
    monkeypatch.setattr(bench, "_diagnostics",
                        lambda *a: order.append("diag"))
    assert bench.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    doc = json.loads(out[0])
    assert doc["unit"] == "polymuls/s/chip" and doc["value"] == 1234.5
    # diagnostics ran BEFORE the JSON was printed
    assert order == ["diag", "mesh"]


@pytest.mark.slow
def test_cpu_mesh_validation_runs(capsys):
    """The real cpu-mesh scaling subprocess: rows must carry the
    virtual-device caveat fields (round-3 VERDICT item 3)."""
    bench._cpu_mesh_validation()
    err = capsys.readouterr().err
    assert "cpu-mesh scaling:" in err
    assert '"virtual_devices": true' in err
