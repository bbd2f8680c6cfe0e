"""bench.py contract tests (CPU): algorithm pick and JSON emission."""

import importlib.util
import json
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_pick_algo_cpu_falls_back_to_merged():
    """On a non-TPU backend the Pallas kernels can't compile; the driver
    benchmark must select the jnp pipeline."""
    assert bench.pick_algo() == "merged"


def test_main_emits_one_json_line(monkeypatch, capsys):
    """The driver contract: exactly one JSON line on stdout, emitted even
    when only one configuration succeeds."""
    calls = []

    class FakeResult:
        throughput_best = 1234.5

        def line(self):
            return "fake"

    def fake_benchmark(name, algo, batch, iters):
        calls.append((name, algo, batch))
        if len(calls) > 1:
            raise RuntimeError("boom")        # diagnostics may fail freely
        return FakeResult()

    monkeypatch.setattr("qtesla_tpu.utils.timing.benchmark_polymul",
                        fake_benchmark)
    assert bench.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    doc = json.loads(out[0])
    assert doc["unit"] == "polymuls/s/chip" and doc["value"] == 1234.5
