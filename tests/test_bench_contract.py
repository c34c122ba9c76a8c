"""Bench output-contract tests (driver-visible evidence, VERDICT r4 #1).

The driver parses the LAST JSON line of bench stdout and records only a
TAIL of the output, so the contract is load-bearing: every secondary must
appear in the final recap block, followed by the headline as the last
line.  These tests pin the emit/recap bookkeeping without touching a
device (bench.py only imports jax at module scope; emit/recap are pure
stdout)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _fresh_bench(monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_EMITTED", [])
    monkeypatch.setattr(bench, "_MEASURED", 0.0)
    return bench


def test_recap_replays_secondaries_then_headline_last(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench.emit("metric_a", 1.0)
    bench.emit(bench.HEADLINE_METRIC, 9.0)  # interleaved reprint
    bench.emit("metric_b", 2.0, weights="random-init")
    bench.recap()
    bench.emit(bench.HEADLINE_METRIC, 9.0)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    # last line is the headline (the line the driver parses)
    assert lines[-1]["metric"] == bench.HEADLINE_METRIC
    # the recap block (everything after the last interleaved emit) contains
    # every secondary exactly once, in emission order
    recap = lines[-3:-1]
    assert [l["metric"] for l in recap] == ["metric_a", "metric_b"]
    assert recap[1]["weights"] == "random-init"
    # headline reprints are never duplicated into the recap
    assert sum(l["metric"] == bench.HEADLINE_METRIC for l in lines) == 2


def test_budget_gates_measurement_only(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    assert bench.within_budget()
    bench._charge(bench.BUDGET + 1)
    assert not bench.within_budget()
