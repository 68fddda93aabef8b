"""Smoke test for scripts/bench_eval.py (the decode-throughput CLI,
reference analogue: eval-side transcribe timing). Tiny model on CPU;
asserts one valid JSON line per requested decoder, including the fused
Pallas path (interpret mode off-TPU)."""

import importlib.util
import json
import os

import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_eval",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "bench_eval.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.medium
def test_bench_eval_tiny_emits_json_per_decoder(capsys):
    mod = _load()
    mod.main([
        "--tiny", "--batch", "2", "--secs", "1", "--iters", "1",
        "--beam_size", "2", "--max_expansions", "2",
        "--decoders", "labelsync,fused,beam_fused",
    ])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    recs = [json.loads(ln) for ln in lines]
    assert [r["decoder"] for r in recs] == [
        "labelsync", "fused", "beam_fused"
    ]
    for r in recs:
        assert r["metric"] == "eval_utts_per_sec"
        assert r["value"] > 0 and r["batch_ms"] > 0
