"""scripts/profile_step.py — summarizer unit test (pure; no trace needed)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "profile_step", os.path.join(REPO, "scripts", "profile_step.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summarize_categories_and_top_ops():
    ps = _load()
    rows = [
        {"hlo_op_name": "fusion.1", "category": "convolution fusion",
         "total_self_time": 600.0, "occurrences": 3, "bound_by": "Compute",
         "measured_memory_bw": 500.0, "model_flop_rate": 9e4,
         "tf_op_name": "jit(step)/conv"},
        {"hlo_op_name": "fusion.2", "category": "loop fusion",
         "total_self_time": 300.0, "occurrences": 12, "bound_by": "HBM",
         "measured_memory_bw": 700.0, "model_flop_rate": 0.0,
         "tf_op_name": "jit(step)/add"},
        {"hlo_op_name": "copy.3", "category": "copy",
         "total_self_time": 100.0, "occurrences": 1, "bound_by": "HBM",
         "measured_memory_bw": 400.0, "model_flop_rate": None,
         "tf_op_name": None},
    ]
    s = ps._summarize(rows, top=2)
    assert s["total_self_time_us"] == 1000.0
    assert s["by_category"][0] == {
        "category": "convolution fusion", "us": 600.0, "pct": 60.0
    }
    assert s["by_bound"] == {"Compute": 60.0, "HBM": 40.0}
    assert len(s["top_ops"]) == 2
    assert s["top_ops"][0]["op"] == "fusion.1"
    assert s["top_ops"][1]["pct"] == 30.0


def test_cli_reads_existing_trace(tmp_path, capsys, monkeypatch):
    """--logdir with no .xplane.pb must exit with a clear error rather than
    silently re-capturing on whatever backend is default."""
    ps = _load()
    monkeypatch.setattr(
        sys, "argv",
        ["profile_step.py", "--logdir", str(tmp_path), "--steps", "0"],
    )
    # empty logdir -> capture path would run; stub _capture to prove the
    # CLI wires --steps/--logdir through without touching a backend
    called = {}

    def fake_capture(steps, logdir):
        called["args"] = (steps, logdir)
        raise SystemExit(0)

    monkeypatch.setattr(ps, "_capture", fake_capture)
    try:
        ps.main()
    except SystemExit:
        pass
    assert called["args"] == (0, str(tmp_path))
