import json
import os

import numpy as np

from indic_cl_asr_tpu.analysis.results import (
    collect_perf,
    generate_report,
    perf_matrix,
    summarize_run,
)

LANGS = ["hindi", "bengali", "tamil"]


def fake_records():
    """Simulate a 3-task run's logged eval records."""
    recs = []
    wers = {
        # (lang, task) -> wer
        ("hindi", 0): 0.3, ("hindi", 1): 0.4, ("hindi", 2): 0.5,
        ("bengali", 1): 0.35, ("bengali", 2): 0.45,
        ("tamil", 2): 0.25,
    }
    for (lang, task), w in wers.items():
        recs.append({
            f"val/perf_{lang}_rnnt_avg_wer": w,
            f"val/perf_{lang}_ctc_avg_wer": w + 0.1,
            "epoch": 0, "lang": task,
        })
    return recs


def test_collect_perf_and_matrix():
    perf = collect_perf(fake_records(), "val", "rnnt", "avg_wer", LANGS)
    assert perf["hindi"] == [0.3, 0.4, 0.5]
    assert perf["bengali"] == [0.35, 0.45]
    assert perf["tamil"] == [0.25]

    mat, langs = perf_matrix(perf, LANGS)
    assert langs == LANGS
    assert mat.shape == (3, 3)
    assert mat[0, 0] == 0.3 and mat[2, 0] == 0.5
    assert mat[1, 1] == 0.35 and np.isnan(mat[0, 1])
    assert mat[2, 2] == 0.25


def test_summarize_run_bwt():
    s = summarize_run(fake_records(), LANGS)
    assert s["rnnt"]["per_lang"]["hindi"]["final"] == 0.5
    # bwt task 1: hindi 0.3 -> 0.4 => -0.1
    assert s["rnnt"]["bwt"][1] == -0.10000000000000003 or abs(
        s["rnnt"]["bwt"][1] + 0.1
    ) < 1e-9
    assert s["ctc"]["per_lang"]["tamil"]["final"] == 0.35


def test_generate_report_writes_pdfs(tmp_path):
    run_dir = tmp_path / "run1"
    os.makedirs(run_dir)
    with open(run_dir / "metrics.jsonl", "w") as f:
        for rec in fake_records():
            f.write(json.dumps(rec) + "\n")
    out = str(tmp_path / "report")
    summaries = generate_report(
        {"naive": str(run_dir)}, out, languages=LANGS
    )
    assert "naive" in summaries
    assert os.path.exists(os.path.join(out, "summary.json"))
    for fname in [
        "rnnt_wer_vs_task.pdf", "rnnt_bwt.pdf", "rnnt_box.pdf",
        "ctc_wer_vs_task.pdf",
    ]:
        assert os.path.getsize(os.path.join(out, fname)) > 0
