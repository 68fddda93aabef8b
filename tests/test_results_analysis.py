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


def fake_records_full(seed=0, shift=0.0):
    """Records with normal/noisy/avg WER kinds over a full 3-task run."""
    rng = np.random.default_rng(seed)
    recs = []
    for task in range(3):
        for j, lang in enumerate(LANGS[: task + 1]):
            base = 0.2 + 0.1 * j + 0.05 * (task - j) + shift
            w = base + 0.01 * rng.standard_normal()
            for dec in ("rnnt", "ctc"):
                recs.append({
                    f"val/perf_{lang}_{dec}_wer": w,
                    f"val/perf_{lang}_{dec}_noisy_wer": w + 0.1,
                    f"val/perf_{lang}_{dec}_avg_wer": w + 0.05,
                    "epoch": 0, "lang": task,
                })
    return recs


def test_calc_scores_contract():
    from indic_cl_asr_tpu.analysis.results import calc_scores

    runs = {"naive": fake_records_full(0), "ewc": fake_records_full(1, -0.05)}
    bwt, avg, mn, mx = calc_scores(runs, "rnnt", "avg", languages=LANGS)
    for run in runs:
        assert set(avg[run]) == set(LANGS)
        for lang in LANGS:
            assert mn[run][lang] <= avg[run][lang] <= mx[run][lang]
    # noisy scores shifted +0.1 over normal
    _, avg_n, _, _ = calc_scores(runs, "rnnt", "noisy", languages=LANGS)
    _, avg_c, _, _ = calc_scores(runs, "rnnt", "", languages=LANGS)
    for lang in LANGS:
        assert abs(avg_n["naive"][lang] - avg_c["naive"][lang] - 0.1) < 1e-9
    # first task has no earlier languages -> BWT 0
    assert bwt["naive"][LANGS[0]] == 0.0


def test_plot_stats_families(tmp_path):
    from indic_cl_asr_tpu.analysis.results import (
        _PDF_NAMES,
        plot_stats,
        plot_stats_multi,
    )

    runs = {"naive": fake_records_full(0), "ewc": fake_records_full(1, -0.05)}
    d1 = str(tmp_path / "bench")
    plot_stats(runs, d1, metrics=("avg", "", "noisy"), languages=LANGS)
    for f in _PDF_NAMES:
        assert os.path.getsize(os.path.join(d1, f)) > 0
    d2 = str(tmp_path / "multi")
    plot_stats_multi(runs, d2, languages=LANGS)
    for f in _PDF_NAMES:
        assert os.path.getsize(os.path.join(d2, f)) > 0


def test_generate_report_reference_dir_structure(tmp_path):
    """The report tree matches the reference results/ structure: benchmark
    dirs, the noisy comparison dir, and requested ablation dirs
    (reference results.py:1003-1086 + results/ listing)."""
    from indic_cl_asr_tpu.analysis.results import _PDF_NAMES

    for name, (seed, shift) in {
        "naive": (0, 0.0), "ewc lambda5": (1, -0.04), "mas ctx0.3": (2, -0.02)
    }.items():
        run_dir = tmp_path / name.replace(" ", "_")
        os.makedirs(run_dir)
        with open(run_dir / "metrics.jsonl", "w") as f:
            for rec in fake_records_full(seed, shift):
                f.write(json.dumps(rec) + "\n")
    out = str(tmp_path / "report")
    run_dirs = {
        "naive": str(tmp_path / "naive"),
        "ewc lambda5": str(tmp_path / "ewc_lambda5"),
        "mas ctx0.3": str(tmp_path / "mas_ctx0.3"),
    }
    generate_report(
        run_dirs, out, languages=LANGS,
        families={"ewc": ["ewc", "naive"], "mas": ["mas", "naive"]},
    )
    for sub in (
        "rnnt_benchmark", "ctc_benchmark", "all_comparison_noisy",
        "ewc_ablation", "mas_ablation",
    ):
        for f in _PDF_NAMES:
            assert os.path.getsize(os.path.join(out, sub, f)) > 0, (sub, f)
