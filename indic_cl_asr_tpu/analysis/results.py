"""Offline results analysis: metrics -> WER/BWT tables and PDF plots.

Re-design of the reference's results pipeline (reference: results.py:
339-397 `calc_scores`, :433-934 `updated_plot_stats[_multi]`, :243-333
`plot_graph*`, :1003-1086 entry points), which consumes wandb CSV exports.
Ours reads the Logger's metrics.jsonl directly (one file per run; wandb CSV
is also accepted since the metric keys are identical:
``{val|test}/perf_{lang}_{rnnt|ctc}_{wer|noisy_wer|avg_wer}``).

Outputs per metric family:
  * per-run perf matrix [task, lang] (the matrix behind BWT),
  * WER-vs-task line plots per language, average/min/max WER bars across
    runs, box plots, BWT curves — saved as PDFs like the reference's
    results/ artifacts.
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict

import numpy as np

from ..train.driver import LANGUAGES
from ..train.metrics import bwt_scores

_PERF_RE = re.compile(
    r"^(val|test)/perf_(\w+?)_(rnnt|ctc)_(wer|noisy_wer|avg_wer)$"
)


def load_run_metrics(path: str) -> list[dict]:
    """Read a Logger metrics.jsonl (or log.txt — same records)."""
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return records


def load_wandb_csv(path: str) -> list[dict]:
    """Accept a wandb metric-table CSV export (reference results.py:121)."""
    import pandas as pd

    df = pd.read_csv(path)
    return df.to_dict("records")


def collect_perf(
    records: list[dict], split: str = "val", decoder: str = "rnnt",
    kind: str = "avg_wer", languages: list[str] | None = None,
) -> dict[str, list[float]]:
    """{lang: [wer at each recorded eval, in time order]}. The LAST record
    per (lang, task) wins (eval-at-end-of-task)."""
    languages = languages or LANGUAGES
    out: dict[str, list[float]] = defaultdict(list)
    per_task: dict[tuple[str, int], float] = {}
    for rec in records:
        task = rec.get("lang")
        for key, value in rec.items():
            m = _PERF_RE.match(str(key))
            if not m or value is None:
                continue
            s, lang, dec, k = m.groups()
            if s == split and dec == decoder and k == kind:
                if isinstance(task, (int, float)):
                    per_task[(lang, int(task))] = float(value)
    for (lang, task), wer in sorted(per_task.items(), key=lambda kv: kv[0][1]):
        out[lang].append(wer)
    return dict(out)


def perf_matrix(perf: dict[str, list[float]], languages: list[str]):
    """[n_tasks, n_langs] with NaN for unevaluated cells; record i of lang j
    is placed at row (j + i) — i.e. the task at which it was measured."""
    langs = [l for l in languages if l in perf]
    n = max((j + len(perf[l]) for j, l in enumerate(langs)), default=0)
    mat = np.full((n, len(langs)), np.nan)
    for j, lang in enumerate(langs):
        for i, w in enumerate(perf[lang]):
            if j + i < n:
                mat[j + i, j] = w
    return mat, langs


def summarize_run(records, languages=None, split="val"):
    """Per-decoder score summary (calc_scores analogue): avg/min/max WER per
    language + scalar BWT per task."""
    languages = languages or LANGUAGES
    out = {}
    for dec in ("rnnt", "ctc"):
        perf = collect_perf(records, split, dec, "avg_wer", languages)
        mat, langs = perf_matrix(perf, languages)
        summary = {}
        for j, lang in enumerate(langs):
            col = mat[:, j]
            col = col[~np.isnan(col)]
            if len(col):
                summary[lang] = {
                    "avg": float(col.mean()),
                    "min": float(col.min()),
                    "max": float(col.max()),
                    "final": float(col[-1]),
                    "first": float(col[0]),
                }
        sq = np.where(np.isnan(mat), 0.0, mat)
        out[dec] = {
            "per_lang": summary,
            "bwt": bwt_scores(sq).tolist() if mat.size else [],
            "matrix": mat.tolist(),
            "langs": langs,
        }
    return out


# ---------------------------------------------------------------------------
# plotting (PDF families like the reference's results/ dirs)
# ---------------------------------------------------------------------------

def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_wer_vs_task(
    runs: dict[str, list[dict]], out_pdf: str, split="val", decoder="rnnt",
    languages=None,
):
    """One panel per language: WER after each task, one line per run
    (reference 'wer_vs_lang.pdf' family)."""
    plt = _plt()
    languages = languages or LANGUAGES
    perfs = {
        name: collect_perf(recs, split, decoder, "avg_wer", languages)
        for name, recs in runs.items()
    }
    langs = [
        l for l in languages if any(l in p and p[l] for p in perfs.values())
    ]
    if not langs:
        return
    ncols = min(3, len(langs))
    nrows = -(-len(langs) // ncols)
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False
    )
    for idx, lang in enumerate(langs):
        ax = axes[idx // ncols][idx % ncols]
        for name, perf in perfs.items():
            ys = perf.get(lang, [])
            j = langs.index(lang)
            xs = [j + i + 1 for i in range(len(ys))]
            ax.plot(xs, ys, marker="o", label=name)
        ax.set_title(lang)
        ax.set_xlabel("task")
        ax.set_ylabel(f"{decoder} WER")
        ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(out_pdf)
    plt.close(fig)


def plot_bwt(runs, out_pdf, split="val", decoder="rnnt", languages=None):
    plt = _plt()
    languages = languages or LANGUAGES
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, recs in runs.items():
        perf = collect_perf(recs, split, decoder, "avg_wer", languages)
        mat, langs = perf_matrix(perf, languages)
        if not mat.size:
            continue
        scores = bwt_scores(np.where(np.isnan(mat), 0.0, mat))
        ax.plot(range(1, len(scores) + 1), scores, marker="s", label=name)
    ax.set_xlabel("task")
    ax.set_ylabel(f"BWT ({decoder} avg WER)")
    ax.axhline(0, color="gray", lw=0.5)
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_pdf)
    plt.close(fig)


def plot_box(runs, out_pdf, split="val", decoder="rnnt", languages=None):
    plt = _plt()
    languages = languages or LANGUAGES
    data, names = [], []
    for name, recs in runs.items():
        perf = collect_perf(recs, split, decoder, "avg_wer", languages)
        vals = [w for ws in perf.values() for w in ws]
        if vals:
            data.append(vals)
            names.append(name)
    if not data:
        return
    fig, ax = plt.subplots(figsize=(1.2 * len(data) + 2, 4))
    ax.boxplot(data, tick_labels=names)
    ax.set_ylabel(f"{decoder} WER (all langs/tasks)")
    fig.tight_layout()
    fig.savefig(out_pdf)
    plt.close(fig)


def generate_report(
    run_dirs: dict[str, str], out_dir: str, languages=None
) -> dict:
    """Full pipeline: run dirs -> summary json + PDF families
    (reference results.py:1003-1086)."""
    os.makedirs(out_dir, exist_ok=True)
    runs = {
        name: load_run_metrics(os.path.join(d, "metrics.jsonl"))
        for name, d in run_dirs.items()
    }
    summaries = {
        name: summarize_run(recs, languages) for name, recs in runs.items()
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summaries, f, indent=2)
    for dec in ("rnnt", "ctc"):
        plot_wer_vs_task(
            runs, os.path.join(out_dir, f"{dec}_wer_vs_task.pdf"),
            decoder=dec, languages=languages,
        )
        plot_bwt(
            runs, os.path.join(out_dir, f"{dec}_bwt.pdf"), decoder=dec,
            languages=languages,
        )
        plot_box(
            runs, os.path.join(out_dir, f"{dec}_box.pdf"), decoder=dec,
            languages=languages,
        )
    return summaries
