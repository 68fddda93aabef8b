"""WER and continual-learning metrics (perf matrix, BWT).

Semantics preserved from the reference:
  * WER = sum(edit_distance(hyp_words, ref_words)) / sum(len(ref_words))
    over the eval set (reference: utils.py:120-145 `compute_wer`);
  * perf matrix P[step, lang] of WERs after each task
    (utils.py:179-190 `compute_perf_matrix`);
  * BWT curves: for language i trained at task i,
    bwt(i, t) = P[i, i] - P[t, i] for t > i (utils.py:192-209
    `compute_bwt_new`); scalar per-task BWT =
    sum_{i<t}(P[i][i] - P[i][t]) / max(t, 1) (results.py:385-392).

Edit distance is implemented here (banded O(nm) DP); a C++ fast path is
provided by native/editdistance (see indic_cl_asr_tpu.utils.native) and used
automatically when built.
"""

from __future__ import annotations

import numpy as np


def edit_distance(a: list, b: list) -> int:
    """Levenshtein distance between two token sequences (native C++ fast
    path when native/libindic_native.so builds; exact-equal fallback)."""
    from ..utils.native import edit_distance_native

    d = edit_distance_native(a, b)
    return d if d is not None else edit_distance_py(a, b)


def edit_distance_py(a: list, b: list) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, y in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,          # deletion
                cur[j - 1] + 1,       # insertion
                prev[j - 1] + (x != y),  # substitution
            )
        prev = cur
    return prev[-1]


def wer(refs: list[str], hyps: list[str]) -> float:
    """Aggregate word error rate (reference utils.py:129-145)."""
    total_errors = 0
    total_words = 0
    for ref, hyp in zip(refs, hyps):
        ref_words = ref.strip().split()
        hyp_words = hyp.strip().split()
        total_errors += edit_distance(hyp_words, ref_words)
        total_words += len(ref_words)
    return total_errors / total_words if total_words else 0.0


def cer(refs: list[str], hyps: list[str]) -> float:
    total_errors = 0
    total_chars = 0
    for ref, hyp in zip(refs, hyps):
        total_errors += edit_distance(list(hyp.strip()), list(ref.strip()))
        total_chars += len(ref.strip())
    return total_errors / total_chars if total_chars else 0.0


# ---------------------------------------------------------------------------
# continual-learning metrics
# ---------------------------------------------------------------------------

def compute_perf_matrix(
    val_performance: dict[str, list[dict]], metric: str = "rnnt_wer"
) -> tuple[np.ndarray, list[str]]:
    """{lang: [record-per-task, ...]} -> [n_steps, n_langs] matrix (NaN where
    a language wasn't evaluated yet)."""
    langs = list(val_performance.keys())
    max_len = max((len(v) for v in val_performance.values()), default=0)
    perf = np.full((max_len, len(langs)), np.nan)
    for j, lang in enumerate(langs):
        for i, record in enumerate(val_performance[lang]):
            perf[i, j] = record[metric]
    return perf, langs


def compute_bwt_curves(
    val_perf: dict[str, list[dict]], metric: str = "rnnt_wer"
) -> dict[str, list[tuple[int, float]]]:
    """Per-language (task_index_1based, wer_ii - wer_ti) points."""
    langs = list(val_perf.keys())
    curves: dict[str, list[tuple[int, float]]] = {l: [] for l in langs}
    for i, lang in enumerate(langs):
        if i >= len(val_perf[lang]):
            continue
        wer_ii = val_perf[lang][i][metric]
        for t in range(i + 1, len(langs)):
            if t < len(val_perf[lang]):
                curves[lang].append((t + 1, wer_ii - val_perf[lang][t][metric]))
    return curves


def bwt_scores(perf: np.ndarray) -> np.ndarray:
    """Scalar BWT per task t over a [step, lang] matrix:
    sum_{i<t}(P[i, i] - P[t, i]) / max(t, 1) — i.e. for every earlier
    language i, its WER right after its own task minus its WER after task t
    (results.py:385-392; that code indexes an all_perf[lang][task] transpose
    of this layout)."""
    n = perf.shape[1]
    out = np.zeros(n)
    for t in range(n):
        acc = 0.0
        for i in range(t):
            acc += perf[i][i] - perf[t][i]
        out[t] = acc / max(t, 1)
    return out
