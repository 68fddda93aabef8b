"""Evaluate a real pretrained `.nemo` checkpoint: RNNT + CTC WER.

The one-command harness for the north-star correctness gate (BASELINE.md:
RNNT/CTC WER within 0.5 abs of the reference's pretrained
`ai4bharat/indicconformer_stt_hi_hybrid_rnnt_large`). Reference flow:
cl_baseline.py:122 from_pretrained -> utils.py:120-174 compute_wer/run_eval.

Usage (artifact on disk):
    python scripts/eval_pretrained.py --nemo /path/model.nemo \
        --dataset.manifest_dir manifests/ --languages hindi --split test

Usage (download, needs egress):
    python scripts/eval_pretrained.py \
        --hf ai4bharat/indicconformer_stt_hi_hybrid_rnnt_large ...

Prints one JSON line per (lang, decoder): {"lang", "decoder", "split",
"wer", "n"} plus a summary, ready to diff against the reference numbers.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from _common import setup, build_languages, build_data  # noqa: E402


def main(argv=None):
    cfg, ns = setup(
        argv,
        notes_default="eval_pretrained",
        extra_args={
            "nemo": {"type": str, "default": None},
            "hf": {"type": str, "default": None},
            "split": {"type": str, "default": "test"},
            "decoder": {"type": str, "default": None},
            "beam_size": {"type": int, "default": 4},
            "spm_out_dir": {"type": str, "default": None},
            "local_tokenizer": {"type": str, "default": None},
        },
    )
    import jax

    from indic_cl_asr_tpu.audio.features import FrontendConfig
    from indic_cl_asr_tpu.data.pipeline import BucketSpec
    from indic_cl_asr_tpu.models.nemo_ingest import (
        download_from_hf,
        restore_pretrained,
    )
    from indic_cl_asr_tpu.train.eval import Transcriber

    nemo_path = ns.nemo or os.environ.get("NEMO_PATH")
    if not nemo_path and ns.hf:
        nemo_path = download_from_hf(ns.hf)
    assert nemo_path, "--nemo <path> or --hf <repo_id> required"

    work_dir = ns.spm_out_dir or tempfile.mkdtemp(prefix="nemo_tok_")
    # --local_tokenizer: a MultilingualTokenizer.save() dir (our JSON
    # format) used instead of the checkpoint's SentencePiece models —
    # the path when the sentencepiece library is unavailable
    local_tok = ns.local_tokenizer
    model, variables, model_cfg, tokenizer = restore_pretrained(
        nemo_path, work_dir, with_tokenizer=not local_tok
    )
    if local_tok:
        from indic_cl_asr_tpu.data.tokenizer import MultilingualTokenizer

        tokenizer = MultilingualTokenizer.load(local_tok)
    print(
        f"# restored {nemo_path}: {model_cfg.encoder.n_layers} layers, "
        f"d_model {model_cfg.encoder.d_model}, vocab "
        f"{model_cfg.vocab_size_total} x {model_cfg.n_langs} langs",
        file=sys.stderr,
    )

    languages = build_languages(cfg)
    data = build_data(cfg, languages)
    split = ns.split
    decoders = [ns.decoder] if ns.decoder else ["rnnt", "ctc"]

    tr = Transcriber(
        model=model, model_cfg=model_cfg, tokenizer=tokenizer,
        languages=languages,
        frontend=FrontendConfig(n_mels=model_cfg.encoder.feat_in),
        batch_size=cfg.get("batch_size", 16),
        bucket_spec=BucketSpec(),
        beam_size=ns.beam_size,
    )

    results = []
    for lang in languages:
        td = data[lang]
        entries = {
            "val": td.val_clean, "test": td.test_clean,
            "noisy_val": td.val_noisy, "noisy_test": td.test_noisy,
        }[split]
        for dec in decoders:
            w = tr.compute_wer(variables, entries, dec)
            rec = {
                "lang": lang, "decoder": dec, "split": split,
                "wer": round(float(w), 4), "n": len(entries),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    if results:
        avg = sum(r["wer"] for r in results) / len(results)
        print(json.dumps({"summary_avg_wer": round(avg, 4),
                          "n_evals": len(results)}))
    return results


if __name__ == "__main__":
    main()
