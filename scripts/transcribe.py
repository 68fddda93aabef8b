"""Transcribe WAV files or a manifest with a trained run or a `.nemo`.

The user-facing CLI over `train.eval.Transcriber`, mirroring the
reference's `model.transcribe(audio, batch_size, language_id)` entry
point (hybrid_rnnt_ctc_models.py:262-346) and its inference notebook
flow. Runs are self-contained (config.json + tokenizer/ + sequence/
checkpoints are written by every driver — see scripts/_common.py
build_all), so this needs only the run directory:

    # latest task checkpoint of a CL run, greedy RNNT
    python scripts/transcribe.py --run outputs/<run_id> \
        --lang hindi utt1.wav utt2.wav

    # a specific task checkpoint, CTC decoder, manifest input + WER
    python scripts/transcribe.py --run outputs/<run_id> --task 0:hindi \
        --decoder ctc --manifest test.json --wer

    # a pretrained NeMo artifact instead of a run
    python scripts/transcribe.py --nemo model.nemo --lang hindi utt.wav

Prints one JSON line per utterance: {"audio_filepath", "lang", "text"}
(+ "ref" when the manifest carries transcripts), then a summary line
with the WER when --wer is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wavs", nargs="*", help="WAV files to transcribe")
    p.add_argument("--run", help="run directory written by a driver")
    p.add_argument("--nemo", help="pretrained .nemo artifact instead")
    p.add_argument(
        "--task", default=None,
        help="which sequence checkpoint, as idx:lang (default: latest)",
    )
    p.add_argument("--lang", default=None, help="language id for routing")
    p.add_argument("--manifest", help="manifest JSONL instead of WAV args")
    p.add_argument(
        "--decoder", default="rnnt",
        choices=["rnnt", "ctc", "rnnt_beam", "rnnt_beam_host", "ctc_beam"],
    )
    p.add_argument("--beam_size", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--wer", action="store_true",
                   help="score against manifest transcripts")
    p.add_argument("--out", default=None, help="also write JSONL here")
    return p.parse_args(argv)


def restore_run(run_dir: str):
    """Rebuild (model, variables, model_cfg, tokenizer, languages) from a
    self-contained run directory."""
    import jax

    from indic_cl_asr_tpu.data.tokenizer import MultilingualTokenizer
    from indic_cl_asr_tpu.models.hybrid import init_model
    from indic_cl_asr_tpu.utils.checkpoint import SequenceCheckpointer
    from indic_cl_asr_tpu.utils.config import ConfigDict

    from _common import build_languages, build_model_cfg  # noqa: E402

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = ConfigDict(json.load(f))
    tokenizer = MultilingualTokenizer.load(os.path.join(run_dir, "tokenizer"))
    languages = build_languages(cfg)
    model_cfg = build_model_cfg(cfg, tokenizer, languages)
    model, variables = init_model(model_cfg, jax.random.PRNGKey(cfg.seed))

    ckpt = SequenceCheckpointer(os.path.join(run_dir, "sequence"))
    return model, variables, model_cfg, tokenizer, languages, cfg, ckpt


def load_task_variables(run_dir, variables, task: str | None, ckpt):
    """Pull params/batch_stats out of a saved full-TrainState checkpoint."""
    from flax import serialization

    from indic_cl_asr_tpu.utils.checkpoint import load_pytree

    if task:
        idx_s, lang = task.split(":", 1)
        idx = int(idx_s)
    else:
        latest = ckpt.latest_task()
        assert latest is not None, (
            f"no completed tasks in {run_dir}/sequence — pass --task or "
            "train first"
        )
        idx, lang = latest
    raw = load_pytree(os.path.join(run_dir, "sequence", f"task_{idx}_{lang}"))
    restored = serialization.from_state_dict(
        variables,
        {"params": raw["params"], "batch_stats": raw["batch_stats"]},
    )
    print(f"# restored task {idx} ({lang})", file=sys.stderr)
    return restored


def main(argv=None):
    ns = parse_args(argv)
    assert ns.run or ns.nemo, "--run <dir> or --nemo <path> required"
    assert ns.wavs or ns.manifest, "give WAV files or --manifest"

    from indic_cl_asr_tpu.audio.features import FrontendConfig
    from indic_cl_asr_tpu.data.manifest import ManifestEntry, read_manifest
    from indic_cl_asr_tpu.data.pipeline import BucketSpec
    from indic_cl_asr_tpu.train.eval import Transcriber

    if ns.run:
        model, variables, model_cfg, tokenizer, languages, cfg, ckpt = (
            restore_run(ns.run)
        )
        variables = load_task_variables(ns.run, variables, ns.task, ckpt)
    else:
        from indic_cl_asr_tpu.models.nemo_ingest import restore_pretrained

        work = tempfile.mkdtemp(prefix="nemo_tok_")
        model, variables, model_cfg, tokenizer = restore_pretrained(
            ns.nemo, work
        )
        languages = list(getattr(tokenizer, "langs", [ns.lang or "0"]))

    if ns.manifest:
        entries = read_manifest(ns.manifest)
        if ns.lang:
            entries = [e for e in entries if e.lang == ns.lang] or entries
    else:
        lang = ns.lang or languages[0]
        assert lang in languages, f"--lang must be one of {languages}"
        import wave

        entries = []
        for p in ns.wavs:
            try:
                with wave.open(p, "rb") as w:
                    dur = w.getnframes() / w.getframerate()
            except Exception:
                dur = 0.0
            entries.append(ManifestEntry(
                audio_filepath=p, duration=dur, text="", lang=lang
            ))

    tr = Transcriber(
        model=model, model_cfg=model_cfg, tokenizer=tokenizer,
        languages=languages,
        frontend=FrontendConfig(n_mels=model_cfg.encoder.feat_in),
        batch_size=ns.batch_size, bucket_spec=BucketSpec(),
        beam_size=ns.beam_size,
    )
    hyps = tr.transcribe(variables, entries, ns.decoder)

    sink = open(ns.out, "w") if ns.out else None
    for e, h in zip(entries, hyps):
        rec = {"audio_filepath": e.audio_filepath, "lang": e.lang, "text": h}
        if e.text:
            rec["ref"] = e.text
        line = json.dumps(rec, ensure_ascii=False)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
    if sink:
        sink.close()

    if ns.wer:
        from indic_cl_asr_tpu.train.metrics import wer

        refs = [e.text for e in entries]
        w = wer(refs, hyps)
        print(json.dumps({"wer": round(float(w), 4), "n": len(entries),
                          "decoder": ns.decoder}))
    return hyps


if __name__ == "__main__":
    main()
