import jax
import numpy as np
import pytest

from indic_cl_asr_tpu.data.pipeline import BucketSpec
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.train.eval import Transcriber, run_eval

from .synth import make_tokenizer, make_wav_dataset


class ListLogger:
    def __init__(self):
        self.records = []

    def log(self, d):
        self.records.append(d)


def make_transcriber(tmp_path, langs=("hindi", "tamil"), n=5):
    langs = list(langs)
    data = make_wav_dataset(str(tmp_path), langs, n_per_lang=n)
    tok = make_tokenizer(langs)
    # model must use the tokenizer's aggregate vocab
    vocab_total = tok.vocab_size
    n_langs = len(langs)
    # equal per-lang slices required: pad synthetic tokenizers to equal size?
    # our char tokenizers differ; force equal via vocab_size_total rounding
    per = max(t.vocab_size for t in tok.tokenizers_dict.values())
    cfg = tiny_config(vocab_size_total=per * n_langs, n_langs=n_langs)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    from indic_cl_asr_tpu.audio.features import FrontendConfig

    tr = Transcriber(
        model=model, model_cfg=cfg, tokenizer=tok, languages=langs,
        frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
        batch_size=4,
        bucket_spec=BucketSpec(boundaries_sec=(1.0, 2.0), max_tokens=(48, 64)),
        max_symbols=3, max_out=48,
    )
    return tr, variables, data, langs


@pytest.mark.slow
def test_transcribe_shapes_and_determinism(tmp_path):
    tr, variables, data, langs = make_transcriber(tmp_path)
    entries = data["hindi"]
    batched = ("ctc", "rnnt", "rnnt_beam")
    for decoder in batched + ("ctc_beam", "rnnt_beam_host"):
        # host beam decoders are per-sample loops: keep their slice small
        subset = entries if decoder in batched else entries[:2]
        hyps = tr.transcribe(variables, subset, decoder)
        assert len(hyps) == len(subset)
        assert all(isinstance(h, str) for h in hyps)
        if decoder in batched:
            assert hyps == tr.transcribe(variables, subset, decoder)


def test_compute_wer_random_model_is_high(tmp_path):
    tr, variables, data, langs = make_transcriber(tmp_path)
    w = tr.compute_wer(variables, data["hindi"], "ctc")
    assert 0.0 <= w  # random model: arbitrary but finite
    assert np.isfinite(w)


def test_run_eval_metric_names(tmp_path):
    tr, variables, data, langs = make_transcriber(tmp_path)
    logger = ListLogger()
    perf = run_eval(
        logger, "val", tr, variables,
        clean_entries=data["hindi"], noisy_entries=data["hindi"],
        epoch=0, curr_lang_idx=0, lang="hindi",
    )
    assert set(perf) == {
        "rnnt_wer", "rnnt_noisy_wer", "rnnt_avg_wer",
        "ctc_wer", "ctc_noisy_wer", "ctc_avg_wer",
    }
    rec = logger.records[0]
    assert "val/perf_hindi_rnnt_wer" in rec
    assert "val/perf_hindi_ctc_noisy_wer" in rec
    assert rec["epoch"] == 0 and rec["lang"] == 0
    assert rec["val/perf_hindi_rnnt_avg_wer"] == perf["rnnt_avg_wer"]
