"""End-to-end learning test: overfit a tiny hybrid model on a handful of
synthetic utterances and check that transcription WER actually falls —
the reference's 'training smoke' equivalent (SURVEY.md §4: 1-utterance
overfit smoke tests), and the strongest single correctness signal for the
loss/decode/detok loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.audio.features import FrontendConfig
from indic_cl_asr_tpu.data.pipeline import BatchPipeline, BucketSpec
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.train.eval import Transcriber
from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
from indic_cl_asr_tpu.train.step import (
    StepConfig,
    batch_to_device_dict,
    make_train_step,
)
from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

from .synth import make_tokenizer, make_wav_dataset


@pytest.mark.slow
def test_overfit_reduces_wer(tmp_path):
    langs = ["hindi"]
    # CTC feasibility: enc frames (~25/s) must exceed char-token count,
    # so keep utterances long and texts short
    data = make_wav_dataset(
        str(tmp_path), langs, n_per_lang=4, seed=3,
        min_dur=1.2, max_dur=1.9, max_words=2,
    )
    tok = make_tokenizer(langs)
    per = max(t.vocab_size for t in tok.tokenizers_dict.values())
    cfg = tiny_config(
        vocab_size_total=per, n_langs=1, pred_hidden=64, joint_hidden=64,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    mask = conformer_freeze_mask(variables["params"], 0)
    tx = make_optimizer(lr=3e-3, trainable_mask=mask)
    state = create_train_state(variables, tx)
    step_cfg = StepConfig(
        frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
        use_spec_augment=False,
        rnnt_chunk_size=16,
    )
    step = jax.jit(make_train_step(model, cfg, step_cfg, tx))

    spec = BucketSpec(boundaries_sec=(2.0,), max_tokens=(64,))
    pipe = BatchPipeline(
        data["hindi"], tok, langs, batch_size=4, spec=spec, shuffle=False
    )
    batch = batch_to_device_dict(next(iter(pipe)))

    tr = Transcriber(
        model=model, model_cfg=cfg, tokenizer=tok, languages=langs,
        frontend=step_cfg.frontend, batch_size=4, bucket_spec=spec,
        max_symbols=3, max_out=64,
    )

    def current_wer(decoder):
        return tr.compute_wer(
            {"params": state.params, "batch_stats": state.batch_stats},
            data["hindi"], decoder,
        )

    wer0 = current_wer("ctc")
    losses = []
    for i in range(250):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(aux["train_loss"]))
    assert losses[-1] < losses[0] * 0.35, (losses[0], losses[-1])

    wer_ctc = current_wer("ctc")
    wer_rnnt = current_wer("rnnt")
    # a random model scores ~1.0; an overfit model must be far better on
    # its own training utterances
    assert wer0 > 0.7
    assert wer_ctc < 0.5, f"ctc WER {wer_ctc} (start {wer0})"
    assert wer_rnnt < 0.5, f"rnnt WER {wer_rnnt}"
