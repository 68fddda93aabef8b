"""Hybrid RNNT+CTC model assembly.

The reference's `EncDecHybridRNNTCTCBPEModel` (hybrid_rnnt_ctc_bpe_models.py:
40-170, hybrid_rnnt_ctc_models.py:204+, rnnt_models.py:50+) collapses here to
one Flax module with four submodules (encoder, prediction, joint, ctc head)
and pure functional entry points; the mel front-end stays a standalone
function (audio/features.py) invoked inside the jitted step.

The flagship preset mirrors the reference checkpoint's architecture
(ai4bharat indicconformer hybrid large: 17-layer d512 Conformer, 640-d
1-layer LSTM prediction net, 640-d joint, aggregate vocab 12 x 256 with
per-language 257-wide heads — conformer_hybrid_transducer_ctc_bpe.yaml and
conv_asr.py:471-484's 3073->257 mask comment).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conformer import ConformerConfig, ConformerEncoder, subsampled_length
from .ctc import CTCConfig, CTCDecoder
from .rnnt import JointConfig, PredictionConfig, PredictionNetwork, RNNTJoint


@dataclasses.dataclass(frozen=True)
class HybridModelConfig:
    encoder: ConformerConfig = ConformerConfig()
    vocab_size_total: int = 3072
    n_langs: int = 12
    pred_hidden: int = 640
    pred_rnn_layers: int = 1
    pred_dropout: float = 0.2
    joint_hidden: int = 640
    joint_activation: str = "relu"
    joint_dropout: float = 0.2
    ctc_loss_weight: float = 0.5   # hybrid_rnnt_ctc_models.py:902 default
    dtype: Any = jnp.float32

    @property
    def vocab_per_lang(self) -> int:
        return self.vocab_size_total // self.n_langs

    @property
    def blank_local(self) -> int:
        return self.vocab_per_lang

    def prediction_config(self) -> PredictionConfig:
        return PredictionConfig(
            vocab_size_total=self.vocab_size_total,
            pred_hidden=self.pred_hidden,
            pred_rnn_layers=self.pred_rnn_layers,
            dropout=self.pred_dropout,
            dtype=self.dtype,
        )

    def joint_config(self) -> JointConfig:
        return JointConfig(
            vocab_size_total=self.vocab_size_total,
            n_langs=self.n_langs,
            encoder_hidden=self.encoder.d_model,
            pred_hidden=self.pred_hidden,
            joint_hidden=self.joint_hidden,
            activation=self.joint_activation,
            dropout=self.joint_dropout,
            dtype=self.dtype,
        )

    def ctc_config(self) -> CTCConfig:
        return CTCConfig(
            feat_in=self.encoder.d_model,
            vocab_size_total=self.vocab_size_total,
            n_langs=self.n_langs,
            dtype=self.dtype,
        )


def tiny_config(**overrides) -> "HybridModelConfig":
    """CPU-testable config in the spirit of the reference's tiny fixtures
    (SURVEY.md §4: test_asr_hybrid_rnnt_ctc_model_bpe.py:37-100)."""
    enc = ConformerConfig(
        feat_in=32, n_layers=2, d_model=64, n_heads=4,
        ff_expansion_factor=2, conv_kernel_size=7, subsampling_factor=4,
        dropout=0.0, dropout_att=0.0, dropout_pre_encoder=0.0,
    )
    base = dict(
        encoder=enc, vocab_size_total=64, n_langs=4, pred_hidden=32,
        joint_hidden=32, pred_dropout=0.0, joint_dropout=0.0,
    )
    base.update(overrides)
    return HybridModelConfig(**base)


def flagship_config(
    dtype=jnp.bfloat16, n_layers: int = 17, attn_impl: str = "xla"
) -> "HybridModelConfig":
    return HybridModelConfig(
        encoder=ConformerConfig(
            feat_in=80, n_layers=n_layers, d_model=512, n_heads=8,
            ff_expansion_factor=4, conv_kernel_size=31,
            subsampling_factor=4, dtype=dtype,
            # lax.scan over stacked layer params: O(1) program size in
            # depth — the 17x-unrolled program exceeds the tunneled
            # remote-compile service's request-size limit (HTTP 413)
            scan_layers=True,
            attn_impl=attn_impl,
        ),
        vocab_size_total=3072,
        n_langs=12,
        pred_hidden=640,
        joint_hidden=640,
        dtype=dtype,
    )


class HybridRNNTCTC(nn.Module):
    cfg: HybridModelConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = ConformerEncoder(cfg.encoder, name="encoder")
        self.prediction = PredictionNetwork(
            cfg.prediction_config(), name="prediction"
        )
        self.joint = RNNTJoint(cfg.joint_config(), name="joint")
        self.ctc_decoder = CTCDecoder(cfg.ctc_config(), name="ctc_decoder")

    # --- granular entry points (used via apply(..., method=...)) ---

    def encode(self, feats, feat_lens, train: bool = False):
        return self.encoder(feats, feat_lens, train=train)

    def predict(self, tokens, add_sos: bool = True, state=None,
                train: bool = False):
        return self.prediction(tokens, add_sos=add_sos, state=state,
                               train=train)

    def joint_project(self, f, g):
        return self.joint.project(f, g)

    def joint_project_enc(self, f):
        return self.joint.project_enc(f)

    def joint_project_pred(self, g):
        return self.joint.project_pred(g)

    def joint_step(self, f_t, g_t, lang_ids):
        return self.joint.step_logits(f_t, g_t, lang_ids)

    def pred_step(self, last_label, state):
        """One prediction-network step for decoding: [B] labels + state ->
        (projected g [B, H_joint], new state).

        Decode labels are LOCAL ids with blank == cfg.blank_local
        (= vocab_per_lang); the embedding table is over the AGGREGATE vocab
        with the zero-pinned pad row at vocab_size_total. Remap the decode
        blank to that pad row so SOS/blank steps feed a zero embedding,
        exactly like training's SOS (reference primes with a zero tensor via
        `decoder.predict(None)`, rnnt_greedy_decoding.py:216-217,780) —
        feeding raw blank_local would hit another language's real token
        embedding (ADVICE r1, high).
        """
        label = jnp.where(
            last_label == self.cfg.blank_local,
            jnp.int32(self.cfg.vocab_size_total),
            last_label,
        )
        g, new_state = self.prediction(
            label[:, None], add_sos=False, state=state
        )
        return self.joint.project_pred(g[:, 0, :]), new_state

    def joint_logits(self, f, g, lang_ids, train: bool = False):
        return self.joint(f, g, lang_ids, train=train)

    def joint_logits_after_projection(self, f_proj, g_proj, lang_ids,
                                      train: bool = False):
        return self.joint.logits_after_projection(
            f_proj, g_proj, lang_ids, train=train
        )

    def ctc_logprobs(self, encoded, lang_ids, return_logits: bool = False):
        return self.ctc_decoder(encoded, lang_ids, return_logits=return_logits)

    def __call__(self, feats, feat_lens, tokens, lang_ids,
                 train: bool = False):
        """Full forward for init/tracing: encoder + both heads."""
        f, enc_lens = self.encode(feats, feat_lens, train=train)
        g, _ = self.predict(tokens, train=train)
        joint = self.joint_logits(f, g, lang_ids, train=train)
        ctc = self.ctc_logprobs(f, lang_ids)
        return joint, ctc, enc_lens


def init_model(
    cfg: HybridModelConfig, rng: jax.Array, batch: int = 2, mel_frames: int = 32,
    max_tokens: int = 8,
):
    """Initialize variables with tiny dummy shapes (shapes don't constrain
    later calls). Returns (module, variables)."""
    model = HybridRNNTCTC(cfg)
    feats = jnp.zeros((batch, cfg.encoder.feat_in, mel_frames), jnp.float32)
    feat_lens = jnp.full((batch,), mel_frames, jnp.int32)
    tokens = jnp.zeros((batch, max_tokens), jnp.int32)
    lang_ids = jnp.zeros((batch,), jnp.int32)
    variables = model.init(rng, feats, feat_lens, tokens, lang_ids)
    return model, variables


def encoder_output_length(cfg: HybridModelConfig, mel_lens):
    return subsampled_length(mel_lens, cfg.encoder)
