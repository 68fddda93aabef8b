"""Numerical parity against the VENDORED NeMo source itself.

Builds a 2-layer Conformer encoder from the reference's own torch modules
(/root/reference/NeMo/.../{subsampling,multi_head_attention,
conformer_modules}.py, imported in place via tests/vendored_nemo.py),
feeds its state dict through our checkpoint converter, and requires our
Flax encoder to match <= 1e-4 (VERDICT r2 item 4: the fresh torch oracle
in torch_conformer_oracle.py stays as a second opinion, but the expected
values here come from the reference's own code, so a shared misreading of
e.g. the rel-shift convention (multi_head_attention.py:184-195) cannot
pass both sides).
"""

import math
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from indic_cl_asr_tpu.models.conformer import subsampled_feat_dim
from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.models.pretrained import convert_nemo_state_dict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_pretrained_convert import make_fake_nemo_sd  # noqa: E402
from vendored_nemo import load_vendored_nemo  # noqa: E402


class VendoredEncoder(torch.nn.Module):
    """The reference ConformerEncoder assembly (conformer_encoder.py:
    507-640: pre_encode -> xscale+rel-pos -> layer stack) over the
    reference's OWN submodules."""

    def __init__(self, ns, enc_cfg):
        super().__init__()
        self.pre_encode = ns.subsampling.ConvSubsampling(
            "striding", enc_cfg.subsampling_factor, enc_cfg.feat_in,
            enc_cfg.d_model, enc_cfg.conv_channels,
        )
        self.pos_enc = ns.mha.RelPositionalEncoding(
            enc_cfg.d_model, dropout_rate=0.0,
            xscale=math.sqrt(enc_cfg.d_model),
        )
        self.pos_enc.extend_pe(512, torch.device("cpu"))
        d_ff = enc_cfg.d_model * enc_cfg.ff_expansion_factor
        self.layers = torch.nn.ModuleList(
            ns.conformer.ConformerLayer(
                d_model=enc_cfg.d_model, d_ff=d_ff,
                self_attention_model="rel_pos",
                n_heads=enc_cfg.n_heads,
                conv_kernel_size=enc_cfg.conv_kernel_size,
                dropout=0.0, dropout_att=0.0,
            )
            for _ in range(enc_cfg.n_layers)
        )

    def forward(self, feats, lengths):
        # feats: [B, F, T_mel] (NeMo layout)
        x, lengths = self.pre_encode(feats.transpose(1, 2), lengths)
        x, pos_emb = self.pos_enc(x)
        for layer in self.layers:
            x = layer(x, att_mask=None, pos_emb=pos_emb, pad_mask=None)
        return x, lengths


@pytest.fixture(scope="module")
def vendored():
    return load_vendored_nemo()


def test_vendored_full_encoder_parity(vendored, rng):
    cfg = tiny_config()
    torch.manual_seed(0)
    enc = VendoredEncoder(vendored, cfg.encoder).eval()
    # make every weight non-trivial, incl. rel-pos biases and BN stats
    with torch.no_grad():
        for p in enc.parameters():
            p.add_(0.05 * torch.randn_like(p))
        for layer in enc.layers:
            layer.self_attn.pos_bias_u.normal_(0, 0.2)
            layer.self_attn.pos_bias_v.normal_(0, 0.2)
            layer.conv.batch_norm.running_mean.normal_(0, 0.2)
            layer.conv.batch_norm.running_var.uniform_(0.5, 1.5)

    B, Tm = 2, 32
    feats = torch.randn(B, cfg.encoder.feat_in, Tm)
    lens = torch.tensor([Tm, Tm])
    with torch.no_grad():
        want, want_lens = enc(feats, lens)
    want = want.numpy()

    lang_keys = ["hi", "bn", "mr", "te"]
    sd = make_fake_nemo_sd(cfg, lang_keys, rng)
    vendored_sd = {
        "encoder." + k: v.detach().numpy()
        for k, v in enc.state_dict().items()
        if not k.startswith("pos_enc.")  # pe buffer is recomputed
        and "num_batches_tracked" not in k
    }
    sd = {k: v for k, v in sd.items() if k not in vendored_sd}
    sd.update(vendored_sd)
    variables = convert_nemo_state_dict(
        sd,
        n_layers=cfg.encoder.n_layers,
        sampling_num=cfg.encoder.sampling_num,
        subsampled_feat=subsampled_feat_dim(cfg.encoder),
        conv_channels=cfg.encoder.conv_channels,
        language_keys=lang_keys,
    )
    model, _ = init_model(cfg, jax.random.PRNGKey(0))
    got, enc_lens = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(feats.numpy()), jnp.full((B,), Tm, jnp.int32), False,
        method="encode",
    )
    assert np.asarray(enc_lens).tolist() == want_lens.tolist()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_vendored_rel_shift_matches_ours(vendored):
    """The rel-shift is THE classic convention trap
    (multi_head_attention.py:184-195): check the vendored
    RelPositionMultiHeadAttention in isolation against our XL attention
    module on identical weights."""
    import flax

    from indic_cl_asr_tpu.models.conformer import (
        ConformerConfig,
        RelPosSelfAttention as OurMHA,
    )

    d_model, H, T, B = 32, 4, 12, 2
    torch.manual_seed(1)
    theirs = vendored.mha.RelPositionMultiHeadAttention(
        n_head=H, n_feat=d_model, dropout_rate=0.0,
        pos_bias_u=None, pos_bias_v=None,
    ).eval()
    with torch.no_grad():
        theirs.pos_bias_u.normal_(0, 0.2)
        theirs.pos_bias_v.normal_(0, 0.2)

    x = torch.randn(B, T, d_model)
    # rel-pos embeddings positions T-1 .. -(T-1)
    pos = vendored.mha.RelPositionalEncoding(d_model, 0.0, xscale=None)
    pos.extend_pe(T, torch.device("cpu"))
    _, pos_emb = pos(x)
    with torch.no_grad():
        want = theirs(
            query=x, key=x, value=x, mask=None, pos_emb=pos_emb
        ).numpy()

    cfg = ConformerConfig(
        feat_in=8, d_model=d_model, n_heads=H, att_context_size=(-1, -1),
    )
    ours = OurMHA(cfg)

    def lin(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {
        "linear_q": lin(theirs.linear_q),
        "linear_k": lin(theirs.linear_k),
        "linear_v": lin(theirs.linear_v),
        "linear_out": lin(theirs.linear_out),
        "linear_pos": {
            "kernel": jnp.asarray(theirs.linear_pos.weight.detach().numpy().T)
        },
        "pos_bias_u": jnp.asarray(theirs.pos_bias_u.detach().numpy()),
        "pos_bias_v": jnp.asarray(theirs.pos_bias_v.detach().numpy()),
    }
    variables = {"params": flax.core.freeze(params).unfreeze()}
    got = ours.apply(
        variables, jnp.asarray(x.numpy()),
        jnp.asarray(pos_emb[0].numpy()), None, True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
