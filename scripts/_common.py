"""Shared wiring for the experiment drivers (scripts/cl_*.py, finetune.py).

Replaces the duplicated setup blocks of the reference drivers
(cl_baseline*.py:70-140): config + CLI overrides, data, tokenizer, model,
optimizer, logger. Data comes from (in priority order):
  1. --dataset.manifest_dir: per-language JSONL manifests
     ({lang}_{train|val|test|noisy_val|noisy_test}.jsonl)
  2. --dataset.annotation_path: the reference's pickled annotation dict
     (dataset_gen.ipynb layout) + --dataset.path root
  3. --synthetic true: generated tiny wav dataset (smoke runs, no data
     download needed)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Honor JAX_PLATFORMS explicitly: some PJRT plugin installs (e.g. the
# tunneled-TPU `axon` plugin) register themselves in a way that silently
# overrides the env var, so `JAX_PLATFORMS=cpu scripts/cl_*.py` would land
# on the TPU anyway. jax.config.update before first backend use always
# wins. No-op when the env var is absent or already honored.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from indic_cl_asr_tpu.audio.features import FrontendConfig
from indic_cl_asr_tpu.audio.spec_augment import SpecAugmentConfig
from indic_cl_asr_tpu.data.manifest import (
    entries_from_annotation,
    load_annotation,
    read_manifest,
)
from indic_cl_asr_tpu.data.pipeline import BucketSpec
from indic_cl_asr_tpu.data.tokenizer import (
    CharTokenizer,
    MultilingualTokenizer,
)
from indic_cl_asr_tpu.models.conformer import ConformerConfig
from indic_cl_asr_tpu.models.hybrid import (
    HybridModelConfig,
    HybridRNNTCTC,
    init_model,
)
from indic_cl_asr_tpu.train.driver import (
    LANGUAGES,
    DriverConfig,
    TaskData,
)
from indic_cl_asr_tpu.train.logger import Logger
from indic_cl_asr_tpu.train.state import create_train_state, make_optimizer
from indic_cl_asr_tpu.train.step import StepConfig, make_train_step
from indic_cl_asr_tpu.utils.checkpoint import SequenceCheckpointer
from indic_cl_asr_tpu.utils.config import load_config, override_config_with_args
from indic_cl_asr_tpu.utils.pytree import conformer_freeze_mask

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "config.yaml")


def setup(argv=None, config_path: str | None = None, notes_default: str = "",
          extra_args: dict | None = None):
    cfg = load_config(config_path or DEFAULT_CONFIG)
    cfg, ns = override_config_with_args(
        cfg, argv=argv,
        extra_args={
            "notes": {"type": str, "default": notes_default},
            **(extra_args or {}),
        },
    )
    # persistent compilation cache only when explicitly requested — cached
    # artifacts have faulted on reload through the TPU tunnel
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
    # pod-slice bring-up (scripts/launch_tpu.sh contract): on Cloud TPU the
    # coordinator is discovered from TPU metadata, so initialize() needs no
    # endpoint args — the reference's torchrun rendezvous (sbatch.sh:50-59)
    # has no TPU analogue beyond this one call
    if os.environ.get("INDIC_ASR_MULTIHOST") == "1":
        from indic_cl_asr_tpu.parallel.distributed import setup_distributed

        pidx, pcount = setup_distributed(
            coordinator_address=os.environ.get("INDIC_ASR_COORDINATOR"),
            num_processes=(
                int(os.environ["INDIC_ASR_NUM_PROCESSES"])
                if os.environ.get("INDIC_ASR_NUM_PROCESSES") else None
            ),
            process_id=(
                int(os.environ["INDIC_ASR_PROCESS_ID"])
                if os.environ.get("INDIC_ASR_PROCESS_ID") else None
            ),
            auto_init=True,
        )
        print(f"# multihost: process {pidx}/{pcount}")
    return cfg, ns


def build_languages(cfg) -> list[str]:
    return list(cfg.get("languages", LANGUAGES[: cfg.n_langs]))


def build_data(cfg, languages) -> dict[str, TaskData]:
    ds = cfg.dataset
    out: dict[str, TaskData] = {}
    if ds.get("manifest_dir"):
        for lang in languages:
            def rd(split):
                return read_manifest(
                    os.path.join(ds.manifest_dir, f"{lang}_{split}.jsonl")
                )

            out[lang] = TaskData(
                train=rd("train")[: ds.get("train_size") or None],
                val_clean=rd("val"), val_noisy=rd("noisy_val"),
                test_clean=rd("test"), test_noisy=rd("noisy_test"),
            )
        return out
    if ds.get("annotation_path"):
        ann = load_annotation(ds.annotation_path)
        root = ds.get("path", "")
        for lang in languages:
            out[lang] = TaskData(
                train=entries_from_annotation(
                    ann, "train", lang, root, limit=ds.get("train_size")
                ),
                val_clean=entries_from_annotation(ann, "val", lang, root),
                val_noisy=entries_from_annotation(
                    ann, "noisy_val", lang, root
                ),
                test_clean=entries_from_annotation(ann, "test", lang, root),
                test_noisy=entries_from_annotation(
                    ann, "noisy_test", lang, root
                ),
            )
        return out
    if cfg.get("synthetic"):
        return build_synthetic_data(cfg, languages)
    raise ValueError(
        "configure dataset.manifest_dir, dataset.annotation_path, or "
        "synthetic: true"
    )


def build_synthetic_data(cfg, languages) -> dict[str, TaskData]:
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tests")
    )
    from synth import make_wav_dataset

    from indic_cl_asr_tpu.parallel.distributed import (
        barrier,
        is_main_process,
    )

    root = os.path.join(cfg.output_dir, "synthetic_data")
    n = int(cfg.get("synthetic_utts", 8))
    # multihost with a shared output dir: one writer, everyone else reads
    # the manifests after the barrier (generation is deterministic, but
    # concurrent writers could expose partially-written wavs)
    if is_main_process():
        data = make_wav_dataset(root, languages, n_per_lang=n * 3)
    barrier("synthetic-data")
    if not is_main_process():
        data = {
            lang: read_manifest(os.path.join(root, f"{lang}.jsonl"))
            for lang in languages
        }
    out = {}
    for lang in languages:
        es = data[lang]
        out[lang] = TaskData(
            train=es[:n], val_clean=es[n : n + n // 2],
            val_noisy=es[n + n // 2 : 2 * n], test_clean=es[2 * n :][: n // 2],
            test_noisy=es[2 * n :][n // 2 :],
        )
    return out


def build_tokenizer(cfg, languages, task_data) -> MultilingualTokenizer:
    tok_dir = cfg.get("tokenizer_dir")
    if tok_dir and os.path.exists(os.path.join(tok_dir, "index.json")):
        return MultilingualTokenizer.load(tok_dir)
    # train char tokenizers from the training transcripts, padded to a
    # common per-language vocab size (the model requires equal slices)
    toks = {}
    for lang in languages:
        corpus = [e.text for e in task_data[lang].train if e.text]
        toks[lang] = CharTokenizer.train(corpus or ["placeholder"])
    per = max(t.vocab_size for t in toks.values())
    for lang, t in toks.items():
        t.vocab += [f"<pad{i}>" for i in range(per - t.vocab_size)]
        t._piece_to_id = {p: i for i, p in enumerate(t.vocab)}
    agg = MultilingualTokenizer(toks)
    if tok_dir:
        agg.save(tok_dir)
    return agg


def build_model_cfg(cfg, tokenizer, languages) -> HybridModelConfig:
    m = cfg.model
    dtype = jnp.bfloat16 if cfg.get("mixed_precision", True) else jnp.float32
    enc = ConformerConfig(
        feat_in=m.get("n_mels", 80),
        n_layers=m.get("n_layers", 17),
        d_model=m.get("d_model", 512),
        n_heads=m.get("n_heads", 8),
        ff_expansion_factor=m.get("ff_expansion_factor", 4),
        conv_kernel_size=m.get("conv_kernel_size", 31),
        subsampling_factor=m.get("subsampling_factor", 4),
        frozen_till=m.get("freeze_encoder_till", 12),
        # lax.scan over stacked layer params (O(1) program size in depth)
        # — the canonical TPU path; --model.scan_layers false falls back
        # to the unrolled per-layer param tree
        scan_layers=m.get("scan_layers", True),
        # --model.att_context_left/right: banded attention; left>=0 and
        # right==0 with causal_conv enables cache-aware streaming
        att_context_size=(
            m.get("att_context_left", -1), m.get("att_context_right", -1)
        ),
        causal_conv=m.get("causal_conv", False),
        # Longformer local+global variant (reference
        # multi_head_attention.py:253)
        global_tokens=m.get("global_tokens", 0),
        global_tokens_spacing=m.get("global_tokens_spacing", 1),
        global_attn_separate=m.get("global_attn_separate", False),
        # --model.attn_impl {xla,flash}: fused Pallas rel-pos attention
        # (ops/flash_mhsa.py; hardware-A/B'd faster at flagship shapes);
        # ignored automatically when global_tokens > 0 or T is long
        attn_impl=m.get("attn_impl", "xla"),
        dtype=dtype,
    )
    return HybridModelConfig(
        encoder=enc,
        vocab_size_total=tokenizer.vocab_size,
        n_langs=len(languages),
        pred_hidden=m.get("pred_hidden", 640),
        joint_hidden=m.get("joint_hidden", 640),
        ctc_loss_weight=m.get("ctc_loss_weight", 0.5),
        dtype=dtype,
    )


def build_all(cfg, ns):
    languages = build_languages(cfg)
    task_data = build_data(cfg, languages)
    tokenizer = build_tokenizer(cfg, languages, task_data)
    model_cfg = build_model_cfg(cfg, tokenizer, languages)
    model, variables = init_model(model_cfg, jax.random.PRNGKey(cfg.seed))

    if cfg.get("init_checkpoint"):
        from indic_cl_asr_tpu.utils.checkpoint import load_pytree

        variables = load_pytree(cfg.init_checkpoint, like=variables)

    mask = conformer_freeze_mask(
        variables["params"], cfg.model.freeze_encoder_till
    )
    tx = make_optimizer(
        lr=cfg.lr, trainable_mask=mask,
        stacked_freeze_till=(
            cfg.model.freeze_encoder_till
            if model_cfg.encoder.scan_layers else 0
        ),
    )
    state = create_train_state(variables, tx)

    b = cfg.get("buckets", {})
    bucket_spec = BucketSpec(
        boundaries_sec=tuple(b.get("boundaries_sec", (4.0, 8.0, 12.0, 16.7))),
        max_tokens=tuple(b.get("max_tokens", (64, 128, 192, 256))),
    )
    step_cfg = StepConfig(
        frontend=FrontendConfig(n_mels=model_cfg.encoder.feat_in),
        spec_augment=SpecAugmentConfig(),
        ctc_loss_weight=model_cfg.ctc_loss_weight,
        rnnt_chunk_size=cfg.get("rnnt_chunk_size", 32),
        use_spec_augment=cfg.get("use_spec_augment", True),
        # each CL task trains exactly one language (per-task manifests,
        # reference cl_baseline.py) -> shared-head joint fast path;
        # train/driver.py host-checks every batch is single-language
        uniform_lang_head=cfg.get("uniform_lang_head", True),
        # chunk-remat policy for the fused joint (ops/rnnt_loss_fused.py):
        # "full" (memory-minimal, any T) | "save_logits" | "none"
        rnnt_remat=cfg.get("rnnt_remat", "full"),
    )

    def base_step_builder(penalty_fn):
        return make_train_step(model, model_cfg, step_cfg, tx, penalty_fn)

    logger = Logger(
        cfg.output_dir,
        use_wandb=cfg.get("use_wandb", True),
        wandb_kwargs={"notes": ns.notes, "config": cfg.to_dict()},
    )
    logger.log({"config": cfg.to_dict(), "notes": ns.notes})

    # Self-contained run dir (the .nemo-bundle analogue: the reference
    # packs config + tokenizer + weights into one tar,
    # save_restore_connector.py:220): persist the resolved config and the
    # tokenizer next to the checkpoints so scripts/transcribe.py can
    # restore ANY run later without the original flags or dataset.
    import json as _json

    from indic_cl_asr_tpu.parallel.distributed import is_main_process

    if is_main_process():  # shared run dir in multihost: one writer
        with open(os.path.join(logger.dir, "config.json"), "w") as f:
            _json.dump(cfg.to_dict(), f, indent=2, default=str)
        tokenizer.save(os.path.join(logger.dir, "tokenizer"))

    driver_cfg = DriverConfig(
        batch_size=cfg.batch_size,
        epochs=cfg.epochs,
        seed=cfg.seed,
        n_langs=cfg.n_langs,
        save_weights=cfg.get("save_weights", True),
        output_dir=cfg.output_dir,
        evaluate_every_n_epochs=cfg.cl_config.get(
            "evaluate_every_n_epochs", 0
        ),
        bucket_spec=bucket_spec,
    )
    checkpointer = (
        SequenceCheckpointer(os.path.join(logger.dir, "sequence"))
        if cfg.get("resume_dir") is None
        else SequenceCheckpointer(cfg.resume_dir)
    )

    # --mesh.data N --mesh.model M: DP x TP SPMD training (data: 0 = all
    # visible devices / model). mesh=None keeps the single-device path.
    mesh = None
    mc = cfg.get("mesh", {})
    n_model = int(mc.get("model", 1))
    n_data = int(mc.get("data", 1))
    if n_model > 1 or n_data > 1 or n_data == 0:
        from indic_cl_asr_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(
            n_data=(None if n_data == 0 else n_data), n_model=n_model
        )
        print(
            f"# mesh: data={mesh.shape['data']} x "
            f"model={mesh.shape['model']} on {len(mesh.devices.flat)} "
            f"devices", file=sys.stderr,
        )

    return dict(
        cfg=cfg, languages=languages, task_data=task_data,
        tokenizer=tokenizer, model_cfg=model_cfg, model=model, state=state,
        mask=mask, tx=tx, step_cfg=step_cfg, mesh=mesh,
        base_step_builder=base_step_builder, logger=logger,
        driver_cfg=driver_cfg, checkpointer=checkpointer,
    )
