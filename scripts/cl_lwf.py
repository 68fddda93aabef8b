"""LwF over the language sequence (reference: cl_baseline_lwf.py).

The teacher is the previous task's weights held in device memory (the
reference's per-batch disk round-trip is gone); KD combines chunked joint
KL and CTC KL per cl_baseline_lwf.py:242-264.
"""

from _common import build_all, setup

from indic_cl_asr_tpu.cl.lwf import LwFConfig
from indic_cl_asr_tpu.cl.methods import LwFMethod
from indic_cl_asr_tpu.train.driver import run_sequence


def main(argv=None):
    cfg, ns = setup(argv, notes_default="lwf")
    ctx = build_all(cfg, ns)
    method = LwFMethod(
        cfg=LwFConfig(
            knowledge_distillation=cfg.cl_config.knowledge_distillation,
            knowledge_distillation_ctx=(
                cfg.cl_config.knowledge_distillation_ctx
            ),
            faithful_raw_logits=getattr(
                cfg.cl_config, "faithful_raw_logits", False
            ),
            teacher_dtype=getattr(
                cfg.cl_config, "teacher_dtype", "float32"
            ),
        ),
        model=ctx["model"],
        model_cfg=ctx["model_cfg"],
        step_cfg=ctx["step_cfg"],
        tx=ctx["tx"],
    )
    results = run_sequence(
        cfg=ctx["driver_cfg"], model=ctx["model"],
        model_cfg=ctx["model_cfg"], step_cfg=ctx["step_cfg"],
        state=ctx["state"], method=method,
        base_step_builder=ctx["base_step_builder"],
        task_data=ctx["task_data"], tokenizer=ctx["tokenizer"],
        logger=ctx["logger"], trainable_mask=ctx["mask"],
        checkpointer=ctx["checkpointer"], languages=ctx["languages"],
        mesh=ctx["mesh"],
    )
    ctx["logger"].close()
    return results


if __name__ == "__main__":
    main()
