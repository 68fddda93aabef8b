"""Naive sequential fine-tuning over the language sequence.

TPU-native equivalent of the reference driver (reference: cl_baseline.py:
70-249): same task loop, eval matrix, BWT logging and partial saves; the
distributed story is a jax.sharding mesh instead of DDP/NCCL.

Usage:
  python scripts/cl_baseline.py --notes "run 1" --epochs 2 \
      --dataset.annotation_path dataset.pkl --dataset.path /data/indicsuperb
"""

from _common import build_all, setup

from indic_cl_asr_tpu.cl.methods import NaiveMethod
from indic_cl_asr_tpu.train.driver import run_sequence


def main(argv=None):
    cfg, ns = setup(argv)
    ctx = build_all(cfg, ns)
    results = run_sequence(
        cfg=ctx["driver_cfg"],
        model=ctx["model"],
        model_cfg=ctx["model_cfg"],
        step_cfg=ctx["step_cfg"],
        state=ctx["state"],
        method=NaiveMethod(),
        base_step_builder=ctx["base_step_builder"],
        task_data=ctx["task_data"],
        tokenizer=ctx["tokenizer"],
        logger=ctx["logger"],
        trainable_mask=ctx["mask"],
        checkpointer=ctx["checkpointer"],
        languages=ctx["languages"],
        mesh=ctx["mesh"],
    )
    ctx["logger"].close()
    return results


if __name__ == "__main__":
    main()
