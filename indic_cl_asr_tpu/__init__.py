"""indic_cl_asr_tpu — TPU-native continual-learning ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
FrozenWolf-Cyber/Indic-CL-ASR research stack (NeMo/CUDA reference):

* log-mel + SpecAugment audio front-end as jittable functions / Pallas kernels
  (reference: NeMo parts/preprocessing/features.py, spectr_augment.py)
* Conformer encoder, RNNT prediction/joint nets with per-language
  ("multisoftmax") heads, CTC head (reference: NeMo modules/)
* RNNT + CTC lattice losses with memory-lean blockwise formulations
  (reference: NeMo parts/numba/rnnt_loss/**)
* greedy RNNT / CTC decoding under jit (reference: rnnt_greedy_decoding.py)
* continual-learning algorithms — naive, EWC, MAS, LwF — as functional
  transforms over parameter pytrees (reference: cl_baseline*.py)
* SPMD data/tensor parallelism over a jax.sharding.Mesh (replaces the
  reference's torch DDP/NCCL stack)
"""

__version__ = "0.1.0"
