"""Multi-host bring-up and synchronization.

TPU-native replacement for the reference's process-group machinery
(reference: cl_baseline.py:33-48 `setup_distributed` NCCL init with a
5-hour timeout, torchrun c10d rendezvous in sbatch.sh:50-59, and
`dist.barrier()` phase alignment at cl_baseline.py:120/142/178). On TPU
pods the runtime already knows the topology, so bring-up is one call and
barriers are collective no-ops compiled by XLA.
"""

from __future__ import annotations

import jax
import numpy as np


def setup_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    auto_init: bool = False,
) -> tuple[int, int]:
    """Initialize multi-host JAX if needed. Returns (process_index,
    process_count). Single-host (and the tests' virtual mesh) needs no
    initialization at all.

    On Cloud TPU pod slices the coordinator/process layout is discovered
    from TPU metadata, so an ARGLESS ``jax.distributed.initialize()`` is
    the whole bring-up (`auto_init`, used by scripts/launch_tpu.sh via
    INDIC_ASR_MULTIHOST=1); explicit endpoint args are only for
    non-TPU-metadata environments.

    Idempotent: a second call in an already-initialized process (e.g. a
    resume relaunch driving scripts/_common.setup again) returns the
    live (index, count) instead of re-initializing — JAX forbids
    initialize() after backend use."""
    if jax.distributed.is_initialized():
        return jax.process_index(), jax.process_count()
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif auto_init:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's dist.barrier analogue)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_main(tree):
    """Make host 0's pytree globally consistent (replaces rank-0 state
    scatter via the filesystem)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def all_hosts_agree(value) -> bool:
    """Sanity check used by failure detection: every host contributes its
    value; True iff all equal (single-host: trivially True)."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(value))
    return bool(np.all(gathered == gathered[0]))
