"""Tracing / profiling utilities.

Replaces the reference's line-level NVML memory tracer and
CUDA_LAUNCH_BLOCKING debugging (reference: utils.py:363-444 `gpu_profile`
settrace hook, :324-330 `check_garbage`, :337 global sync launches) with the
TPU-native equivalents:

  * `trace(dir)` — context manager around jax.profiler traces (view in
    TensorBoard/Perfetto);
  * `StepTimer` — block_until_ready wall-clock timing with warmup discard
    and percentile stats (the utts/sec harness behind bench.py);
  * `device_memory_stats()` / `log_live_buffers()` — HBM usage census, the
    analogue of the reference's live-tensor dump;
  * `annotate(name)` — named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with device sync."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_to_sync=None):
        t0 = time.perf_counter()
        yield
        if result_to_sync is not None:
            jax.block_until_ready(result_to_sync)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def time_fn(self, fn, *args, iters: int = 10, **kw):
        """Time fn(*args) with sync; returns stats dict.

        Syncs EVERY iteration: on the tunneled TPU backend, blocking only
        on the last of N identical independent dispatches does not wait
        for the other N-1 (measured 0.08 ms for a 124M-param encoder
        forward), so a loop-then-final-block pattern under-reports
        arbitrarily. The per-iteration host round-trip biases small
        kernels upward; for sub-ms kernels chain the computation instead
        (see bench.py mode_components)."""
        out = fn(*args, **kw)
        jax.block_until_ready(out)  # compile + warmup
        for _ in range(self.warmup):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        per = (time.perf_counter() - t0) / iters
        self.times.append(per)
        return {"mean_s": per, "iters": iters}

    def stats(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p95_s": float(np.percentile(a, 95)),
            "steps": len(a),
        }


def device_memory_stats(device=None) -> dict:
    """HBM usage for a device (bytes). Empty dict if the backend doesn't
    expose memory_stats (e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}


def log_live_buffers(top_k: int = 20) -> list[tuple[tuple, str, int]]:
    """Largest live device buffers [(shape, dtype, nbytes)] — the analogue
    of the reference's gc-based live-tensor census (utils.py:430-444)."""
    bufs = jax.live_arrays()
    infos = [
        (tuple(b.shape), str(b.dtype), int(b.size * b.dtype.itemsize))
        for b in bufs
    ]
    infos.sort(key=lambda x: -x[2])
    return infos[:top_k]
