"""Batching pipeline: duration bucketing, static padding, host prefetch.

TPU-first replacement for the reference's torch DataLoader + dynamic
pad-to-max collate (NeMo data/audio_to_text.py:57-116 `_speech_collate_fn`).
Dynamic per-batch shapes would force an XLA recompile per new max length, so
instead:

  * utterances are grouped into duration buckets; each bucket has a fixed
    (audio_samples, token_len) padded shape, so the whole run compiles at
    most ``len(buckets)`` step variants;
  * batches are assembled on host into numpy arrays; audio decode runs in a
    thread pool and batches are prefetched one step ahead (overlapping host
    IO with device compute);
  * per-host sharding for multi-host DP replaces DistributedSampler: each
    host takes entries[process_index :: process_count].
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import queue
import threading
from typing import Callable, Iterator, Sequence

import numpy as np

from .manifest import ManifestEntry
from ..audio.io import load_audio


@dataclasses.dataclass
class Batch:
    """Host-side batch. Mirrors the reference 4-tuple
    (signal, sig_len, tokens, tok_len) plus language routing ids."""

    audio: np.ndarray       # [B, S] float32
    audio_len: np.ndarray   # [B] int32, valid samples
    tokens: np.ndarray      # [B, U] int32, padded with pad_id
    token_len: np.ndarray   # [B] int32
    lang_ids: np.ndarray    # [B] int32 index into the language list
    texts: list[str]        # reference transcripts (for WER on host)
    langs: list[str]
    n_real: int = -1        # rows < n_real are real; the rest are repeats
                            # padding the final partial batch of a bucket

    def __post_init__(self):
        if self.n_real < 0:
            self.n_real = len(self.texts)


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static shapes: audio second boundaries and token caps per bucket."""

    boundaries_sec: tuple[float, ...] = (4.0, 8.0, 12.0, 16.7)
    max_tokens: tuple[int, ...] = (64, 128, 192, 256)
    sample_rate: int = 16000

    def bucket_of(self, duration: float) -> int:
        for i, b in enumerate(self.boundaries_sec):
            if duration <= b:
                return i
        return len(self.boundaries_sec) - 1

    def shapes(self, bucket: int) -> tuple[int, int]:
        return (
            int(self.boundaries_sec[bucket] * self.sample_rate),
            self.max_tokens[bucket],
        )


def shard_for_host(
    entries: Sequence[ManifestEntry], process_index: int, process_count: int
) -> list[ManifestEntry]:
    return list(entries[process_index::process_count])


def _assemble(
    entries: list[ManifestEntry],
    n_real: int,
    bucket: int,
    spec: BucketSpec,
    tokenizer,
    lang_index: dict[str, int],
    pad_id: int,
    loader: Callable[[str], np.ndarray],
    io_pool: cf.Executor | None,
) -> Batch:
    S, U = spec.shapes(bucket)
    B = len(entries)
    audio = np.zeros((B, S), np.float32)
    audio_len = np.zeros((B,), np.int32)
    tokens = np.full((B, U), pad_id, np.int32)
    token_len = np.zeros((B,), np.int32)
    lang_ids = np.zeros((B,), np.int32)

    # native C++ batch decode fast path (one call, threaded, zero-copy into
    # the batch buffer) when every file is a WAV and the lib is built
    wavs = None
    if loader is load_audio and all(
        e.audio_filepath.lower().endswith(".wav") for e in entries
    ):
        from ..utils.native import load_wav_batch_native

        native = load_wav_batch_native(
            [e.audio_filepath for e in entries], S
        )
        if native is not None and (native[1] >= 0).all():
            audio, native_lens = native
            audio_len[:] = native_lens.astype(np.int32)
        else:
            native = None
        if native is None:
            wavs = [loader(e.audio_filepath) for e in entries]
    elif io_pool is not None:
        wavs = list(io_pool.map(loader, [e.audio_filepath for e in entries]))
    else:
        wavs = [loader(e.audio_filepath) for e in entries]

    for i, (e, wav) in enumerate(
        zip(entries, wavs if wavs is not None else [None] * B)
    ):
        if wav is not None:
            n = min(len(wav), S)
            audio[i, :n] = wav[:n]
            audio_len[i] = n
        ids = tokenizer.text_to_ids(e.text, e.lang) if e.text else []
        ids = ids[:U]
        tokens[i, : len(ids)] = ids
        token_len[i] = len(ids)
        lang_ids[i] = lang_index[e.lang]
    return Batch(
        audio=audio,
        audio_len=audio_len,
        tokens=tokens,
        token_len=token_len,
        lang_ids=lang_ids,
        texts=[e.text for e in entries],
        langs=[e.lang for e in entries],
        n_real=n_real,
    )


class BatchPipeline:
    """Iterates fixed-shape batches over manifest entries.

    Within an epoch: entries are (optionally shuffled then) grouped by
    bucket; each bucket yields full ``batch_size`` batches; the final
    partial batch of each bucket is padded by repeating its last entry so
    every batch has the same static shape. ``n_real`` marks how many
    leading rows are real: the train step's masked reductions
    (train/step.py n_valid, ops/rnnt_loss.py row masking) exclude the
    repeated rows from the loss exactly, matching the reference's
    simply-smaller final batch (epoch semantics note in docs/PARITY.md).
    """

    def __init__(
        self,
        entries: Sequence[ManifestEntry],
        tokenizer,
        languages: Sequence[str],
        batch_size: int,
        spec: BucketSpec | None = None,
        pad_id: int = 0,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        loader: Callable[[str], np.ndarray] | None = None,
        num_io_threads: int = 8,
        prefetch: int = 2,
    ):
        self.entries = list(entries)
        self.tokenizer = tokenizer
        self.lang_index = {l: i for i, l in enumerate(languages)}
        self.batch_size = batch_size
        self.spec = spec or BucketSpec()
        self.pad_id = pad_id
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.loader = loader or load_audio
        self.num_io_threads = num_io_threads
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        buckets: dict[int, int] = {}
        for e in self.entries:
            b = self.spec.bucket_of(e.duration)
            buckets[b] = buckets.get(b, 0) + 1
        if self.drop_last:
            return sum(n // self.batch_size for n in buckets.values())
        return sum(
            (n + self.batch_size - 1) // self.batch_size
            for n in buckets.values()
        )

    def _plan(self) -> list[tuple[int, list[ManifestEntry]]]:
        order = list(self.entries)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        by_bucket: dict[int, list[ManifestEntry]] = {}
        for e in order:
            by_bucket.setdefault(self.spec.bucket_of(e.duration), []).append(e)
        plan = []
        for b, items in by_bucket.items():
            for i in range(0, len(items), self.batch_size):
                chunk = items[i : i + self.batch_size]
                n_real = len(chunk)
                if n_real < self.batch_size:
                    if self.drop_last:
                        continue
                    chunk = chunk + [chunk[-1]] * (
                        self.batch_size - n_real
                    )
                plan.append((b, n_real, chunk))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch + 10_000)
            rng.shuffle(plan)
        return plan

    def __iter__(self) -> Iterator[Batch]:
        plan = self._plan()
        self._epoch += 1
        io_pool = cf.ThreadPoolExecutor(self.num_io_threads)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            try:
                for b, n_real, chunk in plan:
                    q.put(
                        _assemble(
                            chunk, n_real, b, self.spec, self.tokenizer,
                            self.lang_index, self.pad_id, self.loader, io_pool,
                        )
                    )
            except Exception as e:  # surface errors on the consumer side
                q.put(e)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            io_pool.shutdown(wait=False)
