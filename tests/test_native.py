"""Native C++ runtime tests: build, edit distance parity, WAV batch loader
parity with the Python decoder."""

import numpy as np
import pytest

from indic_cl_asr_tpu.audio.io import read_wav, write_wav
from indic_cl_asr_tpu.train.metrics import edit_distance, edit_distance_py
from indic_cl_asr_tpu.utils.native import (
    edit_distance_batch,
    edit_distance_native,
    get_lib,
    load_wav_batch_native,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native lib unavailable (no g++?)"
)


def test_edit_distance_matches_python(rng):
    cases = [
        ([], []),
        (list("kitten"), list("sitting")),
        (["a", "b", "c"], ["a", "x", "c", "d"]),
        ([str(x) for x in rng.integers(0, 5, 30)],
         [str(x) for x in rng.integers(0, 5, 25)]),
    ]
    for a, b in cases:
        assert edit_distance_native(a, b) == edit_distance_py(a, b)
    # the public entry picks the native path transparently
    assert edit_distance(list("abc"), list("adc")) == 1


def test_edit_distance_batch(rng):
    pairs = [
        ([str(x) for x in rng.integers(0, 8, rng.integers(0, 20))],
         [str(x) for x in rng.integers(0, 8, rng.integers(0, 20))])
        for _ in range(50)
    ]
    got = edit_distance_batch(pairs, n_threads=4)
    want = [edit_distance_py(a, b) for a, b in pairs]
    assert got == want


def test_wav_batch_loader_matches_python(tmp_path, rng):
    sr = 16000
    paths = []
    waves = []
    for i, n in enumerate([1600, 4000, 8000]):
        w = (0.4 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, w, sr)
        paths.append(p)
        waves.append(w)

    batch, lengths = load_wav_batch_native(paths, max_samples=8000,
                                           target_sr=sr)
    assert batch.shape == (3, 8000)
    for i, w in enumerate(waves):
        ref, _ = read_wav(paths[i])
        n = min(len(ref), 8000)
        assert lengths[i] == n
        np.testing.assert_allclose(batch[i, :n], ref[:n], atol=1e-6)
        assert np.all(batch[i, n:] == 0.0)


def test_wav_batch_loader_resamples_and_flags_bad_files(tmp_path, rng):
    sr_in = 8000
    w = (0.3 * rng.standard_normal(8000)).astype(np.float32)
    good = str(tmp_path / "good.wav")
    write_wav(good, w, sr_in)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")

    batch, lengths = load_wav_batch_native(
        [good, bad], max_samples=20000, target_sr=16000
    )
    assert lengths[1] == -1
    assert 15990 <= lengths[0] <= 16010  # ~2x upsampled
    assert np.abs(batch[0, : lengths[0]]).max() > 0
