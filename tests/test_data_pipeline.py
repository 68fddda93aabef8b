import numpy as np

from indic_cl_asr_tpu.data.manifest import (
    ManifestEntry,
    entries_from_annotation,
    read_manifest,
    write_manifest,
)
from indic_cl_asr_tpu.data.pipeline import BatchPipeline, BucketSpec, shard_for_host

from .synth import make_tokenizer, make_wav_dataset


def test_manifest_roundtrip(tmp_path):
    entries = [
        ManifestEntry("a.wav", 1.5, "namaste", "hindi"),
        ManifestEntry("b.wav", 2.0, "", "tamil"),
    ]
    p = str(tmp_path / "m.jsonl")
    write_manifest(p, entries)
    assert read_manifest(p) == entries


def test_entries_from_annotation_with_limit():
    ann = {
        "train": {
            "hindi": {
                "audio": [f"clean/{i}.m4a" for i in range(5)],
                "transcript": {f"{i}.m4a": f"text {i}" for i in range(5)},
                "duration": {f"{i}.m4a": 1.0 for i in range(5)},
            }
        }
    }
    es = entries_from_annotation(ann, "train", "hindi", "/data", limit=3)
    assert len(es) == 3
    assert es[0].audio_filepath == "/data/clean/0.m4a"
    assert es[2].text == "text 2"


def test_pipeline_static_shapes_and_content(tmp_path):
    langs = ["hindi", "bengali"]
    data = make_wav_dataset(str(tmp_path), langs, n_per_lang=5)
    tok = make_tokenizer(langs)
    entries = data["hindi"] + data["bengali"]
    spec = BucketSpec(boundaries_sec=(1.0, 2.0), max_tokens=(64, 96))
    pipe = BatchPipeline(
        entries, tok, langs, batch_size=4, spec=spec, shuffle=True, seed=7
    )
    batches = list(pipe)
    assert len(batches) == len(pipe)
    seen_shapes = set()
    total_rows = 0
    for b in batches:
        assert b.audio.shape[0] == 4
        assert b.audio.shape[1] in (16000, 32000)
        assert b.tokens.shape[1] in (64, 96)
        assert (b.audio_len <= b.audio.shape[1]).all()
        assert (b.token_len > 0).all()
        # audio beyond audio_len is zero
        for i in range(4):
            assert np.all(b.audio[i, b.audio_len[i] :] == 0)
            # tokens decode back to the text
            ids = b.tokens[i, : b.token_len[i]].tolist()
            assert tok.ids_to_text(ids, b.langs[i]) == b.texts[i]
        seen_shapes.add((b.audio.shape[1], b.tokens.shape[1]))
        total_rows += 4
    # bucketing produced a small static shape set
    assert len(seen_shapes) <= 2
    assert total_rows >= len(entries)


def test_pipeline_epoch_reshuffles(tmp_path):
    langs = ["hindi"]
    data = make_wav_dataset(str(tmp_path), langs, n_per_lang=8)
    tok = make_tokenizer(langs)
    pipe = BatchPipeline(
        data["hindi"], tok, langs, batch_size=2,
        spec=BucketSpec(boundaries_sec=(2.0,), max_tokens=(64,)),
        shuffle=True, seed=3,
    )
    first = [b.texts for b in pipe]
    second = [b.texts for b in pipe]
    assert sorted(sum(first, [])) == sorted(sum(second, []))
    assert first != second  # epoch-dependent shuffle


def test_drop_last_and_host_sharding(tmp_path):
    langs = ["hindi"]
    data = make_wav_dataset(str(tmp_path), langs, n_per_lang=7)
    tok = make_tokenizer(langs)
    spec = BucketSpec(boundaries_sec=(2.0,), max_tokens=(64,))
    pipe = BatchPipeline(
        data["hindi"], tok, langs, batch_size=2, spec=spec, drop_last=True
    )
    assert len(list(pipe)) == 3  # 7 -> 3 full batches

    shard0 = shard_for_host(data["hindi"], 0, 2)
    shard1 = shard_for_host(data["hindi"], 1, 2)
    assert len(shard0) + len(shard1) == 7
    assert not set(e.audio_filepath for e in shard0) & set(
        e.audio_filepath for e in shard1
    )
