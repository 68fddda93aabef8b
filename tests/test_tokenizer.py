from indic_cl_asr_tpu.data.tokenizer import (
    BPETokenizer,
    CharTokenizer,
    MultilingualTokenizer,
    load_tokenizer,
)

CORPUS = [
    "namaste duniya",
    "namaste ghar",
    "pani aur ghar",
    "duniya mein pani",
]


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer.train(CORPUS)
    ids = tok.text_to_ids("namaste pani")
    assert all(isinstance(i, int) for i in ids)
    assert tok.ids_to_text(ids) == "namaste pani"


def test_bpe_tokenizer_roundtrip_and_compression():
    tok = BPETokenizer.train(CORPUS, vocab_size=50)
    text = "namaste duniya"
    ids = tok.text_to_ids(text)
    assert tok.ids_to_text(ids) == text
    # BPE must compress repeated words below char length
    assert len(ids) < len(text.replace(" ", "")) + 2
    # unknown chars map to <unk> id 0
    assert 0 in tok.text_to_ids("xyzq123")


def test_bpe_train_deterministic():
    a = BPETokenizer.train(CORPUS, 40)
    b = BPETokenizer.train(CORPUS, 40)
    assert a.vocab == b.vocab and a.merges == b.merges


def test_save_load_roundtrip(tmp_path):
    for tok in [BPETokenizer.train(CORPUS, 40), CharTokenizer.train(CORPUS)]:
        p = str(tmp_path / "tok.json")
        tok.save(p)
        loaded = load_tokenizer(p)
        assert loaded.text_to_ids("namaste") == tok.text_to_ids("namaste")


def test_multilingual_aggregate_semantics(tmp_path):
    hi = BPETokenizer.train(CORPUS, 40)
    bn = CharTokenizer.train(["nomoshkar bari", "jol ebong bari"])
    agg = MultilingualTokenizer({"hindi": hi, "bengali": bn})

    # aggregate bookkeeping (multilingual_tokenizer.py semantics)
    assert agg.vocab_size == hi.vocab_size + bn.vocab_size
    assert agg.token_id_offset == {"hindi": 0, "bengali": hi.vocab_size}
    assert agg.langs_by_token_id[0] == "hindi"
    assert agg.langs_by_token_id[hi.vocab_size] == "bengali"

    # text_to_ids returns LOCAL ids (no offset) — reference behavior
    ids = agg.text_to_ids("nomoshkar", "bengali")
    assert max(ids) < bn.vocab_size
    assert agg.ids_to_text(ids, "bengali") == "nomoshkar"

    # save/load of the aggregate
    agg.save(str(tmp_path / "agg"))
    loaded = MultilingualTokenizer.load(str(tmp_path / "agg"))
    assert loaded.langs == ["hindi", "bengali"]
    assert loaded.text_to_ids("namaste", "hindi") == agg.text_to_ids(
        "namaste", "hindi"
    )
