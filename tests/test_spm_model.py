"""Pure-Python SentencePiece ModelProto reader/encoder tests.

Crafts real ModelProto binaries with a hand-rolled protobuf writer (so the
parser is tested against the actual wire format, not its own output) and
checks unigram Viterbi, BPE merge order, decode round-trips, unknown-char
and byte fallbacks, and the normalizer flags.
"""

import struct

import pytest

from indic_cl_asr_tpu.data.spm_model import (
    BPE,
    UNIGRAM,
    SpmModel,
)

B = "▁"  # word-boundary marker


# ------------------------------------------------- protobuf wire writer

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(num: int, val: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(val)


def _field_bytes(num: int, val: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(val)) + val


def _field_f32(num: int, val: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", val)


def make_model_bytes(
    pieces,  # [(piece, score, type)]
    model_type=UNIGRAM,
    unk_id=0,
    byte_fallback=False,
    add_dummy_prefix=True,
    remove_extra_ws=True,
) -> bytes:
    blob = b""
    for piece, score, ptype in pieces:
        sp = (
            _field_bytes(1, piece.encode("utf-8"))
            + _field_f32(2, score)
            + _field_varint(3, ptype)
        )
        blob += _field_bytes(1, sp)
    trainer = (
        _field_varint(3, model_type)
        + _field_varint(35, int(byte_fallback))
        + _field_varint(40, unk_id)
        # unrelated fields the parser must skip cleanly:
        + _field_bytes(1, b"corpus.txt")
        + _field_varint(4, len(pieces))
    )
    blob += _field_bytes(2, trainer)
    norm = (
        _field_bytes(1, b"nmt_nfkc")
        + _field_varint(3, int(add_dummy_prefix))
        + _field_varint(4, int(remove_extra_ws))
    )
    blob += _field_bytes(3, norm)
    return blob


# control pieces as real models have them
_CTRL = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]


def unigram_model(tmp_path, extra_pieces, **kw):
    blob = make_model_bytes(_CTRL + extra_pieces, model_type=UNIGRAM, **kw)
    p = tmp_path / "m.model"
    p.write_bytes(blob)
    return SpmModel.load(str(p))


# ------------------------------------------------------------------ tests

def test_parse_piece_table_and_specs(tmp_path):
    m = unigram_model(
        tmp_path, [(B + "ab", -1.0, 1), ("c", -2.0, 1)],
        add_dummy_prefix=False, remove_extra_ws=False,
    )
    assert m.pieces[:3] == ["<unk>", "<s>", "</s>"]
    assert m.pieces[3:] == [B + "ab", "c"]
    assert m.scores[3] == pytest.approx(-1.0)
    assert m.model_type == UNIGRAM
    assert m.unk_id == 0
    assert m.add_dummy_prefix is False
    assert m.remove_extra_ws is False


def test_unigram_viterbi_picks_best_segmentation(tmp_path):
    # "▁abc": ▁a+b+c = -3, ▁ab+c = -2, ▁abc = -1.5 -> whole word wins
    m = unigram_model(tmp_path, [
        (B + "a", -1.0, 1), ("b", -1.0, 1), ("c", -1.0, 1),
        (B + "ab", -1.0, 1), (B + "abc", -1.5, 1),
    ])
    ids = m.encode_ids("abc")
    assert [m.pieces[i] for i in ids] == [B + "abc"]
    # make the whole-word piece worse than the split
    m2 = unigram_model(tmp_path, [
        (B + "a", -1.0, 1), ("b", -1.0, 1), ("c", -1.0, 1),
        (B + "abc", -4.0, 1),
    ])
    assert [m2.pieces[i] for i in m2.encode_ids("abc")] == [
        B + "a", "b", "c"
    ]


def test_unigram_unknown_char_maps_to_unk(tmp_path):
    m = unigram_model(tmp_path, [(B + "a", -1.0, 1)])
    ids = m.encode_ids("aQ")
    assert ids[0] == m.pieces.index(B + "a")
    assert ids[1] == m.unk_id


def test_byte_fallback(tmp_path):
    byte_pieces = [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    m = unigram_model(
        tmp_path, [(B + "a", -1.0, 1)] + byte_pieces, byte_fallback=True
    )
    ids = m.encode_ids("aé")  # é = 0xC3 0xA9 in UTF-8
    toks = [m.pieces[i] for i in ids]
    assert toks == [B + "a", "<0xC3>", "<0xA9>"]


def test_bpe_merge_order_follows_scores(tmp_path):
    # merges: (a,b)->ab score -1 ; (ab,c)->abc score -2
    blob = make_model_bytes(
        _CTRL + [
            (B, -10.0, 1), ("a", -10.0, 1), ("b", -10.0, 1),
            ("c", -10.0, 1), ("ab", -1.0, 1), ("abc", -2.0, 1),
        ],
        model_type=BPE,
    )
    p = tmp_path / "bpe.model"
    p.write_bytes(blob)
    m = SpmModel.load(str(p))
    toks = [m.pieces[i] for i in m.encode_ids("abc")]
    assert toks == [B, "abc"]


def test_decode_round_trip_and_control_skip(tmp_path):
    m = unigram_model(tmp_path, [
        (B + "hello", -1.0, 1), (B + "world", -1.0, 1),
    ])
    ids = m.encode_ids("hello world")
    assert m.decode_ids(ids) == "hello world"
    # control ids (bos/eos) are dropped in decode
    assert m.decode_ids([1] + ids + [2]) == "hello world"


def test_normalizer_flags(tmp_path):
    m = unigram_model(tmp_path, [
        (B + "a", -1.0, 1), ("b", -1.0, 1), (B + "b", -1.0, 1),
    ])
    # extra whitespace collapses; dummy prefix adds leading boundary
    assert m.encode_pieces("  a   b ") == [B + "a", B + "b"]
    m2 = unigram_model(
        tmp_path, [("a", -1.0, 1), ("b", -1.0, 1)],
        add_dummy_prefix=False,
    )
    assert m2.encode_pieces("ab") == ["a", "b"]


def test_devanagari_text(tmp_path):
    # Indic-script pieces work exactly like Latin (the models this loads
    # are Hindi/Bengali/... NeMo tokenizers)
    m = unigram_model(tmp_path, [
        (B + "नम", -1.0, 1), ("स्ते", -1.0, 1), (B + "नमस्ते", -1.5, 1),
    ])
    ids = m.encode_ids("नमस्ते")
    assert [m.pieces[i] for i in ids] == [B + "नमस्ते"]
    assert m.decode_ids(ids) == "नमस्ते"


def test_adapter_integration(tmp_path):
    from indic_cl_asr_tpu.data.tokenizer import SentencePieceTokenizer

    blob = make_model_bytes(_CTRL + [
        (B + "ka", -1.0, 1), ("ta", -1.0, 1), (B + "kata", -3.0, 1),
    ])
    p = tmp_path / "t.model"
    p.write_bytes(blob)
    tok = SentencePieceTokenizer(str(p))
    assert tok.vocab_size == 6
    ids = tok.text_to_ids("kata")
    assert tok.ids_to_text(ids) == "kata"
    assert tok.text_to_tokens("kata") == [B + "ka", "ta"]
    assert tok.ids_to_tokens(ids) == [B + "ka", "ta"]
