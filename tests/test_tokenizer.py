"""SentencePiece-compatible tokenizer: model-proto parsing, BPE merges,
byte fallback, round trips (replaces the sentencepiece C++ dependency,
llama/tokenizer.py:13-68)."""

import numpy as np
import pytest

from prego_tpu.models.llama.tokenizer import (
    ByteTokenizer,
    SentencePieceTokenizer,
    serialize_sentencepiece_model,
)

UNK, CONTROL, BYTE, NORMAL = 2, 3, 6, 1


def write_model(tmp_path, pieces):
    path = tmp_path / "tokenizer.model"
    path.write_bytes(serialize_sentencepiece_model(pieces))
    return str(path)


@pytest.fixture
def sp(tmp_path):
    # llama-style layout: unk/bos/eos first, then byte pieces, then merges
    pieces = [
        ("<unk>", 0.0, UNK),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
    ]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    vocab = {
        "▁": -2.0,
        "a": -1.0,
        "b": -1.5,
        "c": -1.6,
        "ab": -0.5,
        "abc": -0.1,
        "▁ab": -0.4,
        "▁hello": -0.2,
        "hello": -0.9,
        "h": -3.0, "e": -3.0, "l": -3.0, "o": -3.0,
    }
    pieces += [(t, s, NORMAL) for t, s in vocab.items()]
    return SentencePieceTokenizer(write_model(tmp_path, pieces))


def test_ids_and_specials(sp):
    assert sp.unk_id == 0 and sp.bos_id == 1 and sp.eos_id == 2
    assert sp.pad_id == -1
    assert sp.n_words == 3 + 256 + 13


def test_merge_order_prefers_best_score(sp):
    # "abc": merges available: a+b->ab (-0.5), b+c (none), ab+c->abc (-0.1)
    # greedy best-score: first a+b (only pair), then ab+c -> ["▁", "abc"]?
    # "▁a" absent so ▁ stays alone; final pieces ▁ + abc
    pieces = sp.encode_as_pieces("abc")
    assert pieces == ["▁", "abc"]


def test_dummy_prefix_merge(sp):
    # "ab" -> normalized "▁ab" which exists as one piece (score -0.4)
    assert sp.encode_as_pieces("ab") == ["▁ab"]


def test_encode_decode_roundtrip(sp):
    ids = sp.encode("hello", bos=True, eos=True)
    assert ids[0] == sp.bos_id and ids[-1] == sp.eos_id
    assert sp.decode(ids) == "hello"
    assert sp.decode(sp.encode("ab abc", bos=False, eos=False)) == "ab abc"


def test_byte_fallback_for_unknown_chars(sp):
    ids = sp.encode("aZ", bos=False, eos=False)
    # 'Z' not in vocab -> UTF-8 byte fallback piece <0x5A>
    byte_id = sp.piece_to_id["<0x5A>"]
    assert byte_id in ids
    assert sp.decode(ids) == "aZ"


def test_multibyte_emoji_roundtrip(sp):
    # multi-codepoint emoji survive via byte fallback (SURVEY.md §7 hard part 4)
    s = "a❄️"  # ❄️ = snowflake + variation selector
    assert sp.decode(sp.encode(s, bos=False, eos=False)) == s


def test_byte_tokenizer_roundtrip():
    bt = ByteTokenizer()
    s = "hi 👉 37"
    ids = bt.encode(s, bos=True, eos=True)
    assert ids[0] == bt.bos_id and ids[-1] == bt.eos_id
    assert bt.decode(ids) == s
