"""Cross-implementation validation of SentencePieceTokenizer.

VERDICT r2 next #2: the original tokenizer tests built every fixture with
the module's own ``serialize_sentencepiece_model`` — parser and serializer
could share a wrong assumption and every test would still pass.  This file
breaks the circularity twice over:

  1. The ``tokenizer.model`` fixture bytes are produced by **Google's
     protobuf runtime** via the SentencePiece ModelProto schema that ships
     inside ``transformers`` (``sentencepiece_model_pb2_new``) — a fully
     independent wire-format implementation.
  2. Encoding/decoding is diffed against the installed HF ``tokenizers``
     Rust library, configured exactly the way
     ``transformers.convert_slow_tokenizer.LlamaConverter`` converts real
     LLaMA SentencePiece models: BPE with byte_fallback + fuse_unk, merges
     extracted as *all two-way splits of every piece* ranked by the merged
     piece's score, normalizer [Prepend("▁"), Replace(" ", "▁")], decoder
     [Replace("▁", " "), ByteFallback, Fuse, Strip(" ", 1)].

The shared vocab is *trained* with the HF BPE trainer on a corpus that
includes the PREGO prompt strings (reference seam:
step_anticipation/llama/tokenizer.py:23-68), so the merge table is
realistic rather than hand-picked.  A differential fuzz pass compares
encode ids and decode round-trips over randomized mixed-script strings
including emoji, variation selectors, skin-tone modifiers and ZWJ
sequences (SURVEY.md §7 hard part 4).
"""

import random

import pytest

from prego_tpu.anticipation.prompts import (
    START_TOKEN_EMOJI,
    START_TOKEN_NUM,
    load_context_styles,
)
from prego_tpu.models.llama.tokenizer import SentencePieceTokenizer

tokenizers = pytest.importorskip("tokenizers")

UNK, CONTROL, NORMAL, BYTE = 2, 3, 1, 6


# --------------------------------------------------------------- shared vocab


def _prego_prompt_corpus():
    """Real PREGO prompt material: every embedded context style plus
    representative anticipation prompts in num/alpha/emoji symbolization."""
    texts = []
    for style in load_context_styles().values():
        texts.extend(v for v in style.values() if isinstance(v, str))
    texts += [
        "Sequence type: a21\nInput Sequence:\n -1, 39, 74, 2, 11\nNext Symbol:\n 37",
        f"Input Sequence:\n {START_TOKEN_NUM}, 5, 12\nNext Symbol:\n",
        f"Input Sequence:\n {START_TOKEN_EMOJI} \U0001f9f8 ❄️\nNext Symbol:\n",
        "attach-tilter detach-interior position-chassis screw-into-base",
        "The quick brown fox jumps over the lazy dog. 0123456789",
        "assembly of toy a21 proceeds step by step",
    ]
    return texts


def _train_piece_list(corpus, vocab_size=420):
    """Train an HF BPE on the normalized corpus to obtain a realistic piece
    inventory, then lay it out LLaMA-style: <unk>, <s>, </s>, 256 byte
    pieces, then content pieces with strictly decreasing scores (real
    LLaMA-2 scores are -(id - 2); monotone-in-id is what makes SP's
    score-driven merge order equal HF's rank-driven one)."""
    from tokenizers import Tokenizer, models, trainers

    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=[], show_progress=False
    )
    normalized = ["▁" + t.replace(" ", "▁") for t in corpus]
    tk.train_from_iterator(normalized, trainer)
    vocab = sorted(tk.get_vocab().items(), key=lambda kv: kv[1])

    pieces = [("<unk>", 0.0, UNK), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [
        (text, -float(i + 1), NORMAL)
        for i, (text, _) in enumerate(vocab)
        if text != "<unk>"
    ]
    return pieces


def _serialize_with_google_protobuf(pieces):
    """Independent serializer: transformers' compiled SentencePiece
    ModelProto schema + the google protobuf runtime (NOT the module's own
    serialize_sentencepiece_model)."""
    from transformers.utils import sentencepiece_model_pb2_new as pb

    m = pb.ModelProto()
    for text, score, ptype in pieces:
        p = m.pieces.add()
        p.piece = text
        p.score = score
        p.type = ptype
    m.trainer_spec.model_type = pb.TrainerSpec.BPE
    m.trainer_spec.unk_id, m.trainer_spec.bos_id, m.trainer_spec.eos_id = 0, 1, 2
    m.normalizer_spec.add_dummy_prefix = True
    m.normalizer_spec.remove_extra_whitespaces = False
    return m.SerializeToString()


def _hf_llama_tokenizer(pieces):
    """Build the HF `tokenizers` object the way LlamaConverter does."""
    from tokenizers import Tokenizer, decoders, models, normalizers

    vocab = {text: i for i, (text, _, _) in enumerate(pieces)}
    # SentencePieceExtractor-style merges: every 2-way split of every
    # piece whose halves are themselves pieces, ranked by merged score.
    merges = []
    for text, score, ptype in pieces:
        if ptype != NORMAL or len(text) < 2:
            continue
        for k in range(1, len(text)):
            left, right = text[:k], text[k:]
            if left in vocab and right in vocab:
                merges.append((score, left, right))
    merges = [(l, r) for _, l, r in sorted(merges, key=lambda t: -t[0])]

    tk = Tokenizer(
        models.BPE(
            vocab=vocab,
            merges=merges,
            unk_token="<unk>",
            fuse_unk=True,
            byte_fallback=True,
        )
    )
    tk.normalizer = normalizers.Sequence(
        [normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")]
    )
    tk.decoder = decoders.Sequence(
        [
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(" ", 1, 0),
        ]
    )
    return tk


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    corpus = _prego_prompt_corpus()
    pieces = _train_piece_list(corpus)
    path = tmp_path_factory.mktemp("spm") / "tokenizer.model"
    path.write_bytes(_serialize_with_google_protobuf(pieces))
    ours = SentencePieceTokenizer(str(path))
    theirs = _hf_llama_tokenizer(pieces)
    return ours, theirs, pieces, corpus


# -------------------------------------------------------------------- parser


def test_parser_reads_google_protobuf_fixture(pair):
    ours, _, pieces, _ = pair
    assert ours.n_words == len(pieces)
    assert ours.unk_id == 0 and ours.bos_id == 1 and ours.eos_id == 2
    for i, (text, score, ptype) in enumerate(pieces):
        assert ours.pieces[i].text == text
        assert ours.pieces[i].type == ptype
        assert abs(ours.pieces[i].score - score) < 1e-6
    assert ours.piece_to_id["<0x5A>"] == 3 + 0x5A


# ------------------------------------------------------------ encode parity

TRICKY = [
    "",
    " ",
    "   ",
    " leading space",
    "trailing space ",
    "tab\tand\nnewline",
    "hello world",
    "👉 5, 12, 37",
    "a❄️b",        # variation selector
    "👍🏽",          # skin-tone modifier
    "👨‍👩‍👧‍👦",          # ZWJ family sequence
    "héllo wörld",
    "日本語テスト",
    "mixed 日本 and 👉 emoji",
    "-1, 39, 74, 2, 11",
    "Sequence type: a21",
]


def test_encode_matches_hf_on_prego_prompts(pair):
    ours, theirs, _, corpus = pair
    for text in corpus:
        got = ours.encode(text, bos=False, eos=False)
        want = theirs.encode(text, add_special_tokens=False).ids
        assert got == want, f"mismatch on prompt {text!r}"


def test_encode_matches_hf_on_tricky_strings(pair):
    ours, theirs, _, _ = pair
    for text in TRICKY:
        got = ours.encode(text, bos=False, eos=False)
        want = theirs.encode(text, add_special_tokens=False).ids
        assert got == want, f"mismatch on {text!r}"


def test_decode_matches_hf(pair):
    ours, theirs, _, corpus = pair
    for text in corpus + TRICKY:
        ids = theirs.encode(text, add_special_tokens=False).ids
        assert ours.decode(ids) == theirs.decode(ids), f"decode mismatch {text!r}"


# ----------------------------------------------------------------- fuzz pass

ALPHABET = (
    list("abcdefghijklmnopqrstuvwxyz0123456789 ,.-\n\t")
    + ["▁", "👉", "❄️", "👍🏽", "é", "日", "語", "🧸", "<", ">", "‍"]
    + ["hello", "Sequence", "Input", "Next Symbol", " -1,", "attach-tilter"]
)


def test_differential_fuzz_encode_decode(pair):
    ours, theirs, _, _ = pair
    rng = random.Random(1234)
    for trial in range(300):
        n = rng.randint(0, 24)
        text = "".join(rng.choice(ALPHABET) for _ in range(n))
        got = ours.encode(text, bos=False, eos=False)
        want = theirs.encode(text, add_special_tokens=False).ids
        assert got == want, f"trial {trial}: encode mismatch on {text!r}"
        assert ours.decode(got) == theirs.decode(want), (
            f"trial {trial}: decode mismatch on {text!r}"
        )


def test_unconditional_dummy_prefix(pair):
    """spm prepends the dummy prefix even when the text already starts
    with whitespace — ' hello' is '▁▁hello', not '▁hello' (the r2 repo
    behavior silently differed here; this pins the fix)."""
    ours, theirs, _, _ = pair
    got = ours.encode_as_pieces(" hello")
    assert got[0] == "▁" or got[0].startswith("▁▁"), got
    assert ours.encode(" hello", bos=False, eos=False) == (
        theirs.encode(" hello", add_special_tokens=False).ids
    )
