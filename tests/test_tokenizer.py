"""data/tokenizer: special-id contract, round trip, blank placement, determinism."""
import json

import pytest

from hnet_mamba_asr_tpu.data.tokenizer import Tokenizer

CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the quick brown fox jumps over the lazy dog",
    "she sells sea shells on the sea shore",
    "peter piper picked a peck of pickled peppers",
] * 4


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    prefix = tmp_path_factory.mktemp("tok") / "bpe64"
    return Tokenizer.train(CORPUS, prefix, vocab_size=64, hard_vocab_limit=False)


def test_special_contract(tok):
    assert (tok.unk_id, tok.bos_id, tok.eos_id, tok.pad_id) == (0, 1, 2, 3)
    assert tok.blank_id == tok.vocab_size
    assert len(tok) == tok.vocab_size <= 64


def test_round_trip(tok):
    for text in ["the cat sat on the mat", "a dog", "sea shells"]:
        ids = tok.encode(text)
        assert all(0 <= i < tok.vocab_size for i in ids)
        assert tok.decode(ids) == text


def test_bos_eos_wrapping(tok):
    ids = tok.encode("the cat", bos=True, eos=True)
    assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
    assert tok.decode(ids) == "the cat"                  # specials dropped


def test_decode_drops_blank_and_oob(tok):
    ids = tok.encode("the cat")
    noisy = [tok.blank_id] + ids[:1] + [tok.pad_id] + ids[1:] + [9999]
    assert tok.decode(noisy) == "the cat"


def test_unknown_chars_to_unk(tok):
    ids = tok.encode("zzz éé")                 # chars absent from corpus
    assert tok.unk_id in ids


def test_id_to_piece(tok):
    assert tok.id_to_piece(tok.blank_id) == "<blank>"
    assert tok.id_to_piece(0) == "<unk>"


def test_deterministic_training(tmp_path):
    a = Tokenizer.train(CORPUS, tmp_path / "a", vocab_size=64, hard_vocab_limit=False)
    b = Tokenizer.train(CORPUS, tmp_path / "b", vocab_size=64, hard_vocab_limit=False)
    assert a.pieces == b.pieces and a.merges == b.merges


def test_foreign_model_rejected(tmp_path):
    bad = tmp_path / "bad.model"
    bad.write_text(json.dumps({"format": "hmasr-bpe", "version": 1,
                               "pieces": ["<pad>", "<s>", "</s>", "<unk>", "a"],
                               "merges": []}))
    with pytest.raises(ValueError, match="fixed"):
        Tokenizer(bad)


def test_hard_vocab_limit(tmp_path):
    with pytest.raises(ValueError):
        Tokenizer.train(["ab"], tmp_path / "tiny", vocab_size=5000)


def test_corpus_file_input(tok, tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text("\n".join(CORPUS))
    t2 = Tokenizer.train(f, tmp_path / "fromfile", vocab_size=64, hard_vocab_limit=False)
    assert t2.pieces == tok.pieces
