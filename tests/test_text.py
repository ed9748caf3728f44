"""Tests for vocab + text synthesizer (reference: vocab.py, celeba_text.py)."""

import random

import numpy as np
import pytest

from dwcgan_tpu.text.synthesis import CELEBA_ATTRS, TextSynthesizer
from dwcgan_tpu.text.vocab import PAD, BOS, EOS, UNK, Vocab, encode_commands, tokens_to_ids


def test_vocab_sizes():
    # reference CelebA vocab = 98 words + 4 specials = 102 (vocab.py:7-106;
    # verified against the reference list element-by-element)
    v = Vocab("CelebA")
    assert v.size == 102
    # CUB200 = 56 words + 4 specials = 60 (vocab.py:109-166)
    assert Vocab("CUB200").size == 60
    # without sentence markers: 2 specials
    assert Vocab("CelebA", with_markers=False).size == 100


def test_vocab_specials_layout():
    v = Vocab("CelebA")
    assert v.itos[:4] == [PAD, BOS, EOS, UNK]
    assert v.pad_id == 0 and v.bos_id == 1 and v.eos_id == 2 and v.unk_id == 3


def test_vocab_roundtrip():
    v = Vocab("CelebA")
    for w in ["black", "eyeglasses", "hair", ",", "?"]:
        assert v.decode(v.encode(w)) == w
    assert v.encode("zzz-not-a-word") == v.unk_id


def test_tokens_to_ids_shapes_and_padding():
    v = Vocab("CelebA")
    ids, lens = tokens_to_ids([["make", "hair", "blond"], []], v, max_len=80)
    assert ids.shape == (2, 82) and ids.dtype == np.int32
    # BOS w w w EOS then PAD
    assert ids[0, 0] == v.bos_id and ids[0, 4] == v.eos_id
    assert (ids[0, 5:] == v.pad_id).all()
    assert lens[0] == 5
    # empty command still has BOS+EOS, length >= 1
    assert lens[1] == 2


def test_tokens_to_ids_truncation():
    v = Vocab("CelebA")
    ids, lens = tokens_to_ids([["hair"] * 200], v, max_len=80)
    assert ids.shape == (1, 82)
    assert lens[0] == 82


def _random_label(rng):
    return np.array([rng.randint(0, 1) for _ in range(8)])


def test_synthesizer_deterministic_under_seed():
    src = np.array([1, 0, 0, 1, 0, 1, 0, 0])
    trg = np.array([0, 1, 0, 0, 1, 1, 0, 1])
    a = TextSynthesizer(random.Random(7))
    b = TextSynthesizer(random.Random(7))
    for _ in range(20):
        assert a.labels2text(src, trg) == b.labels2text(src, trg)


def test_synthesizer_vocab_closure():
    """Generated words are in-vocab except the reference's own OOV quirks.

    The reference appends '?'/'!' suffixes with no leading space
    (celeba_text.py:325), fusing them onto the last word, and emits 'is'
    ('this is', celeba_text.py:258) and 'changes' ('no changes', :51) which
    are absent from its vocab — those tokens map to UNK there too.
    """
    v = Vocab("CelebA")
    synth = TextSynthesizer(random.Random(0))
    rng = random.Random(1)
    for _ in range(500):
        src, trg = _random_label(rng), _random_label(rng)
        cmd = synth.labels2text(src, trg)
        for w in cmd.split():
            ok = (w in v.stoi or w in ("is", "changes")
                  or (w[-1] in "?!" and w[:-1] in v.stoi))
            assert ok, f"unexpected OOV word {w!r} in {cmd!r}"


def test_synthesizer_modes_nonempty_and_plausible():
    synth = TextSynthesizer(random.Random(3))
    src = np.array([1, 0, 0, 1, 0, 1, 0, 0])
    trg = np.array([0, 0, 1, 0, 1, 0, 1, 1])
    d = synth.diff2text(src, trg)
    o = synth.overall2text(trg)
    m = synth.mixed2text(src, trg)
    assert d and o and m
    # target hair is brown: overall description must mention it
    assert "brown" in o
    # diff mode for identical labels produces a no-op sentence
    same = synth.diff2text(src, src)
    assert any(k in same for k in ("nothing", "unchanged", "anything"))


def test_synthesizer_text_len_fits_cap():
    """Reference caps commands at 80 tokens (celeba_data.py:98); generated
    commands must comfortably fit."""
    synth = TextSynthesizer(random.Random(11))
    rng = random.Random(12)
    longest = 0
    for _ in range(1000):
        cmd = synth.labels2text(_random_label(rng), _random_label(rng))
        longest = max(longest, len(cmd.split()))
    assert longest <= 80


def test_encode_commands():
    v = Vocab("CelebA")
    ids, lens = encode_commands(["make hair blond .", "add glasses"], v)
    assert ids.shape == (2, 82)
    assert lens.tolist() == [6, 4]


def test_attrs_constant():
    # selected attributes fixed by the reference (train.py:50-51)
    assert CELEBA_ATTRS == (
        "Black_Hair", "Blond_Hair", "Brown_Hair", "Male",
        "Smiling", "Young", "Eyeglasses", "No_Beard",
    )
