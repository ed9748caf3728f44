"""`cli.build_embeddings` round-trip against a fabricated fastText .vec file.

The reference tool (`/root/reference/tools/build_embeddings.py:1-35`) scans
fastText wiki.en vectors for every vocab word and pickles {word: float32[300]}.
No egress here, so the test fabricates a tiny .vec file (header line, a
malformed line, vocab words, decoy non-vocab words) and verifies the full
consumption chain: build -> cli.train.load_pretrained_embeddings ->
models.generator.build_embedding_matrix — known rows land exactly at their
vocab indices, absent words get the documented N(0, 0.6) fallback rows.
"""

import numpy as np

from dwcgan_tpu.cli.build_embeddings import build
from dwcgan_tpu.cli.train import load_pretrained_embeddings
from dwcgan_tpu.models.generator import build_embedding_matrix
from dwcgan_tpu.text.vocab import Vocab

DIM = 300


def _write_vec(path, entries):
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{len(entries)} {DIM}\n")  # fastText header (skipped: 2 parts)
        f.write("broken 1.0 2.0\n")  # malformed line (skipped: wrong arity)
        for word, vec in entries.items():
            f.write(word + " " + " ".join(f"{v:.8e}" for v in vec) + "\n")


def test_build_embeddings_roundtrip(tmp_path, capsys):
    vocab = Vocab("CelebA")
    rng = np.random.default_rng(0)

    known = [w for w in vocab.itos if w.isalpha()][:10]
    entries = {w: rng.normal(size=DIM).astype(np.float32) for w in known}
    # duplicate entry for a known word: first occurrence must win
    dup_word = known[0]
    dup_alt = rng.normal(size=DIM).astype(np.float32)
    entries_order = dict(entries)
    entries_order["zzz_not_in_vocab"] = rng.normal(size=DIM).astype(np.float32)

    vec_path = tmp_path / "wiki.en.vec"
    _write_vec(vec_path, entries_order)
    with open(vec_path, "a", encoding="utf-8") as f:
        f.write(dup_word + " " + " ".join(f"{v:.8e}" for v in dup_alt) + "\n")

    out_path = tmp_path / "embeddings.npy"
    build(str(vec_path), "CelebA", str(out_path), dim=DIM)
    printed = capsys.readouterr().out
    assert f"{len(known)}/{vocab.size}" in printed

    loaded = load_pretrained_embeddings(str(out_path))
    assert loaded is not None and set(loaded) == set(known)
    for w in known:
        np.testing.assert_array_equal(loaded[w], entries[w])
    # decoy word excluded, duplicate did not overwrite
    assert "zzz_not_in_vocab" not in loaded
    np.testing.assert_array_equal(loaded[dup_word], entries[dup_word])

    table = build_embedding_matrix(vocab, DIM, pretrained=loaded, seed=0)
    assert table.shape == (vocab.size, DIM)
    ref_rng = np.random.default_rng(0)
    for i, w in enumerate(vocab.itos):
        expect = (np.asarray(entries[w], np.float32) if w in entries
                  else ref_rng.normal(scale=0.6, size=(DIM,)))
        if w in entries:
            np.testing.assert_array_equal(table[i], expect)
        else:
            np.testing.assert_allclose(table[i], expect.astype(np.float32))


def test_build_embeddings_all_representable_words_found(tmp_path):
    """Every representable vocab word present -> all kept; the ' ' (space)
    token cannot exist in a space-separated .vec file (true of real fastText
    too) and falls back to an N(0, 0.6) row."""
    vocab = Vocab("CelebA")
    rng = np.random.default_rng(1)
    entries = {w: rng.normal(size=DIM).astype(np.float32)
               for w in vocab.itos if w != " "}
    vec_path = tmp_path / "full.vec"
    _write_vec(vec_path, entries)
    out_path = tmp_path / "full.npy"
    build(str(vec_path), "CelebA", str(out_path), dim=DIM)
    loaded = load_pretrained_embeddings(str(out_path))
    assert set(loaded) == set(entries)
    table = build_embedding_matrix(vocab, DIM, pretrained=loaded, seed=3)
    for i, w in enumerate(vocab.itos):
        if w != " ":
            np.testing.assert_array_equal(table[i], entries[w])
