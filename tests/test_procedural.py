"""Procedural fake-CelebA: renderer <-> probe round-trip and dataset contract."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from dwcgan_tpu.data.pipeline import Batch, DataPipeline
from dwcgan_tpu.data.procedural import (
    ProceduralFaceDataset, attribute_accuracy, measure_attributes,
    render_face, sample_labels,
)


def test_probe_inverts_renderer():
    """measure_attributes must read back the exact bits render_face drew —
    this is what makes attribute-transfer accuracy on generated images a
    trustworthy metric."""
    rng = np.random.default_rng(7)
    labels = sample_labels(64, rng)
    imgs = np.stack([render_face(l, 128, np.random.default_rng(i))
                     for i, l in enumerate(labels)])
    acc = attribute_accuracy(imgs, labels)
    assert (acc >= 0.99).all(), f"probe accuracy per attr: {acc}"


def test_probe_works_at_64px():
    rng = np.random.default_rng(3)
    labels = sample_labels(32, rng)
    imgs = np.stack([render_face(l, 64, np.random.default_rng(100 + i))
                     for i, l in enumerate(labels)])
    acc = attribute_accuracy(imgs, labels)
    assert (acc >= 0.95).all(), f"probe accuracy per attr at 64px: {acc}"


def test_label_structure():
    labels = sample_labels(512, np.random.default_rng(0))
    # hair bits mutually exclusive
    assert (labels[:, :3].sum(1) <= 1).all()
    # beard only on males
    beard = labels[:, 7] == 0
    assert (labels[beard, 3] == 1).all()


def test_dataset_contract_and_pipeline():
    ds = ProceduralFaceDataset(n_samples=64, image_size=64, seed=11)
    img, src, trg, ids, length = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert src.shape == (8,) and trg.shape == (8,)
    assert ids.shape == (82,) and ids.dtype == np.int32
    assert 2 <= int(length) <= 82

    # deterministic render per index (nuisance keyed to index, not access)
    assert np.array_equal(ds.render(5), ds.render(5))

    pipe = DataPipeline(ds, batch_size=8, num_workers=2, seed=0)
    batch = next(iter(pipe))
    assert isinstance(batch, Batch)
    assert batch.image.shape == (8, 64, 64, 3)


def test_text_matches_labels():
    """The synthesized command must reflect the (src, trg) label pair."""
    ds = ProceduralFaceDataset(n_samples=16, image_size=64, seed=2)
    src = np.array([1, 0, 0, 1, 0, 1, 0, 1], np.float32)
    trg = np.array([0, 1, 0, 1, 0, 1, 0, 1], np.float32)
    cmd = ds.synth.labels2text(src, trg)
    assert isinstance(cmd, str) and len(cmd.split()) >= 2
