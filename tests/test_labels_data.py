"""Tests for label utilities, config, and the data pipeline."""

import numpy as np
import pytest

from dwcgan_tpu.config import Config, config_from_dict, load_config
from dwcgan_tpu.data.labels import all_domains, assign_label, create_labels, label2onehot
from dwcgan_tpu.data.pipeline import Batch, DataPipeline, synthetic_batch


def test_label2onehot():
    out = label2onehot(np.array([0, 2, 1]), 3)
    assert out.shape == (3, 3)
    np.testing.assert_array_equal(out, np.eye(3)[[0, 2, 1]])


def test_assign_label_pm1():
    # binary {0,1} -> GMM means {-1,+1} (tools.py:40-47)
    lab = np.array([[0, 1, 1, 0]], dtype=np.float32)
    out = assign_label(lab, mode="CelebA")
    np.testing.assert_array_equal(out, [[-1.0, 1.0, 1.0, -1.0]])
    # categorical path
    out2 = assign_label(np.array([1]), c_dim=3, mode="RaFD")
    np.testing.assert_array_equal(out2, [[-1.0, 1.0, -1.0]])


def test_create_labels_hair_exclusivity():
    attrs = ["Black_Hair", "Blond_Hair", "Brown_Hair", "Male", "Smiling",
             "Young", "Eyeglasses", "No_Beard"]
    c_org = np.array([[1, 0, 0, 1, 0, 1, 0, 0]], dtype=np.float32)
    labs = create_labels(c_org, c_dim=8, dataset="CelebA", selected_attrs=attrs)
    assert len(labs) == 8
    # flipping to blond must zero black/brown
    np.testing.assert_array_equal(labs[1][0, :3], [0, 1, 0])
    # non-hair attrs toggle
    assert labs[3][0, 3] == 0.0
    assert labs[4][0, 4] == 1.0


def test_all_domains():
    d = all_domains(8)
    assert d.shape == (256, 8)
    assert len({tuple(r) for r in d}) == 256


def test_config_defaults_validate():
    cfg = Config().validate()
    assert cfg.style_dim == 64
    assert cfg.gen.style_dim == 64


def test_config_loads_reference_yaml():
    """The reference's own YAML schema must load unchanged."""
    cfg = load_config("/root/reference/configs/celeba_faces.yaml")
    assert cfg.batch_size == 1
    assert cfg.gen.dim == 64 and cfg.gen.num_cls == 8
    assert cfg.dis.gan_type == "lsgan" and cfg.dis.num_scales == 2
    assert cfg.lr == 1e-4 and cfg.dist_mode == "kls"
    assert cfg.crop_size == 178 and cfg.image_size == 128


def test_config_rejects_bad_values():
    with pytest.raises(AssertionError):
        config_from_dict({"lr_policy": "bogus"})
    with pytest.raises(AssertionError):
        config_from_dict({"dis": {"gan_type": "hinge"}})


def test_synthetic_batch_shapes():
    b = synthetic_batch(4, image_size=64)
    assert b.image.shape == (4, 64, 64, 3)
    assert b.src_label.shape == (4, 8) and b.trg_label.shape == (4, 8)
    assert b.txt.shape == (4, 82) and b.txt.dtype == np.int32
    assert b.txt_len.shape == (4,)
    assert b.image.min() >= -1.0 and b.image.max() <= 1.0
    assert set(np.unique(b.src_label)) <= {0.0, 1.0}


class _TinyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        b = synthetic_batch(1, image_size=32, seed=i)
        return (b.image[0], b.src_label[0], b.trg_label[0], b.txt[0], b.txt_len[0])


def test_pipeline_batches():
    pipe = DataPipeline(_TinyDataset(), batch_size=4, num_workers=2, seed=0)
    it = iter(pipe)
    for _ in range(3):
        batch = next(it)
        assert isinstance(batch, Batch)
        assert batch.image.shape == (4, 32, 32, 3)
        assert batch.txt.shape == (4, 82)


def test_pipeline_surfaces_worker_errors():
    """A failing dataset must raise in the consumer, not hang the loop."""

    class BadDataset:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            raise IOError(f"corrupt image {i}")

    pipe = DataPipeline(BadDataset(), batch_size=4, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(pipe))


def test_celeba_dataset_split(tmp_path):
    """Attr-file parsing + seed-1234 split parity (celeba_data.py:46-73)."""
    from dwcgan_tpu.data.celeba import CelebADataset

    n = 50
    lines = [str(n), "Black_Hair Blond_Hair Brown_Hair Male Smiling Young Eyeglasses No_Beard"]
    rng = np.random.default_rng(0)
    for i in range(n):
        vals = " ".join("1" if v else "-1" for v in rng.integers(0, 2, 8))
        lines.append(f"img{i:04d}.jpg {vals}")
    p = tmp_path / "attrs.txt"
    p.write_text("\n".join(lines))

    train = CelebADataset("unused", str(p), mode="train", test_split=10)
    test = CelebADataset("unused", str(p), mode="test", test_split=10)
    assert len(train) == 40 and len(test) == 10
    train_files = {f for f, _ in train.samples}
    test_files = {f for f, _ in test.samples}
    assert not (train_files & test_files)
    # deterministic split across constructions
    train2 = CelebADataset("unused", str(p), mode="train", test_split=10)
    assert [f for f, _ in train2.samples] == [f for f, _ in train.samples]
