"""Integration tests over real image files: a tiny on-disk fake CelebA drives
the dataset (JPEG decode, crop, native/PIL resize, flip), the training
pipeline, and the evaluate/translate CLIs end-to-end on the CPU mesh."""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from dwcgan_tpu.data.celeba import CelebADataset
from dwcgan_tpu.data.pipeline import DataPipeline

N_IMAGES = 24
ATTRS = "Black_Hair Blond_Hair Brown_Hair Male Smiling Young Eyeglasses No_Beard"


@pytest.fixture(scope="module")
def fake_celeba(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeba")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = [str(N_IMAGES), ATTRS]
    for i in range(N_IMAGES):
        arr = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.jpg")
        vals = " ".join("1" if v else "-1" for v in rng.integers(0, 2, 8))
        lines.append(f"{i:06d}.jpg {vals}")
    attr_path = root / "list_attr_celeba.txt"
    attr_path.write_text("\n".join(lines))
    return str(img_dir), str(attr_path)


def _tiny_cfg_dict(image_dir, attr_path):
    return {
        "dataset": "CelebA", "max_iter": 2, "batch_size": 8,
        "image_size": 32, "crop_size": 160, "compute_dtype": "float32",
        "log_iter": 1, "image_display_iter": 100, "image_save_iter": 100,
        "snapshot_save_iter": 2, "display_size": 2, "num_workers": 2,
        "data_root": image_dir, "attr_path": attr_path, "test_split": 4,
        "pretrained_embed": None,
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    }


@pytest.mark.parametrize("backend", ["native", "pil"])
def test_dataset_loads_real_jpegs(fake_celeba, backend):
    img_dir, attr_path = fake_celeba
    ds = CelebADataset(img_dir, attr_path, mode="train", crop_size=160,
                       image_size=32, test_split=4, resize_backend=backend)
    assert len(ds) == N_IMAGES - 4
    image, src, trg, txt, tlen = ds[0]
    assert image.shape == (32, 32, 3) and image.dtype == np.float32
    # 255 * (1/127.5) - 1 rounds to 1.0000001 in fp32; allow the ulp
    assert -1.0 - 1e-5 <= image.min() and image.max() <= 1.0 + 1e-5
    assert txt.shape == (82,) and tlen >= 2


def test_pipeline_over_real_images(fake_celeba):
    img_dir, attr_path = fake_celeba
    ds = CelebADataset(img_dir, attr_path, mode="train", crop_size=160,
                       image_size=32, test_split=4)
    batch = next(iter(DataPipeline(ds, batch_size=4, num_workers=2, seed=0)))
    assert batch.image.shape == (4, 32, 32, 3)
    assert np.isfinite(batch.image).all()


def test_train_then_evaluate_and_translate_cli(fake_celeba, tmp_path):
    """Train 2 steps on the fake CelebA, then run evaluate (FID/IS with a
    random-init inception) and translate over the protocol list formats."""
    img_dir, attr_path = fake_celeba
    cfg_path = tmp_path / "it.yaml"
    cfg_path.write_text(yaml.safe_dump(_tiny_cfg_dict(img_dir, attr_path)))

    from dwcgan_tpu.cli.train import main as train_main
    train_main(["--config", str(cfg_path), "--output_path", str(tmp_path)])
    ckpt_dir = tmp_path / "outputs" / "it" / "checkpoints"
    assert ckpt_dir.exists()

    # protocol lists (reference valid/FID-IS formats)
    names = sorted(os.listdir(img_dir))[:6]
    real_list = tmp_path / "real.lst"
    real_list.write_text("\n".join(names))
    src2trg = tmp_path / "src2trg.lst"
    src2trg.write_text("\n".join(f"{n}\tmake hair blond ." for n in names))

    from dwcgan_tpu.cli.evaluate import main as eval_main
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["--config", str(cfg_path), "--checkpoint", str(ckpt_dir),
                   "--real_list", str(real_list), "--src2trg_list", str(src2trg),
                   "--batch_size", "3", "--limit", "6"])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(result["fid"]) and result["fid"] >= 0
    assert result["n_real"] == 6 and result["n_fake"] == 6
    assert result["is_mean"] > 0

    from dwcgan_tpu.cli.translate import main as translate_main
    out_dir = tmp_path / "edited"
    translate_main(["--config", str(cfg_path), "--checkpoint", str(ckpt_dir),
                    "--list", str(src2trg), "--image_dir", img_dir,
                    "--out_dir", str(out_dir), "--batch_size", "4"])
    written = sorted(os.listdir(out_dir))
    assert len(written) == 6
    # line-indexed names: repeated source images never overwrite each other
    assert written[0] == f"000000_{names[0]}"
    out = np.asarray(Image.open(out_dir / written[0]))
    assert out.shape == (32, 32, 3)
