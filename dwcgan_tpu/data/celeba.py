"""CelebA dataset: attribute parsing, split, pairing, text synthesis.

Behavior parity with `/root/reference/data_ios/celeba_data.py`:
- parse `list_attr_celeba.txt`, select 8 attributes              (:46-66)
- seed-1234 shuffle; first 1,999 lines -> test, rest -> train    (:56-71)
- each sample pairs with a *random other sample's* label         (:92)
- command synthesized on the fly, tokenized to fixed shape       (:97-100)
- CenterCrop(crop)->Resize(size)->[-1,1]; train adds random flip
  (reference transform stack: data_loader.py:12-24)
- grayscale images broadcast to RGB                              (:104-105)

TPU-first difference: __getitem__ returns NumPy NHWC arrays and all text is
padded to a constant width so device shapes are static.
"""

from __future__ import annotations

import os
import random
from typing import List, Tuple

import numpy as np

from dwcgan_tpu.data.drawkey import draw_key
from dwcgan_tpu.text.synthesis import CELEBA_ATTRS, TextSynthesizer
from dwcgan_tpu.text.vocab import Vocab, tokens_to_ids

try:  # Pillow is optional: synthetic pipelines never touch it
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _center_crop_resize(img: "Image.Image", crop: int, size: int,
                        backend: str = "auto") -> np.ndarray:
    """CenterCrop(crop) -> Resize(size, bilinear) -> [-1, 1].

    backend 'native' uses the fused C++ kernel (half-pixel bilinear, matching
    F.interpolate/jax.image.resize); 'pil' uses PIL's antialiased resize (the
    reference's torchvision path); 'auto' prefers native when built.
    """
    arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
    if backend != "pil":
        from dwcgan_tpu import native
        if backend == "native" or native.available():
            return native.preprocess_batch(arr[None], crop, size)[0]
    w, h = img.size
    left, top = (w - crop) // 2, (h - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    img = img.resize((size, size), Image.BILINEAR)
    out = np.asarray(img, dtype=np.float32)
    if out.ndim == 2:  # grayscale -> RGB
        out = np.stack([out] * 3, axis=-1)
    return out / 127.5 - 1.0  # Normalize(0.5, 0.5) equivalent


class CelebADataset:
    """CelebA images + attribute labels + synthesized commands."""

    def __init__(
        self,
        image_dir: str,
        attr_path: str,
        selected_attrs: Tuple[str, ...] = CELEBA_ATTRS,
        mode: str = "train",
        crop_size: int = 178,
        image_size: int = 128,
        max_text_len: int = 80,
        seed: int = 1234,
        test_split: int = 1999,
        resize_backend: str = "auto",
    ):
        self.image_dir = image_dir
        self.mode = mode
        self.crop_size = crop_size
        self.image_size = image_size
        self.max_text_len = max_text_len
        self.resize_backend = resize_backend
        self.vocab = Vocab("CelebA")
        self.seed = seed
        self.rng = random.Random(seed)
        self.synth = TextSynthesizer(self.rng)
        self._rng_salt = 0

        self.samples = self._parse(attr_path, selected_attrs, seed, test_split)

    def reseed_augmentation(self, salt: int) -> None:
        """Decorrelate per-item augmentation randomness (random target-label
        pairing, horizontal flip, text synthesis) across data-parallel
        hosts.  The split (`self.samples`) is deliberately untouched: it
        must stay process-identical so every host's disjoint index slice
        refers to the same global dataset (SURVEY §5.8).  Called by
        `DataPipeline` with salt=process_index when process_count > 1;
        never called single-process, so single-host behavior is unchanged.
        """
        self._rng_salt = salt
        self.rng = random.Random(self.seed * 1_000_003 + 7919 * (salt + 1))
        self.synth = TextSynthesizer(self.rng)

    def _parse(self, attr_path, selected_attrs, seed, test_split) -> List[Tuple[str, List[int]]]:
        with open(attr_path, "r") as f:
            lines = [ln.rstrip() for ln in f]
        attr_names = lines[1].split()
        attr2idx = {a: i for i, a in enumerate(attr_names)}
        cols = [attr2idx[a] for a in selected_attrs]

        rows = lines[2:]
        # split must match the reference exactly (seed-1234 shuffle,
        # first 1,999 -> test: celeba_data.py:56-71)
        shuffler = random.Random(seed)
        shuffler.shuffle(rows)
        out = []
        for i, row in enumerate(rows):
            parts = row.split()
            label = [int(parts[1 + c] == "1") for c in cols]
            is_test = i < test_split
            if (self.mode == "test") == is_test:
                out.append((parts[0], label))
        return out

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        """Returns (image [H,W,3] f32 in [-1,1], src_label, trg_label, txt_ids, txt_len)."""
        return self._make_item(index, self.rng, self.synth)

    def item(self, index: int, epoch: int):
        """Deterministic variant of __getitem__: augmentation (target
        pairing, text synthesis, flip) keyed by (seed, host salt, epoch,
        index) instead of the shared stateful RNG — content independent of
        prefetch-thread scheduling (reference DataLoader reproducibility;
        see data/drawkey.py)."""
        rng = random.Random(draw_key(self.seed, self._rng_salt, epoch, index))
        return self._make_item(index, rng, TextSynthesizer(rng))

    def _make_item(self, index: int, rng: random.Random,
                   synth: TextSynthesizer):
        fname, src_label = self.samples[index]
        _, trg_label = rng.choice(self.samples)

        command = synth.labels2text(np.array(src_label), np.array(trg_label))
        ids, lens = tokens_to_ids([command.split()], self.vocab, self.max_text_len)

        if Image is None:
            raise RuntimeError("Pillow not available; use the synthetic pipeline")
        img = Image.open(os.path.join(self.image_dir, fname)).convert("RGB")
        if self.mode == "train" and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        image = _center_crop_resize(img, self.crop_size, self.image_size,
                                    self.resize_backend)

        return (
            image,
            np.asarray(src_label, dtype=np.float32),
            np.asarray(trg_label, dtype=np.float32),
            ids[0],
            lens[0],
        )
