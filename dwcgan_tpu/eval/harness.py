"""FID/IS evaluation harness over the reference protocol lists.

Protocol (SURVEY §2 C22, reference `valid/FID-IS/`):
- `trg_celeba-1e4.lst`: 10k real CelebA image names (the FID reference set)
- `src2trg_celeba-1e4-overall.lst`: 10k lines "image<TAB>command" — each
  source image is translated by its command to produce the fake set

The reference computes metrics in an external repo; here generation +
feature extraction + statistics are one in-repo pipeline, batched on device.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.eval.inception import InceptionV3, preprocess_for_inception
from dwcgan_tpu.eval.metrics import feature_stats, fid_from_stats, inception_score


def read_list(path: str) -> List[str]:
    with open(path, "r") as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


def read_src2trg(path: str) -> List[Tuple[str, str]]:
    """Lines of 'image<TAB>command' -> [(image, command)]."""
    out = []
    for ln in read_list(path):
        name, _, cmd = ln.partition("\t")
        out.append((name, cmd))
    return out


class FeatureExtractor:
    """Batched InceptionV3 pool3 features + logits on device."""

    def __init__(self, variables, batch_size: int = 64):
        self.model = InceptionV3()
        self.variables = variables
        self.batch_size = batch_size
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def run(self, images: Iterable[np.ndarray]):
        """images: iterable of [B, H, W, 3] in [-1, 1] -> (features, logits)."""
        feats, logits = [], []
        for batch in images:
            x = preprocess_for_inception(jnp.asarray(batch, jnp.float32))
            f, l = self._apply(self.variables, x)
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
        return np.concatenate(feats), np.concatenate(logits)


def compute_fid_is(real_batches: Iterable[np.ndarray],
                   fake_batches: Iterable[np.ndarray],
                   inception_variables) -> dict:
    """FID(real, fake) + IS(fake) with one extractor."""
    ex = FeatureExtractor(inception_variables)
    real_f, _ = ex.run(real_batches)
    fake_f, fake_logits = ex.run(fake_batches)
    mu_r, s_r = feature_stats(real_f)
    mu_f, s_f = feature_stats(fake_f)
    is_mean, is_std = inception_score(fake_logits)
    return {
        "fid": fid_from_stats(mu_r, s_r, mu_f, s_f),
        "is_mean": is_mean,
        "is_std": is_std,
        "n_real": len(real_f),
        "n_fake": len(fake_f),
    }


def generate_fakes(infer_fn: Callable, params, dataset_dir: str,
                   pairs: List[Tuple[str, str]], vocab, image_size: int = 128,
                   crop_size: int = 178, batch_size: int = 32,
                   max_text_len: int = 80):
    """Yield batches of translated images following the src2trg list."""
    from dwcgan_tpu.data.celeba import _center_crop_resize
    from dwcgan_tpu.text.vocab import encode_commands
    from PIL import Image

    for i in range(0, len(pairs), batch_size):
        chunk = pairs[i : i + batch_size]
        imgs = []
        for name, _ in chunk:
            img = Image.open(os.path.join(dataset_dir, name)).convert("RGB")
            imgs.append(_center_crop_resize(img, crop_size, image_size))
        ids, lens = encode_commands([c for _, c in chunk], vocab, max_text_len)
        fake = infer_fn(params, jnp.asarray(np.stack(imgs)),
                        jnp.asarray(ids), jnp.asarray(lens))
        yield np.asarray(fake)
