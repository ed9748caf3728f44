"""InceptionV3 (torchvision-compatible) in flax, for in-repo FID/IS.

The reference delegates FID/IS to an external repo (README.md:48-50) and its
own `load_inception` is broken dead code (utils.py:196-205).  This module
makes the metric self-contained: a faithful InceptionV3 trunk producing the
2048-d pool3 features (FID) and 1000-way logits (IS).

Weights: convert a torchvision `inception_v3` state_dict offline with
`dwcgan_tpu.cli.convert_inception` (no egress in this image).  Random-init
variables are available for tests — FID computed with ANY fixed feature
extractor is still a valid relative metric, but scores are only comparable
to published numbers with the real weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv2d(nn.Module):
    """conv(no bias) + frozen BatchNorm(eps=1e-3) + relu."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel, strides=(self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=False, name="conv")(x)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (self.features,), jnp.float32)
        gamma = self.param("bn_gamma", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bn_beta", nn.initializers.zeros, (self.features,), jnp.float32)
        x = (x - mean) / jnp.sqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _pad_same(k):
    return (k - 1) // 2


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        # torchvision's F.avg_pool2d(padding=1) counts padded zeros
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        # torchvision's F.avg_pool2d(padding=1) counts padded zeros
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        # torchvision's F.avg_pool2d(padding=1) counts padded zeros
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 features [N, 2048], logits [N, num_classes])."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [N, 2048]
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


def preprocess_for_inception(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[-1,1] NHWC RGB -> bilinear-resized to 299 (input already in the
    inception input range)."""
    n, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images.astype(jnp.float32),
                                  (n, size, size, c), method="bilinear")
    return images.astype(jnp.float32)


def init_random_inception(seed: int = 0, num_classes: int = 1000):
    """Random-weight variables whose features are actually usable.

    Flax's default lecun-normal init preserves variance through the linear
    part of each conv but loses ~half of it at every ReLU; through this
    trunk's ~40 sequential conv+relu layers the signal decays to ~1e-4 and
    FID degenerates to 0 for ANY pair of image sets.  Rescaling every conv
    kernel by sqrt(2) (He init) keeps activations O(1), giving random
    features that genuinely discriminate distributions (random-feature FID).
    """
    model = InceptionV3(num_classes=num_classes)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)

    def rescale(path, p):
        names = [getattr(k, "key", str(k)) for k in path]
        if "conv" in names and names[-1] == "kernel":
            return p * jnp.sqrt(2.0)
        return p

    params = jax.tree_util.tree_map_with_path(rescale, variables["params"])
    return {"params": params}
