"""Spatial resizing (NHWC).

- `upsample2x`: bilinear 2x (decoder upsampling, reference networks_v2.py:154,
  torch Upsample(scale_factor=2, mode='bilinear', align_corners=False)).
- `downsample2x`: exact-half bilinear downsample == 2x2 average pooling
  (discriminator scale pyramid, reference networks.py:113 —
  F.interpolate(scale_factor=0.5, mode='bilinear') reduces to the 2x2 mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample (half-pixel centers, align_corners=False)."""
    n, h, w, c = x.shape
    y = jax.image.resize(x.astype(jnp.float32), (n, 2 * h, 2 * w, c), method="bilinear")
    return y.astype(x.dtype)


def downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool with stride 2 (== bilinear 0.5x for even sizes)."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c).astype(jnp.float32)
    y = y.mean(axis=(2, 4))
    return y.astype(x.dtype)
