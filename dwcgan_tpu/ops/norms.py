"""Functional normalization primitives (NHWC).

TPU-first re-design of the reference's stateful norm layers
(`/root/reference/networks/networks.py:693-752`):

- AdaIN is *functional*: the style MLP computes per-(sample, channel)
  `(scale, bias)` and they are passed as arguments, replacing the reference's
  assign-params module mutation (`networks_v2.py:78-87`).
- Statistics are always computed in float32 regardless of compute dtype.
- Variance is biased (matches `F.batch_norm` inside the reference AdaIN);
  the reference's custom LayerNorm divides by (std + eps) with *unbiased*
  std — reproduced exactly in `layer_norm_ref`.

A fused Pallas kernel path for instance-norm lives in
`dwcgan_tpu.ops.pallas.norm_kernels`; these jnp versions are the reference
implementations and the CPU fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _moments_hw(x: jnp.ndarray):
    """Per-(N, C) mean/variance over spatial dims of an NHWC tensor, fp32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return mean, var


def instance_norm(x: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Instance norm, no affine (torch nn.InstanceNorm2d default).

    x: [N, H, W, C] -> normalized, same shape/dtype.
    """
    mean, var = _moments_hw(x)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


def adain(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
          eps: float = _EPS) -> jnp.ndarray:
    """Adaptive instance norm: IN(x) * scale + bias.

    scale/bias: [N, C] computed by the style MLP (reference consumed them via
    module-state assignment, networks.py:693-719).
    """
    mean, var = _moments_hw(x)
    y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + eps)
    y = y * scale.astype(jnp.float32)[:, None, None, :] \
        + bias.astype(jnp.float32)[:, None, None, :]
    return y.astype(x.dtype)


def layer_norm_ref(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   eps: float = _EPS) -> jnp.ndarray:
    """The reference's custom LayerNorm (networks.py:725-752).

    Normalizes each *sample* over all of (H, W, C) using unbiased std and
    divides by (std + eps) — not sqrt(var + eps) — then applies a per-channel
    affine.  gamma/beta: [C].
    """
    x32 = x.astype(jnp.float32)
    n = x32.shape[1] * x32.shape[2] * x32.shape[3]
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.sum(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True) / max(n - 1, 1)
    y = (x32 - mean) / (jnp.sqrt(var) + eps)
    y = y * gamma.astype(jnp.float32)[None, None, None, :] \
        + beta.astype(jnp.float32)[None, None, None, :]
    return y.astype(x.dtype)


def batch_norm_stats_free(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                          eps: float = _EPS) -> jnp.ndarray:
    """Batch norm over (N, H, W) per channel, no running stats.

    No shipped config uses 'bn' (dis norm='none', gen uses in/ln/adain); this
    stats-free variant exists for schema completeness and differs from torch
    BatchNorm at eval time (no tracked running statistics).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2), keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y * gamma[None, None, None, :] + beta[None, None, None, :]
    return y.astype(x.dtype)
