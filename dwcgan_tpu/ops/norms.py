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

# How instance/adain statistics are computed (VERDICT r3 item 4 — attack the
# norm-chain HBM traffic with fewer bytes, not faster per-byte ops):
#
# - "2pass" (default, reference-exact): mean, then E[(x-mean)^2].  The
#   variance reduction depends on the mean, so XLA reads the activation
#   once for the mean, again for the variance, and again to normalize —
#   3 reads + 1 write per norm site.
# - "1pass": var = E[x^2] - mean^2, both moments accumulated in fp32 in ONE
#   fused reduction pass — 2 reads + 1 write per norm site (~-25% bytes on
#   a chain that measures at HBM speed of light).  Numerics: fp32
#   accumulation; cancellation error is ~2^-24 * mean^2, negligible against
#   the eps=1e-5 floor unless |mean| >> std by ~1e3 (not the case for
#   IN-normalized GAN activations; A/B'd in docs/PERF.md).
#
# Set once at build time via `set_stats_mode` (cfg.norm_stats); it is read
# at TRACE time, so it must be set before the jit of the step that should
# use it.
_STATS_MODE = "2pass"


def set_stats_mode(mode: str) -> None:
    global _STATS_MODE
    assert mode in ("2pass", "1pass"), mode
    _STATS_MODE = mode


def get_stats_mode() -> str:
    return _STATS_MODE


# How the normalize ARITHMETIC runs (VERDICT r4 item 3b).  Statistics are
# always accumulated in fp32 (see above); this flag only controls the
# elementwise (x - mean) * rstd [* scale + bias] chain:
#
# - "fp32" (default, reference parity): upcast x, normalize in fp32, cast
#   the result back to compute dtype.
# - "bf16": cast the per-(N,C) scalars down once and run the chain in the
#   activation dtype.  The hypothesis under test is that the fp32
#   intermediates inside XLA's norm fusions cost VPU width / VMEM locality;
#   the activations' HBM bytes are bf16 either way, so any win (or loss)
#   is measured, not assumed — A/B in docs/PERF.md.
_COMPUTE_MODE = "fp32"


def set_compute_mode(mode: str) -> None:
    global _COMPUTE_MODE
    assert mode in ("fp32", "bf16"), mode
    _COMPUTE_MODE = mode


def get_compute_mode() -> str:
    return _COMPUTE_MODE


def _low_precision(x) -> bool:
    return _COMPUTE_MODE == "bf16" and x.dtype != jnp.float32


def _moments_hw(x: jnp.ndarray):
    """Per-(N, C) mean/variance over spatial dims of an NHWC tensor, fp32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    if _STATS_MODE == "1pass":
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return mean, var


def instance_norm(x: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Instance norm, no affine (torch nn.InstanceNorm2d default).

    x: [N, H, W, C] -> normalized, same shape/dtype.
    """
    mean, var = _moments_hw(x)
    rstd = jax.lax.rsqrt(var + eps)
    if _low_precision(x):
        return (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
    y = (x.astype(jnp.float32) - mean) * rstd
    return y.astype(x.dtype)


def instance_norm_parity(y: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """Instance norm of a depth-to-space-pending parity tensor.

    y: [N, P, Q, 4*C] as produced by
    `ops.parity_conv.parity_conv_stride1_s2d_in_raw` — full-res channel c is
    distributed over the 4 parity slots {c, C+c, 2C+c, 3C+c}, whose union of
    P x Q positions is exactly the full H x W grid.  Pooling the moments over
    (P, Q, slot) therefore equals `instance_norm` on the depth-to-space'd
    tensor, up to reassociation; normalizing in this layout keeps the conv ->
    norm -> activation chain in one layout so XLA can fuse across it
    (VERDICT r3 item 1).
    """
    n, p, q, c4 = y.shape
    c = c4 // 4
    y32 = y.astype(jnp.float32).reshape(n, p, q, 4, c)
    mean = jnp.mean(y32, axis=(1, 2, 3), keepdims=True)
    if _STATS_MODE == "1pass":
        m2 = jnp.mean(jnp.square(y32), axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(y32 - mean), axis=(1, 2, 3), keepdims=True)
    out = (y32 - mean) * jax.lax.rsqrt(var + eps)
    return out.reshape(n, p, q, c4).astype(y.dtype)


def adain(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
          eps: float = _EPS) -> jnp.ndarray:
    """Adaptive instance norm: IN(x) * scale + bias.

    scale/bias: [N, C] computed by the style MLP (reference consumed them via
    module-state assignment, networks.py:693-719).
    """
    mean, var = _moments_hw(x)
    if _low_precision(x):
        rstd = jax.lax.rsqrt(var + eps)
        y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
        return y * scale.astype(x.dtype)[:, None, None, :] \
            + bias.astype(x.dtype)[:, None, None, :]
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
    if _STATS_MODE == "1pass":
        s2 = jnp.sum(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(s2 - n * jnp.square(mean), 0.0) / max(n - 1, 1)
    else:
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
