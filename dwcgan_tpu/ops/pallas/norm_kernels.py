"""Fused Pallas TPU kernels for the instance-norm-heavy decoder hot path.

Per training step the generator runs 5 decode calls x 4 AdaIN resblocks x
2 convs = 40 AdaIN applications plus the content encoder's instance norms
(SURVEY §3.2).  Each is: per-(N, C) spatial moments -> normalize -> affine ->
(activation) -> (residual add).  XLA handles the convs; these kernels fuse
the whole normalization tail into one VMEM pass per sample so the feature
map is read from HBM once instead of 3-4 times.

Layout: NHWC with the (H*W, C) view put on the (sublane, lane) axes — C=256
in the flagship decoder maps cleanly onto the 128-wide lane dimension.

All kernels come with custom VJPs (the backward is itself a single fused
kernel) so they are usable inside `jax.grad`: without a VJP, training would
silently fall back to differentiating through the kernel, which Pallas does
not support.

Correctness is pinned against the jnp reference implementations in
`dwcgan_tpu.ops.norms` (tests run interpret mode on CPU).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

# Per-sample feature maps above this element count would overflow the ~16MB
# VMEM scoped stack (the kernel holds the fp32 block plus temporaries); such
# layers fall back to the jnp path, which XLA fuses adequately at that size.
VMEM_ELEM_LIMIT = 768 * 1024  # elems; ~3MB fp32 block -> comfortable headroom


def fits_vmem(shape) -> bool:
    """True when a [N, H, W, C] tensor's per-sample block fits the kernel."""
    return int(shape[1]) * int(shape[2]) * int(shape[3]) <= VMEM_ELEM_LIMIT


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# forward kernels
# --------------------------------------------------------------------------

def _in_fwd_kernel(x_ref, o_ref, mean_ref, rstd_ref):
    """One sample: [HW, C] -> instance-normalized, saving per-C stats."""
    x = x_ref[0].astype(jnp.float32)                     # [HW, C]
    hw = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / hw        # [1, C]
    xc = x - mean
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / hw
    rstd = jax.lax.rsqrt(var + _EPS)
    o_ref[0] = (xc * rstd).astype(o_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _adain_fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref,
                      *, relu: bool):
    """One sample: normalize + per-(N, C) affine (+ ReLU)."""
    x = x_ref[0].astype(jnp.float32)
    hw = x.shape[0]
    mean = jnp.sum(x, axis=0, keepdims=True) / hw
    xc = x - mean
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / hw
    rstd = jax.lax.rsqrt(var + _EPS)
    y = xc * rstd * scale_ref[0] + bias_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _per_sample_call(kernel, x2, extra_inputs, extra_specs, out_dtype):
    """Grid over N; each program sees one sample's [HW, C] block in VMEM."""
    n, hw, c = x2.shape
    block = lambda: pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    stat = lambda: pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[block()] + list(extra_specs),
        out_specs=(block(), stat(), stat()),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), out_dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(x2, *extra_inputs)


# --------------------------------------------------------------------------
# instance norm (no affine)
# --------------------------------------------------------------------------

@jax.custom_vjp
def instance_norm_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Fused instance norm over NHWC (matches ops.norms.instance_norm)."""
    y, _, _ = _in_fwd(x)
    return y


def _in_fwd(x):
    n, h, w, c = x.shape
    x2 = x.reshape(n, h * w, c)
    y2, mean, rstd = _per_sample_call(_in_fwd_kernel, x2, (), (), x.dtype)
    return y2.reshape(x.shape), mean, rstd


def _in_fwd_rule(x):
    y, mean, rstd = _in_fwd(x)
    return y, (x, mean, rstd)


def _in_bwd_kernel(x_ref, mean_ref, rstd_ref, g_ref, dx_ref):
    """d/dx of instance norm: rstd * (g - mean(g) - xhat * mean(g*xhat))."""
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    hw = x.shape[0]
    xhat = (x - mean_ref[0]) * rstd_ref[0]
    g_mean = jnp.sum(g, axis=0, keepdims=True) / hw
    gx_mean = jnp.sum(g * xhat, axis=0, keepdims=True) / hw
    dx_ref[0] = (rstd_ref[0] * (g - g_mean - xhat * gx_mean)).astype(dx_ref.dtype)


def _in_bwd_rule(res, g):
    x, mean, rstd = res
    n, h, w, c = x.shape
    hw = h * w
    block = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        _in_bwd_kernel,
        grid=(n,),
        in_specs=[block, stat, stat, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=_use_interpret(),
    )(x.reshape(n, hw, c), mean, rstd, g.reshape(n, hw, c))
    return (dx.reshape(x.shape),)


instance_norm_pallas.defvjp(_in_fwd_rule, _in_bwd_rule)


# --------------------------------------------------------------------------
# AdaIN (+ optional fused ReLU)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adain_pallas(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                 relu: bool = False) -> jnp.ndarray:
    """Fused AdaIN: IN(x) * scale + bias (+ ReLU).  scale/bias: [N, C]."""
    y, _, _, _ = _adain_fwd(x, scale, bias, relu)
    return y


def _adain_fwd(x, scale, bias, relu):
    n, h, w, c = x.shape
    x2 = x.reshape(n, h * w, c)
    s3 = scale.astype(jnp.float32).reshape(n, 1, c)
    b3 = bias.astype(jnp.float32).reshape(n, 1, c)
    stat_spec = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    y2, mean, rstd = _per_sample_call(
        functools.partial(_adain_fwd_kernel, relu=relu),
        x2, (s3, b3), (stat_spec, stat_spec), x.dtype)
    return y2.reshape(x.shape), mean, rstd, (x, scale, bias)


def _adain_fwd_rule(x, scale, bias, relu):
    y, mean, rstd, _ = _adain_fwd(x, scale, bias, relu)
    return y, (x, scale, bias, mean, rstd, y)


def _adain_bwd_kernel(x_ref, mean_ref, rstd_ref, scale_ref, y_ref, g_ref,
                      dx_ref, dscale_ref, dbias_ref, *, relu: bool):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    if relu:
        g = jnp.where(y_ref[0].astype(jnp.float32) > 0.0, g, 0.0)
    hw = x.shape[0]
    xhat = (x - mean_ref[0]) * rstd_ref[0]
    dbias_ref[0] = jnp.sum(g, axis=0, keepdims=True)
    dscale_ref[0] = jnp.sum(g * xhat, axis=0, keepdims=True)
    gs = g * scale_ref[0]
    gs_mean = jnp.sum(gs, axis=0, keepdims=True) / hw
    gsx_mean = jnp.sum(gs * xhat, axis=0, keepdims=True) / hw
    dx_ref[0] = (rstd_ref[0] * (gs - gs_mean - xhat * gsx_mean)).astype(dx_ref.dtype)


def _adain_bwd_rule(relu, res, g):
    x, scale, bias, mean, rstd, y = res
    n, h, w, c = x.shape
    hw = h * w
    block = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_adain_bwd_kernel, relu=relu),
        grid=(n,),
        in_specs=[block, stat, stat, stat, block, block],
        out_specs=(block, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(x.reshape(n, hw, c),
      mean, rstd, scale.astype(jnp.float32).reshape(n, 1, c),
      y.reshape(n, hw, c), g.reshape(n, hw, c))
    return (dx.reshape(x.shape),
            dscale.reshape(n, c).astype(scale.dtype),
            dbias.reshape(n, c).astype(bias.dtype))


adain_pallas.defvjp(_adain_fwd_rule, _adain_bwd_rule)


def adain_residual_pallas(x: jnp.ndarray, y: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray) -> jnp.ndarray:
    """Resblock tail: x + AdaIN(y) — the add stays an XLA fusion; the AdaIN
    is the Pallas kernel (second conv of each AdaIN resblock, no activation)."""
    return x + adain_pallas(y, scale, bias, False)


# --------------------------------------------------------------------------
# reference LayerNorm (per-sample stats over HWC, unbiased std, /(std+eps))
# --------------------------------------------------------------------------

def _ln_fwd_kernel(x_ref, gamma_ref, beta_ref, o_ref, mean_ref, denom_ref):
    x = x_ref[0].astype(jnp.float32)             # [HW, C]
    n = x.shape[0] * x.shape[1]
    mean = jnp.sum(x) / n
    u = x - mean
    var = jnp.sum(u * u) / max(n - 1, 1)         # unbiased (torch .std())
    denom = jnp.sqrt(var) + _EPS                 # std + eps, NOT sqrt(var+eps)
    y = u / denom * gamma_ref[0] + beta_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)
    # Mosaic cannot store scalars to VMEM and (1,1) blocks violate tiling;
    # per-sample stats are broadcast into an (8,128)-tile instead
    mean_ref[0] = jnp.full((8, 128), mean, jnp.float32)
    denom_ref[0] = jnp.full((8, 128), denom, jnp.float32)


def _ln_bwd_kernel(x_ref, gamma_ref, mean_ref, denom_ref, g_ref,
                   dx_ref, dgamma_ref, dbeta_ref):
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    n = x.shape[0] * x.shape[1]
    mean = mean_ref[0, 0, 0]
    d = denom_ref[0, 0, 0]
    s = d - _EPS                                  # std
    u = x - mean
    dbeta_ref[0] = jnp.sum(g, axis=0, keepdims=True)
    dgamma_ref[0] = jnp.sum(g * u, axis=0, keepdims=True) / d
    gh = g * gamma_ref[0]
    dot = jnp.sum(gh * u)
    du = gh / d - u * (dot / (max(n - 1, 1) * s * d * d))
    dx_ref[0] = (du - jnp.sum(du) / n).astype(dx_ref.dtype)


@jax.custom_vjp
def layer_norm_ref_pallas(x: jnp.ndarray, gamma: jnp.ndarray,
                          beta: jnp.ndarray) -> jnp.ndarray:
    """Fused reference LayerNorm (matches ops.norms.layer_norm_ref)."""
    y, _, _ = _ln_fwd(x, gamma, beta)
    return y


def _ln_fwd(x, gamma, beta):
    n, h, w, c = x.shape
    hw = h * w
    block = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    y, mean, denom = pl.pallas_call(
        _ln_fwd_kernel,
        grid=(n,),
        in_specs=[block, chan, chan],
        out_specs=(block, scal, scal),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(x.reshape(n, hw, c),
      gamma.astype(jnp.float32).reshape(1, c),
      beta.astype(jnp.float32).reshape(1, c))
    return y.reshape(x.shape), mean, denom


def _ln_fwd_rule(x, gamma, beta):
    y, mean, denom = _ln_fwd(x, gamma, beta)
    return y, (x, gamma, beta, mean, denom)


def _ln_bwd_rule(res, g):
    x, gamma, beta, mean, denom = res
    n, h, w, c = x.shape
    hw = h * w
    block = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pchan = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dx, dgamma, dbeta = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(n,),
        in_specs=[block, chan, scal, scal, block],
        out_specs=(block, pchan, pchan),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(x.reshape(n, hw, c),
      gamma.astype(jnp.float32).reshape(1, c),
      mean, denom, g.reshape(n, hw, c))
    return (dx.reshape(x.shape),
            dgamma.sum(axis=(0, 1)).astype(gamma.dtype),
            dbeta.sum(axis=(0, 1)).astype(beta.dtype))


layer_norm_ref_pallas.defvjp(_ln_fwd_rule, _ln_bwd_rule)
