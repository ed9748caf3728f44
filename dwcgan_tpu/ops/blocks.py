"""Flax building blocks (NHWC, fp32 params, configurable compute dtype).

TPU-native equivalents of the reference's nn.Module blocks
(`/root/reference/networks/networks.py:480-634`): Conv2dBlock, LinearBlock,
ResBlock(s), MLP, plus spectral-norm wrappers.  Differences by design:

- NHWC layout (TPU-preferred) instead of NCHW.
- AdaIN residual blocks take the style-derived (bias, scale) tensor as an
  *argument* (`AdaINResBlocks`), replacing module-state mutation.
- Norm statistics are computed in float32 even under bfloat16 compute.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from dwcgan_tpu.ops.norms import (adain, batch_norm_stats_free, instance_norm,
                                  instance_norm_parity, layer_norm_ref)

Dtype = jnp.dtype

# LeakyReLU slopes differ between conv and linear blocks in the reference
# (networks.py:559 vs :614).
CONV_LRELU_SLOPE = 0.1
LINEAR_LRELU_SLOPE = 0.2


def make_initializer(init_type: str) -> Callable:
    """Weight initializers matching the reference's `weights_init`
    (utils.py:234-254): gaussian(0, 0.02) / xavier(gain √2) / kaiming fan_in /
    orthogonal(gain √2) / framework default."""
    if init_type == "gaussian":
        return nn.initializers.normal(stddev=0.02)
    if init_type == "xavier":
        return nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=math.sqrt(2.0))
    if init_type == "default":
        return nn.initializers.lecun_normal()
    raise ValueError(f"unsupported init: {init_type}")


class PReLU(nn.Module):
    """Parametric ReLU with a single shared learnable slope (torch default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", lambda *_: jnp.asarray(self.init_slope, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def activation(name: str, *, linear_block: bool = False) -> Callable:
    """Stateless activations; 'prelu' must use the PReLU module instead."""
    slope = LINEAR_LRELU_SLOPE if linear_block else CONV_LRELU_SLOPE
    table = {
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, slope),
        "selu": jax.nn.selu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "none": lambda x: x,
    }
    if name not in table:
        raise ValueError(f"unsupported activation: {name}")
    return table[name]


def pad2d(x: jnp.ndarray, padding: int, pad_type: str) -> jnp.ndarray:
    """Spatial padding of an NHWC tensor (reflect / replicate / zero)."""
    if padding == 0:
        return x
    widths = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[pad_type]
    return jnp.pad(x, widths, mode=mode)


def _spectral_normalize(w: jnp.ndarray, n_iter: int = 30) -> jnp.ndarray:
    """Stateless power-iteration spectral normalization.

    The reference persists u across forwards and runs ONE iteration per call
    (networks.py:758-816) — mutable module state.  The TPU-first form is
    functional: restart from a fixed vector and run `n_iter` iterations each
    call, so the op is jit-pure and threads through the fused train step
    with no mutable collections.

    Accuracy (measured in tests/test_losses.py): 30 iterations estimate
    sigma within ~1.6% even on the worst case — large random Gaussian
    kernels, whose Marchenko-Pastur spectrum is nearly flat; trained kernels
    develop a spectral gap and converge much faster.  Cost is 2 matvecs per
    iteration, negligible next to the convolution itself.
    """
    out_dim = w.shape[-1]
    w_mat = w.reshape(-1, out_dim).astype(jnp.float32)  # [fan_in, out]
    u = jax.random.normal(jax.random.PRNGKey(0), (out_dim,), jnp.float32)
    u = u / (jnp.linalg.norm(u) + 1e-12)
    for _ in range(n_iter):
        v = w_mat @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w_mat.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = v @ (w_mat @ u)
    return (w / sigma).astype(w.dtype)


class _ConvKB(nn.Module):
    """Declares `kernel`/`bias` at the same tree path and shapes as an
    nn.Conv child, without running the convolution — so rewritten conv
    paths (parity-space stems, fused heads) keep the checkpoint and
    torch-import layout byte-identical."""

    features: int
    kernel_size: int
    in_features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.kernel_size, self.kernel_size,
                        self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class Conv2dBlock(nn.Module):
    """pad -> conv -> norm -> activation (networks.py:524-585)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: str = "none"          # none | bn | in | ln | adain | sn
    activ: str = "relu"
    pad_type: str = "zero"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False    # fused Pallas instance-norm path (TPU)
    parity: bool = False        # parity-space rewrite of lane-starved stems
    stem_pallas: bool = False   # fused Pallas 7x7 stem kernel (TPU)

    @nn.compact
    def __call__(self, x, adain_scale=None, adain_bias=None):
        if self.stem_pallas:
            from dwcgan_tpu.ops.pallas.stem_kernels import (
                stem_applicable, stem_conv7, stem_fits_vmem)
            if stem_applicable(self.kernel_size, self.stride, self.padding,
                               x.shape[-1], self.norm, self.activ) \
                    and stem_fits_vmem(x.shape, self.features):
                kern, bias = _ConvKB(self.features, self.kernel_size,
                                     x.shape[-1], self.kernel_init,
                                     name="Conv_0")()
                # whole pad+conv+IN+act chain inside the kernel; parameter
                # tree unchanged (same Conv_0 kernel/bias as nn.Conv)
                return stem_conv7(x.astype(self.dtype),
                                  kern.astype(self.dtype), bias,
                                  self.norm, self.activ, self.pad_type)
        rewrite = None
        if self.parity and self.norm != "sn":
            from dwcgan_tpu.ops.parity_conv import parity_applicable
            rewrite = parity_applicable(self.kernel_size, self.stride,
                                        self.padding, x.shape[-1],
                                        x.shape[1], x.shape[2])
        if rewrite is not None:
            from dwcgan_tpu.ops.parity_conv import (
                parity_conv_stride1_s2d_in_raw, parity_conv_stride2,
                depth_to_space)
            kern, bias = _ConvKB(self.features, self.kernel_size, x.shape[-1],
                                 self.kernel_init, name="Conv_0")()
            if rewrite == "stride2":
                x = parity_conv_stride2(
                    x.astype(self.dtype), kern.astype(self.dtype),
                    self.padding, self.pad_type) + bias.astype(self.dtype)
            else:
                raw = parity_conv_stride1_s2d_in_raw(
                    x.astype(self.dtype), kern.astype(self.dtype),
                    self.padding, self.pad_type)
                raw = raw + jnp.tile(bias.astype(self.dtype), 4)
                # keep the parity layout THROUGH the norm + activation so the
                # d2s transpose moves to the block edge instead of breaking
                # the conv->norm fusion (VERDICT r3 item 1; per-channel IN
                # stats pool exactly over the 4 parity slots)
                if self.norm in ("in", "none") and self.activ != "prelu" \
                        and not self.use_pallas:
                    if self.norm == "in":
                        raw = instance_norm_parity(raw)
                    return depth_to_space(activation(self.activ)(raw))
                x = depth_to_space(raw)
        elif self.norm == "sn":
            x = pad2d(x, self.padding, self.pad_type)
            # spectral norm wraps the kernel; run conv manually with the
            # normalized weights
            w = self.param("sn_kernel", self.kernel_init,
                           (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
                           jnp.float32)
            b = self.param("sn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
            w = _spectral_normalize(w)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype),
                window_strides=(self.stride, self.stride), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(self.dtype)
        else:
            x = pad2d(x, self.padding, self.pad_type)
            x = nn.Conv(
                self.features, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding="VALID", use_bias=True,
                dtype=self.dtype, param_dtype=jnp.float32, kernel_init=self.kernel_init,
            )(x)

        if self.norm == "in":
            from dwcgan_tpu.ops.pallas.norm_kernels import fits_vmem, instance_norm_pallas
            if self.use_pallas and fits_vmem(x.shape):
                x = instance_norm_pallas(x)
            else:
                x = instance_norm(x)
        elif self.norm == "ln":
            gamma = self.param("ln_gamma", nn.initializers.uniform(scale=1.0),
                               (self.features,), jnp.float32)
            beta = self.param("ln_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            from dwcgan_tpu.ops.pallas.norm_kernels import fits_vmem, layer_norm_ref_pallas
            if self.use_pallas and fits_vmem(x.shape):
                x = layer_norm_ref_pallas(x, gamma, beta)
            else:
                x = layer_norm_ref(x, gamma, beta)
        elif self.norm == "bn":
            gamma = self.param("bn_gamma", nn.initializers.ones, (self.features,), jnp.float32)
            beta = self.param("bn_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            x = batch_norm_stats_free(x, gamma, beta)
        elif self.norm == "adain":
            assert adain_scale is not None and adain_bias is not None, \
                "adain norm requires style-derived scale/bias"
            x = adain(x, adain_scale, adain_bias)
        elif self.norm not in ("none", "sn"):
            raise ValueError(f"Unsupported normalization: {self.norm}")

        if self.activ == "prelu":
            return PReLU()(x)
        return activation(self.activ)(x)


class LinearBlock(nn.Module):
    """fc -> norm -> activation (networks.py:587-634)."""

    features: int
    norm: str = "none"
    activ: str = "relu"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

    @nn.compact
    def __call__(self, x):
        if self.norm == "sn":
            w = self.param("sn_kernel", self.kernel_init,
                           (x.shape[-1], self.features), jnp.float32)
            b = self.param("sn_bias", nn.initializers.zeros, (self.features,), jnp.float32)
            w = _spectral_normalize(w)
            x = x.astype(self.dtype) @ w.astype(self.dtype) + b.astype(self.dtype)
        else:
            x = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, kernel_init=self.kernel_init)(x)
        if self.norm == "ln":
            gamma = self.param("ln_gamma", nn.initializers.uniform(scale=1.0),
                               (self.features,), jnp.float32)
            beta = self.param("ln_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=-1, keepdims=True)
            n = x32.shape[-1]
            var = jnp.square(x32 - mean).sum(-1, keepdims=True) / max(n - 1, 1)
            x = ((x32 - mean) / (jnp.sqrt(var) + 1e-5) * gamma + beta).astype(x.dtype)
        elif self.norm == "bn":
            # stats-free 1-D batch norm (reference uses BatchNorm1d; running
            # stats not tracked — documented divergence, unused by configs)
            gamma = self.param("bn_gamma", nn.initializers.ones, (self.features,), jnp.float32)
            beta = self.param("bn_beta", nn.initializers.zeros, (self.features,), jnp.float32)
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=0, keepdims=True)
            var = jnp.square(x32 - mean).mean(axis=0, keepdims=True)
            x = ((x32 - mean) / jnp.sqrt(var + 1e-5) * gamma + beta).astype(x.dtype)
        elif self.norm == "in":
            # reference's InstanceNorm1d on [N, F] input is itself invalid
            # torch usage; reject loudly rather than silently diverge
            raise NotImplementedError(
                "LinearBlock norm='in' (InstanceNorm1d on 2-D input) is "
                "ill-defined in the reference; use bn/ln/none")
        elif self.norm not in ("none", "sn"):
            raise ValueError(f"Unsupported normalization: {self.norm}")
        if self.activ == "prelu":
            return PReLU()(x)
        return activation(self.activ, linear_block=True)(x)


class ResBlock(nn.Module):
    """conv3x3(norm, act) -> conv3x3(norm, none) + skip (networks.py:509-522)."""

    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv2dBlock(self.dim, 3, 1, 1, norm=self.norm, activ=self.activ,
                        pad_type=self.pad_type, dtype=self.dtype,
                        kernel_init=self.kernel_init, use_pallas=self.use_pallas)(x)
        y = Conv2dBlock(self.dim, 3, 1, 1, norm=self.norm, activ="none",
                        pad_type=self.pad_type, dtype=self.dtype,
                        kernel_init=self.kernel_init, use_pallas=self.use_pallas)(y)
        return x + y


class ResBlocks(nn.Module):
    """Stack of ResBlock (networks.py:480-489)."""

    num_blocks: int
    dim: int
    norm: str = "in"
    activ: str = "relu"
    pad_type: str = "zero"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_blocks):
            x = ResBlock(self.dim, self.norm, self.activ, self.pad_type,
                         self.dtype, self.kernel_init, self.use_pallas)(x)
        return x


class AdaINResBlocks(nn.Module):
    """AdaIN residual stack with style parameters passed functionally.

    `style_params` has shape [N, num_blocks, 2, 2, dim]: per block, per conv,
    (bias, scale) — the consumption order matches the reference's sequential
    assign over `model.modules()` (networks_v2.py:78-87), where the MLP output
    is split as [bias(=mean), scale(=std)] per AdaIN layer.
    """

    num_blocks: int
    dim: int
    activ: str = "relu"
    pad_type: str = "zero"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, style_params):
        assert style_params.shape[1:] == (self.num_blocks, 2, 2, self.dim), \
            f"bad style_params shape {style_params.shape}"
        from dwcgan_tpu.ops.pallas.norm_kernels import (
            adain_pallas, adain_residual_pallas, fits_vmem)
        if self.use_pallas and fits_vmem(x.shape):
            fuse_relu = self.activ == "relu"
            act = activation(self.activ) if not fuse_relu else None
            for b in range(self.num_blocks):
                # raw convs; the AdaIN(+ReLU) tail is the fused kernel
                y = Conv2dBlock(self.dim, 3, 1, 1, norm="none", activ="none",
                                pad_type=self.pad_type, dtype=self.dtype,
                                kernel_init=self.kernel_init)(x)
                y = adain_pallas(y, style_params[:, b, 0, 1],
                                 style_params[:, b, 0, 0], fuse_relu)
                if act is not None:
                    y = act(y)
                y = Conv2dBlock(self.dim, 3, 1, 1, norm="none", activ="none",
                                pad_type=self.pad_type, dtype=self.dtype,
                                kernel_init=self.kernel_init)(y)
                x = adain_residual_pallas(x, y, style_params[:, b, 1, 1],
                                          style_params[:, b, 1, 0])
            return x
        for b in range(self.num_blocks):
            y = Conv2dBlock(self.dim, 3, 1, 1, norm="adain", activ=self.activ,
                            pad_type=self.pad_type, dtype=self.dtype,
                            kernel_init=self.kernel_init)(
                x, adain_scale=style_params[:, b, 0, 1],
                adain_bias=style_params[:, b, 0, 0])
            y = Conv2dBlock(self.dim, 3, 1, 1, norm="adain", activ="none",
                            pad_type=self.pad_type, dtype=self.dtype,
                            kernel_init=self.kernel_init)(
                y, adain_scale=style_params[:, b, 1, 1],
                adain_bias=style_params[:, b, 1, 0])
            x = x + y
        return x


class MLP(nn.Module):
    """LinearBlock stack; final layer has no norm/activation (networks.py:491-503)."""

    out_dim: int
    dim: int
    n_blk: int
    norm: str = "none"
    activ: str = "relu"
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = LinearBlock(self.dim, self.norm, self.activ, self.dtype,
                        self.kernel_init)(x)
        for _ in range(self.n_blk - 2):
            x = LinearBlock(self.dim, self.norm, self.activ, self.dtype,
                            self.kernel_init)(x)
        return LinearBlock(self.out_dim, "none", "none", self.dtype,
                           self.kernel_init)(x)
