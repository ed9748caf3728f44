"""Parity-space (space-to-depth) rewrites of MXU-hostile boundary convs.

The image-boundary convolutions — encoder stems consuming 3-channel images,
the discriminator's 4x4/stride-2 stems, and the decoder's 4-channel output
head — use 1-4 of the MXU's 128 lanes and profiled at 5-22 TF/s while the
interior convs run at 86-98% of peak (docs/PERF.md, tools/
profile_results.json).  PERF.md round 3 initially left them "on the table"
assuming a space-to-depth transform changes the math at the edges.  It does
not: pad FIRST (reflect or zero, exactly as `Conv2dBlock` does), THEN
space-to-depth, then ONE valid conv whose kernel is the original kernel
scattered into parity slots — float-exact up to reassociation (pinned to
~1e-15 in float64 by tests/test_parity_conv.py).

Three rewrites (`p` = logical padding, `k` = kernel size, H, W even):

- `stride2`: even-k stride-2 stem (e.g. D's 4x4/s2/p1 from 3 channels).
  Output pixels already live on the half grid: conv the s2d input
  [N,H/2,W/2,4C] with a [(k-1+s)//2+1]^2 kernel over 4C channels
  (s = p rounded up to even minus p).
- `stride1_s2d_in`: odd-k stride-1 same-size stem (e.g. the 7x7/p3 encoder
  stems).  All four output parity classes come from ONE conv over the s2d
  input producing 4*C_out channels, then depth-to-space.
- `stride1_parity_out`: odd-k stride-1 same-size conv with few OUTPUT
  channels but healthy input channels (the decoder's merged 7x7 64->4
  head).  The input stays in pixel space; the conv runs at stride 2 with a
  (k+1)^2 kernel producing 4*C_out channels, then depth-to-space.

The kernel scatter is a constant one-hot einsum (built once per (k, p) in
numpy, cached), so gradients w.r.t. the logical kernel flow through a
cheap gather and the parameter tree / checkpoint layout is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W,C] -> [N,H/2,W/2,4C], channel order (row-parity, col-parity, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `space_to_depth` for channel order (a, b, c)."""
    n, p, q, c4 = y.shape
    o = c4 // 4
    y = y.reshape(n, p, q, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * p, 2 * q, o)


def _pad2d(x, p, pad_type):
    if p == 0:
        return x
    mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[pad_type]
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)


@functools.lru_cache(maxsize=None)
def _map_stride2(k: int, pad: int):
    """One-hot M[P,Q,a,b,d,e] for the stride-2 rewrite."""
    shift = pad % 2                      # pad' = pad + shift (even)
    kp = (k - 1 + shift) // 2 + 1
    m = np.zeros((kp, kp, 2, 2, k, k), np.float32)
    for d in range(k):
        ed = d + shift
        for e in range(k):
            ee = e + shift
            m[ed // 2, ee // 2, ed % 2, ee % 2, d, e] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _map_stride1_s2d_in(k: int, pad: int):
    """One-hot M[P,Q,a,b,i,j,d,e] for the stride-1 s2d-input rewrite."""
    shift = pad % 2
    kp = (k - 1 + 1 + shift) // 2 + 1    # alpha+d+shift ranges shift..k+shift-? -> max k-1+1+shift
    m = np.zeros((kp, kp, 2, 2, 2, 2, k, k), np.float32)
    for ai in (0, 1):
        for aj in (0, 1):
            for d in range(k):
                ed = ai + d + shift
                for e in range(k):
                    ee = aj + e + shift
                    m[ed // 2, ee // 2, ed % 2, ee % 2, ai, aj, d, e] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _map_stride1_parity_out(k: int):
    """One-hot M[t,u,i,j,d,e] for the stride-1 parity-output rewrite."""
    m = np.zeros((k + 1, k + 1, 2, 2, k, k), np.float32)
    for ai in (0, 1):
        for aj in (0, 1):
            for d in range(k):
                for e in range(k):
                    m[ai + d, aj + e, ai, aj, d, e] = 1.0
    return m


def _conv_valid(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def parity_conv_stride2(x, w, pad: int, pad_type: str) -> jnp.ndarray:
    """Exact rewrite of conv(pad(x, pad), w, stride=2) for even-k kernels."""
    k = w.shape[0]
    shift = pad % 2
    g = space_to_depth(_pad2d(x, pad + shift, pad_type))
    m = jnp.asarray(_map_stride2(k, pad), w.dtype)
    kern = jnp.einsum("PQabde,deco->PQabco", m, w)
    kern = kern.reshape(kern.shape[0], kern.shape[1], 4 * w.shape[2], w.shape[3])
    return _conv_valid(g, kern, 1)


def parity_conv_stride1_s2d_in_raw(x, w, pad: int, pad_type: str) -> jnp.ndarray:
    """`parity_conv_stride1_s2d_in` WITHOUT the final depth-to-space: returns
    the parity-layout output [N, H/2, W/2, 4*C_out], channels ordered
    (row-parity, col-parity, c_out).

    This is the round-4 fusion fix (VERDICT r3 item 1): the stem rewrite's
    d2s transpose used to sit between the conv and the instance-norm chain
    XLA fuses it with, losing in-graph despite the conv winning standalone
    (docs/PERF.md).  Per-channel IN statistics over the full HxW grid are
    EXACTLY the pooled statistics over the channel's 4 parity slots
    (`ops.norms.instance_norm_parity`), so norm + activation can run in
    this layout and the d2s moves to the block edge.
    """
    k = w.shape[0]
    shift = pad % 2
    g = space_to_depth(_pad2d(x, pad + shift, pad_type))
    m = jnp.asarray(_map_stride1_s2d_in(k, pad), w.dtype)
    kern = jnp.einsum("PQabijde,deco->PQabcijo", m, w)
    kern = kern.reshape(kern.shape[0], kern.shape[1],
                        4 * w.shape[2], 4 * w.shape[3])
    return _conv_valid(g, kern, 1)


def parity_conv_stride1_s2d_in(x, w, pad: int, pad_type: str) -> jnp.ndarray:
    """Exact rewrite of conv(pad(x, pad), w, stride=1) for odd-k same-size
    convs (pad == (k-1)//2) with few INPUT channels."""
    return depth_to_space(parity_conv_stride1_s2d_in_raw(x, w, pad, pad_type))


def parity_conv_stride1_parity_out(x, w, pad: int, pad_type: str) -> jnp.ndarray:
    """Exact rewrite of conv(pad(x, pad), w, stride=1) for odd-k same-size
    convs (pad == (k-1)//2) with few OUTPUT channels."""
    k = w.shape[0]
    xp = _pad2d(x, pad, pad_type)
    m = jnp.asarray(_map_stride1_parity_out(k), w.dtype)
    kern = jnp.einsum("tuijde,deco->tucijo", m, w)
    kern = kern.reshape(k + 1, k + 1, w.shape[2], 4 * w.shape[3])
    return depth_to_space(_conv_valid(xp, kern, 2))


def parity_applicable(kernel_size: int, stride: int, pad: int,
                      in_ch: int, h: int, w: int) -> str | None:
    """Which rewrite (if any) applies to this conv site.  Returns the
    rewrite name or None.  Conditions: spatial dims even (so the parity
    grid is well-formed) and a lane-starved channel count."""
    if h % 2 or w % 2:
        return None
    if stride == 2 and kernel_size % 2 == 0 and in_ch <= 8:
        return "stride2"
    if (stride == 1 and kernel_size % 2 == 1
            and pad == (kernel_size - 1) // 2 and in_ch <= 8):
        return "stride1_s2d_in"
    return None
