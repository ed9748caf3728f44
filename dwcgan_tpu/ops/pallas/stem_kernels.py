"""Fused Pallas TPU kernel for the MXU-starved 7x7 encoder stems.

The encoder stems (reference `networks.py:434`, `networks_v2.py:108`) are
7x7 stride-1 convolutions from a 3-channel image: reflect-pad 3, conv to
`dim` channels, instance norm, ReLU.  In XLA they run at 10-22 TF/s (3 of
128 MXU input lanes used; tools/profile_results.json), and the round-3/4
parity-space rewrites — though 19% faster standalone — LOSE in-graph to the
s2d/d2s layout round-trips XLA schedules around them (docs/PERF.md).

This kernel is the round-5 form of that lever (VERDICT r4 item 3a): one
Pallas program per image does the whole pad -> conv -> IN -> ReLU chain in
VMEM, with no XLA-visible layout round-trip:

- input arrives PLANAR ([N, 3, H+6, W+6]): (rows, cols) land on the
  (sublane, lane) axes, so the 49 kernel-tap slices are static sublane/lane
  offsets — cheap vector rotates, not relayouts.
- the 49 taps x 3 channels stack into a patch tensor P [147, H, W] (the
  leading dim is untiled, so the (49, 3) -> 147 merge is free), and ONE
  `dot_general` contracts W2 [147, C] against it: K = 147 on the MXU
  reduction dim instead of K = 3.
- instance-norm statistics (fp32, 1pass — matching the shipped
  `norm_stats: 1pass` default) and the activation run on the conv result
  while it is still VMEM-resident.

The bias rides as a ones-row appended to the patch tensor (K = 148), so
no lane->sublane broadcast reshapes exist anywhere (Mosaic rejects them).
The custom VJP saves only the padded input and flat weights: the backward
kernel recomputes the conv and its statistics once (FLOPs are this conv's
cheap currency; VMEM is the scarce one), then computes dW/db with per-tap
contractions (the ones-tap row IS db) and dX with per-tap dot_generals +
rotate-accumulates — never materializing the [148, H, W] tensor the
forward uses, which keeps the backward under the VMEM roof at the
flagship 128px/64ch shape.

Correctness is pinned against the jnp reference path by
tests/test_stem_kernels.py in interpret mode (CPU) — float32 agreement at
~1e-6, values and gradients.

STATUS (round 5): the Mosaic TPU compiler shipped in this environment
cannot lower this kernel — or any reformulation of it — to hardware.
`tools/stem_bisect_r5.py` (log: tools/stem_bisect_r5.log) isolates the
three blockers: (1) every matmul-shaped view of the patch tensor needs a
sublane->lane merge (`tpu.reshape vector<148x32x32> -> vector<148x1024>`:
"infer-vector-layout: unsupported shape cast"); (2) the VJP's per-tap
contractions need 2 contracting dims ("tpu.matmul: lhs contracting dims
must be of size 1"); (3) dX accumulation needs scatter-add (unimplemented
primitive). The kernel stays in-tree, interpret-mode-tested and gated
behind `cfg.stem_pallas` (default off) + `stem_applicable`/`stem_fits_vmem`,
as the evidence trail and for future Mosaic versions; the full closure
argument is in docs/PERF.md "Round-5 stem lever".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
K = 7  # kernel size; pad = 3 (the only stride-1 stem shape in the family)
PAD = 3


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def stem_applicable(kernel_size: int, stride: int, padding: int,
                    in_ch: int, norm: str, activ: str) -> bool:
    return (kernel_size == K and stride == 1 and padding == PAD
            and in_ch == 3 and norm in ("in", "none")
            and activ in ("relu", "none"))


def stem_fits_vmem(x_shape, features: int) -> bool:
    """Conservative per-program VMEM estimate for the forward kernel
    (patches bf16 + f32 accumulator + double-buffered in/out blocks)."""
    h, w = int(x_shape[1]), int(x_shape[2])
    hw = h * w
    est = (147 * hw * 2            # patch tensor (compute dtype)
           + features * hw * 4     # f32 conv accumulator
           + 2 * features * hw * 2  # double-buffered output block
           + 2 * 3 * (h + 6) * (w + 6) * 2)
    return h >= 8 and w >= 8 and est <= 13 * 1024 * 1024


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _tap_slices(xp, h, w):
    """49 static-offset [3, H, W] views of the padded planar image."""
    for dr in range(K):
        for dc in range(K):
            yield jax.lax.slice(xp, (0, dr, dc), (3, dr + h, dc + w))


def _conv_stats(xp, w2p, norm):
    """Planar conv via ONE K=148 contraction (last row = bias against a
    ones-tap) + optional IN stats in natural keepdims layout."""
    h, wd = xp.shape[1] - 2 * PAD, xp.shape[2] - 2 * PAD
    taps = list(_tap_slices(xp, h, wd))
    taps.append(jnp.ones((1, h, wd), xp.dtype))                # bias tap
    p = jnp.concatenate(taps, axis=0)                          # [148, H, W]
    y = jax.lax.dot_general(
        w2p, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [C, H, W]
    if norm != "in":
        return y, None, None
    hw = h * wd
    mean = jnp.sum(y, axis=(1, 2), keepdims=True) / hw
    m2 = jnp.sum(y * y, axis=(1, 2), keepdims=True) / hw
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + _EPS)
    return y, mean, rstd


def _stem_fwd_kernel(xp_ref, w_ref, o_ref, *, norm: str, act: str):
    """One image: planar conv + (IN) + activation, all VMEM-resident."""
    y, mean, rstd = _conv_stats(xp_ref[0], w_ref[:], norm)
    if norm == "in":
        y = (y - mean) * rstd
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _stem_fwd(xp, w2p, norm, act, out_dtype):
    n, _, hp, wp = xp.shape
    h, wd = hp - 2 * PAD, wp - 2 * PAD
    c = w2p.shape[1]
    img = pl.BlockSpec((1, 3, hp, wp), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((148, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stem_fwd_kernel, norm=norm, act=act),
        grid=(n,),
        in_specs=[img, wspec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((n, c, h, wd), out_dtype),
        interpret=_use_interpret(),
    )(xp, w2p)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _stem_bwd_kernel(xp_ref, w_ref, g_ref, dxp_ref, dw_ref,
                     *, norm: str, act: str):
    """One image: recompute conv + stats, backprop activation+IN, then
    dW/db via 50 per-tap contractions (the ones-tap row is db) and dX via
    49 per-tap dot_generals + rotate-accumulates — the [148, H, W] patch
    tensor is never materialized here (VMEM headroom)."""
    i = pl.program_id(0)
    xp = xp_ref[0]
    w2p = w_ref[:]
    h, wd = g_ref.shape[2], g_ref.shape[3]

    y, mean, rstd = _conv_stats(xp, w2p, norm)
    g = g_ref[0].astype(jnp.float32)
    if norm == "in":
        hw = h * wd
        xhat = (y - mean) * rstd
        if act == "relu":
            g = jnp.where(xhat > 0.0, g, 0.0)
        g_mean = jnp.sum(g, axis=(1, 2), keepdims=True) / hw
        gx_mean = jnp.sum(g * xhat, axis=(1, 2), keepdims=True) / hw
        gc = rstd * (g - g_mean - xhat * gx_mean)          # d/d(conv out)
    else:
        if act == "relu":
            g = jnp.where(y > 0.0, g, 0.0)
        gc = g
    gc = gc.astype(g_ref.dtype)  # compute dtype for the grad contractions

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # dW[(dr,dc,ci), c] = sum_{r,w} xp[ci, r+dr, w+dc] * gc[c, r, w];
    # the trailing ones-tap row accumulates db
    dw_taps = []
    for sl in _tap_slices(xp, h, wd):
        dw_taps.append(jax.lax.dot_general(
            sl, gc, dimension_numbers=(((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32))           # [3, C]
    dw_taps.append(jax.lax.dot_general(
        jnp.ones((1, h, wd), gc.dtype), gc,
        dimension_numbers=(((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32))               # [1, C] == db
    dw_ref[:] += jnp.concatenate(dw_taps, axis=0)          # [148, C]

    # dX: per-tap dp = w2_tap-contraction of gc, rotate-accumulated
    acc = jnp.zeros((3, h + 2 * PAD, wd + 2 * PAD), jnp.float32)
    t = 0
    for dr in range(K):
        for dc in range(K):
            wt = jax.lax.slice(w2p, (3 * t, 0), (3 * t + 3, w2p.shape[1]))
            dpt = jax.lax.dot_general(
                wt, gc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [3, H, W]
            acc = acc.at[:, dr:dr + h, dc:dc + wd].add(dpt)
            t += 1
    dxp_ref[0] = acc.astype(dxp_ref.dtype)


def _stem_bwd(xp, w2p, g, norm, act):
    n, _, hp, wp = xp.shape
    h, wd = hp - 2 * PAD, wp - 2 * PAD
    c = w2p.shape[1]
    img = pl.BlockSpec((1, 3, hp, wp), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((148, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dxp, dwb = pl.pallas_call(
        functools.partial(_stem_bwd_kernel, norm=norm, act=act),
        grid=(n,),
        in_specs=[img, wspec, out],
        out_specs=(img, wspec),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            jax.ShapeDtypeStruct((148, c), jnp.float32),
        ),
        interpret=_use_interpret(),
    )(xp, w2p, g)
    return dxp, dwb


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

def _pack(x, w, b, pad_type):
    """NHWC image + HWIO kernel -> planar padded input + flat weights with
    the bias appended as row 147 (it contracts against a ones-tap)."""
    mode = {"reflect": "reflect", "replicate": "edge",
            "zero": "constant"}[pad_type]
    xpl = jnp.transpose(x, (0, 3, 1, 2))                   # [N, 3, H, W]
    xp = jnp.pad(xpl, ((0, 0), (0, 0), (PAD, PAD), (PAD, PAD)), mode=mode)
    # W2[(dr*K+dc)*3 + ci, co] = w[dr, dc, ci, co]; W2[147] = b
    w2 = w.reshape(K * K * 3, -1)
    w2p = jnp.concatenate([w2, b.reshape(1, -1)], axis=0).astype(x.dtype)
    return xp, w2p


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stem_conv7(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               norm: str = "in", act: str = "relu",
               pad_type: str = "reflect") -> jnp.ndarray:
    """Fused reflect-pad + 7x7/s1 conv + (instance norm) + (ReLU).

    x: [N, H, W, 3]; w: [7, 7, 3, C] (HWIO, the Conv2dBlock parameter,
    unchanged); b: [C].  Returns [N, H, W, C] in x.dtype.  IN statistics
    are fp32 1pass (the shipped `norm_stats` default).
    """
    y, _ = _stem_fwd_rule(x, w, b, norm, act, pad_type)
    return y


def _stem_fwd_rule(x, w, b, norm, act, pad_type):
    xp, w2p = _pack(x, w, b, pad_type)
    y = _stem_fwd(xp, w2p, norm, act, x.dtype)
    out = jnp.transpose(y, (0, 2, 3, 1))                   # NHWC
    return out, (xp, w2p)


def _stem_bwd_rule(norm, act, pad_type, res, gout):
    xp, w2p = res
    g = jnp.transpose(gout, (0, 3, 1, 2))                  # planar
    dxp, dwb = _stem_bwd(xp, w2p, g, norm, act)
    dx_pl = _unpad_grad(dxp.astype(jnp.float32), pad_type)
    dx = jnp.transpose(dx_pl, (0, 2, 3, 1)).astype(gout.dtype)
    dw = dwb[:K * K * 3].reshape(K, K, 3, -1)
    db = dwb[K * K * 3]
    return dx, dw, db


def _unpad_grad(dxp, pad_type):
    """Adjoint of the padding: reflect/edge fold gradients inward."""
    p = PAD
    if pad_type == "zero":
        return dxp[:, :, p:-p, p:-p]
    if pad_type == "reflect":
        # forward: xp[:, :, p - 1 - i, :] = x[:, :, i + 1, :] etc.
        core = dxp[:, :, p:-p, p:-p]
        top = jnp.flip(dxp[:, :, :p, p:-p], axis=2)        # rows p-1..0 -> 1..p
        bot = jnp.flip(dxp[:, :, -p:, p:-p], axis=2)
        core = core.at[:, :, 1:p + 1, :].add(top)
        core = core.at[:, :, -p - 1:-1, :].add(bot)
        left = jnp.flip(dxp[:, :, p:-p, :p], axis=3)
        right = jnp.flip(dxp[:, :, p:-p, -p:], axis=3)
        # corners reflect through both axes
        tl = jnp.flip(dxp[:, :, :p, :p], axis=(2, 3))
        tr = jnp.flip(dxp[:, :, :p, -p:], axis=(2, 3))
        bl = jnp.flip(dxp[:, :, -p:, :p], axis=(2, 3))
        br = jnp.flip(dxp[:, :, -p:, -p:], axis=(2, 3))
        core = core.at[:, :, :, 1:p + 1].add(left)
        core = core.at[:, :, :, -p - 1:-1].add(right)
        core = core.at[:, :, 1:p + 1, 1:p + 1].add(tl)
        core = core.at[:, :, 1:p + 1, -p - 1:-1].add(tr)
        core = core.at[:, :, -p - 1:-1, 1:p + 1].add(bl)
        core = core.at[:, :, -p - 1:-1, -p - 1:-1].add(br)
        return core
    if pad_type == "replicate":
        core = dxp[:, :, p:-p, p:-p]
        core = core.at[:, :, 0, :].add(dxp[:, :, :p, p:-p].sum(2))
        core = core.at[:, :, -1, :].add(dxp[:, :, -p:, p:-p].sum(2))
        core = core.at[:, :, :, 0].add(dxp[:, :, p:-p, :p].sum(3))
        core = core.at[:, :, :, -1].add(dxp[:, :, p:-p, -p:].sum(3))
        core = core.at[:, :, 0, 0].add(dxp[:, :, :p, :p].sum((2, 3)))
        core = core.at[:, :, 0, -1].add(dxp[:, :, :p, -p:].sum((2, 3)))
        core = core.at[:, :, -1, 0].add(dxp[:, :, -p:, :p].sum((2, 3)))
        core = core.at[:, :, -1, -1].add(dxp[:, :, -p:, -p:].sum((2, 3)))
        return core
    raise ValueError(pad_type)


stem_conv7.defvjp(_stem_fwd_rule, _stem_bwd_rule)
