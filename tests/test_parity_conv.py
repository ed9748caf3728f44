"""Parity-space boundary-conv rewrites (ops/parity_conv.py).

Exactness is pinned in float64 — the rewrites are the same math with a
different reassociation, so f64 agreement at ~1e-13 proves structural
equality while fp32/bf16 runs differ only by rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.ops.parity_conv import (
    depth_to_space, parity_applicable, parity_conv_stride1_parity_out,
    parity_conv_stride1_s2d_in, parity_conv_stride2, space_to_depth,
)


def _ref_conv(x, w, stride, pad, pad_type):
    mode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[pad_type]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode) \
        if pad else x
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _check(fn, stride, k, pad, pad_type, cin, cout, hw=16, tol=1e-12):
    with jax.enable_x64(True):
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (2, hw, hw, cin), jnp.float64)
        w = jax.random.normal(kw, (k, k, cin, cout), jnp.float64) * 0.05

        yr = _ref_conv(x, w, stride, pad, pad_type)
        yn = fn(x, w, pad, pad_type)
        assert yr.shape == yn.shape
        np.testing.assert_allclose(np.asarray(yn), np.asarray(yr), atol=tol)

        # gradient exactness (both grad convs take rewritten shapes too)
        gr = jax.grad(lambda x, w: (_ref_conv(x, w, stride, pad, pad_type) ** 2
                                    ).sum(), argnums=(0, 1))(x, w)
        gn = jax.grad(lambda x, w: (fn(x, w, pad, pad_type) ** 2).sum(),
                      argnums=(0, 1))(x, w)
        for a, b in zip(gr, gn):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-10)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_stride2_exact(pad_type):
    # the D stem shape (4x4/s2/p1) plus an even-pad variant
    _check(parity_conv_stride2, 2, 4, 1, pad_type, cin=3, cout=8)
    _check(parity_conv_stride2, 2, 4, 2, pad_type, cin=3, cout=8)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_stride1_s2d_in_exact(pad_type):
    # the encoder stems (7x7/s1/p3) and a 3x3/p1 same-size conv
    _check(parity_conv_stride1_s2d_in, 1, 7, 3, pad_type, cin=3, cout=8)
    _check(parity_conv_stride1_s2d_in, 1, 3, 1, pad_type, cin=3, cout=8)
    _check(parity_conv_stride1_s2d_in, 1, 5, 2, pad_type, cin=3, cout=8)


@pytest.mark.parametrize("pad_type", ["reflect", "replicate", "zero"])
def test_stride1_parity_out_exact(pad_type):
    # the decoder head (7x7/s1/p3, wide in, narrow out)
    _check(parity_conv_stride1_parity_out, 1, 7, 3, pad_type, cin=16, cout=4)
    _check(parity_conv_stride1_parity_out, 1, 3, 1, pad_type, cin=16, cout=2)


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_applicability_gate():
    assert parity_applicable(4, 2, 1, 3, 128, 128) == "stride2"
    assert parity_applicable(7, 1, 3, 3, 128, 128) == "stride1_s2d_in"
    assert parity_applicable(7, 1, 3, 64, 128, 128) is None   # wide input
    assert parity_applicable(4, 2, 1, 3, 127, 128) is None    # odd H
    assert parity_applicable(3, 2, 1, 3, 128, 128) is None    # odd k stride 2
    assert parity_applicable(7, 1, 2, 3, 128, 128) is None    # not same-size


def test_models_parity_on_off_equal():
    """Generator and MsImageDis produce the same outputs (and the same
    parameter tree) with parity_convs on and off."""
    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.models.discriminator import MsImageDis
    from dwcgan_tpu.models.generator import Generator

    cfg = load_config("configs/smoke.yaml")
    x = np.random.default_rng(0).uniform(-1, 1, (2, cfg.image_size,
                                                 cfg.image_size, 3)).astype(np.float32)

    gen_off = Generator(cfg=cfg.gen, input_dim=3, vocab_size=102,
                        dtype=jnp.float32)
    gen_on = Generator(cfg=cfg.gen, input_dim=3, vocab_size=102,
                       dtype=jnp.float32, parity_stems=True, parity_head=True)
    params = gen_off.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))
    # identical parameter tree: the rewrite declares the same leaves
    params_on = gen_on.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)}, jnp.asarray(x))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_on))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_on)):
        assert a.shape == b.shape

    out_off = gen_off.apply(params, jnp.asarray(x))
    out_on = gen_on.apply(params, jnp.asarray(x))
    for a, b in zip(jax.tree_util.tree_leaves(out_off),
                    jax.tree_util.tree_leaves(out_on)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    dis_off = MsImageDis(cfg=cfg.dis, dtype=jnp.float32, parity=False)
    dis_on = MsImageDis(cfg=cfg.dis, dtype=jnp.float32, parity=True)
    dp = dis_off.init(jax.random.PRNGKey(0), jnp.asarray(x))
    dp_on = dis_on.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert (jax.tree_util.tree_structure(dp)
            == jax.tree_util.tree_structure(dp_on))
    for (sa, ca), (sb, cb) in zip(dis_off.apply(dp, jnp.asarray(x)),
                                  dis_on.apply(dp, jnp.asarray(x))):
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sa),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(ca),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pad_type", ["reflect", "zero"])
def test_stride1_through_norm_exact(pad_type):
    """The round-4 parity-THROUGH-norm path: conv in parity layout, IN stats
    pooled over the 4 parity slots, activation, then d2s — must equal
    pad->conv->instance_norm->relu in float64 (values and grads), proving
    the pooled-slot statistics are the full-grid statistics."""
    from dwcgan_tpu.ops import norms
    from dwcgan_tpu.ops.parity_conv import parity_conv_stride1_s2d_in_raw

    eps = 1e-5

    def in_full(y):  # f64 instance norm (production pins stats to f32)
        m = jnp.mean(y, axis=(1, 2), keepdims=True)
        v = jnp.mean(jnp.square(y - m), axis=(1, 2), keepdims=True)
        return (y - m) * jax.lax.rsqrt(v + eps)

    def in_parity(y):  # f64 pooled-slot stats, parity layout
        n, p, q, c4 = y.shape
        y5 = y.reshape(n, p, q, 4, c4 // 4)
        m = jnp.mean(y5, axis=(1, 2, 3), keepdims=True)
        v = jnp.mean(jnp.square(y5 - m), axis=(1, 2, 3), keepdims=True)
        return ((y5 - m) * jax.lax.rsqrt(v + eps)).reshape(y.shape)

    with jax.enable_x64(True):
        kx, kw = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(kx, (2, 16, 16, 3), jnp.float64)
        w = jax.random.normal(kw, (7, 7, 3, 8), jnp.float64) * 0.05

        def ref(x, w):
            return jax.nn.relu(in_full(_ref_conv(x, w, 1, 3, pad_type)))

        def par(x, w):
            raw = parity_conv_stride1_s2d_in_raw(x, w, 3, pad_type)
            return depth_to_space(jax.nn.relu(in_parity(raw)))

        yr, yp = ref(x, w), par(x, w)
        assert yr.shape == yp.shape
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-10)

        gr = jax.grad(lambda x, w: (ref(x, w) ** 2).sum(), argnums=(0, 1))(x, w)
        gp = jax.grad(lambda x, w: (par(x, w) ** 2).sum(), argnums=(0, 1))(x, w)
        for a, b in zip(gr, gp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-8)

    # production functions (f32 stats): same chain within f32 rounding
    x32 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                      jnp.float32)
    w32 = jnp.asarray(np.random.default_rng(1).normal(size=(7, 7, 3, 8)) * 0.05,
                      jnp.float32)
    a = jax.nn.relu(norms.instance_norm(_ref_conv(x32, w32, 1, 3, pad_type)))
    raw = parity_conv_stride1_s2d_in_raw(x32, w32, 3, pad_type)
    b = depth_to_space(jax.nn.relu(norms.instance_norm_parity(raw)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)
