"""Correctness of the fused Pallas 7x7 stem kernel (ops/pallas/stem_kernels)
against the jnp reference path: pad -> lax.conv -> instance_norm(1pass) ->
relu, values AND gradients, interpret mode on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.ops.norms import get_stats_mode, set_stats_mode, instance_norm
from dwcgan_tpu.ops.pallas.stem_kernels import stem_applicable, stem_conv7


def _pad_nhwc(x, p, pad_type):
    mode = {"reflect": "reflect", "replicate": "edge",
            "zero": "constant"}[pad_type]
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)


def ref_stem(x, w, b, norm, act, pad_type):
    xp = _pad_nhwc(x, 3, pad_type)
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    if norm == "in":
        y = instance_norm(y)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("norm,act,pad_type", [
    ("in", "relu", "reflect"),     # ContentEncoder stem
    ("none", "relu", "reflect"),   # StyleEncoder stem
    ("in", "relu", "zero"),
    ("none", "none", "replicate"),
])
def test_stem_forward_matches_reference(norm, act, pad_type):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    prev = get_stats_mode()
    set_stats_mode("1pass")  # the kernel computes 1pass fp32 stats
    try:
        want = ref_stem(x, w, b, norm, act, pad_type)
        got = stem_conv7(x, w, b, norm, act, pad_type)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        set_stats_mode(prev)


@pytest.mark.parametrize("norm,act,pad_type", [
    ("in", "relu", "reflect"),
    ("none", "relu", "zero"),
    ("in", "none", "replicate"),
])
def test_stem_gradients_match_reference(norm, act, pad_type):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    prev = get_stats_mode()
    set_stats_mode("1pass")
    try:
        def loss_ref(x, w, b):
            return jnp.sum(ref_stem(x, w, b, norm, act, pad_type) * ct)

        def loss_ker(x, w, b):
            return jnp.sum(stem_conv7(x, w, b, norm, act, pad_type) * ct)

        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        got = jax.grad(loss_ker, argnums=(0, 1, 2))(x, w, b)
        for gw, gg, name in zip(want, got, ("dx", "dw", "db")):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(gw), rtol=5e-5, atol=5e-5,
                err_msg=name)
    finally:
        set_stats_mode(prev)


def test_conv2dblock_stem_pallas_equivalence():
    """Conv2dBlock(stem_pallas=True) must match the default path exactly in
    values and parameter-tree layout (same Conv_0 kernel/bias)."""
    from dwcgan_tpu.ops.blocks import Conv2dBlock
    from dwcgan_tpu.ops.norms import get_stats_mode, set_stats_mode

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    ref_blk = Conv2dBlock(8, 7, 1, 3, norm="in", activ="relu",
                          pad_type="reflect")
    ker_blk = Conv2dBlock(8, 7, 1, 3, norm="in", activ="relu",
                          pad_type="reflect", stem_pallas=True)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    prev = get_stats_mode()
    set_stats_mode("1pass")
    try:
        want = ref_blk.apply(params, x)
        got = ker_blk.apply(params, x)  # same param tree by construction
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        set_stats_mode(prev)


def test_stem_applicable_gate():
    assert stem_applicable(7, 1, 3, 3, "in", "relu")
    assert stem_applicable(7, 1, 3, 3, "none", "relu")
    assert not stem_applicable(7, 1, 3, 64, "in", "relu")   # not a stem
    assert not stem_applicable(4, 2, 1, 3, "none", "lrelu")  # D stem shape
    assert not stem_applicable(7, 1, 3, 3, "ln", "relu")
