"""Pallas kernel correctness (interpret mode on CPU) pinned against the jnp
reference implementations, forward AND backward (custom VJPs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.ops.norms import adain, instance_norm
from dwcgan_tpu.ops.pallas.norm_kernels import (
    adain_pallas, adain_residual_pallas, instance_norm_pallas,
)

N, H, W, C = 2, 8, 8, 16


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_instance_norm_forward():
    x = jnp.asarray(_rand((N, H, W, C), 0))
    np.testing.assert_allclose(np.asarray(instance_norm_pallas(x)),
                               np.asarray(instance_norm(x)), atol=1e-5)


def test_instance_norm_grad():
    x = jnp.asarray(_rand((N, H, W, C), 1))
    f_p = lambda v: jnp.sum(jnp.sin(instance_norm_pallas(v)))
    f_r = lambda v: jnp.sum(jnp.sin(instance_norm(v)))
    np.testing.assert_allclose(np.asarray(jax.grad(f_p)(x)),
                               np.asarray(jax.grad(f_r)(x)), atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_adain_forward(relu):
    x = jnp.asarray(_rand((N, H, W, C), 2))
    s = jnp.asarray(_rand((N, C), 3))
    b = jnp.asarray(_rand((N, C), 4))
    ref = adain(x, s, b)
    if relu:
        ref = jax.nn.relu(ref)
    np.testing.assert_allclose(np.asarray(adain_pallas(x, s, b, relu)),
                               np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_adain_grads(relu):
    x = jnp.asarray(_rand((N, H, W, C), 5))
    s = jnp.asarray(_rand((N, C), 6))
    b = jnp.asarray(_rand((N, C), 7))

    def loss_p(x, s, b):
        return jnp.sum(jnp.tanh(adain_pallas(x, s, b, relu)))

    def loss_r(x, s, b):
        y = adain(x, s, b)
        if relu:
            y = jax.nn.relu(y)
        return jnp.sum(jnp.tanh(y))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, s, b)
    for a, bb in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


def test_adain_residual():
    x = jnp.asarray(_rand((N, H, W, C), 8))
    y = jnp.asarray(_rand((N, H, W, C), 9))
    s = jnp.asarray(_rand((N, C), 10))
    b = jnp.asarray(_rand((N, C), 11))
    got = adain_residual_pallas(x, y, s, b)
    want = x + adain(y, s, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_layer_norm_forward():
    from dwcgan_tpu.ops.norms import layer_norm_ref
    from dwcgan_tpu.ops.pallas.norm_kernels import layer_norm_ref_pallas
    x = jnp.asarray(_rand((N, H, W, C), 20))
    gamma = jnp.asarray(np.random.default_rng(21).uniform(size=(C,)).astype(np.float32))
    beta = jnp.asarray(_rand((C,), 22))
    np.testing.assert_allclose(np.asarray(layer_norm_ref_pallas(x, gamma, beta)),
                               np.asarray(layer_norm_ref(x, gamma, beta)), atol=1e-5)


def test_layer_norm_grads():
    from dwcgan_tpu.ops.norms import layer_norm_ref
    from dwcgan_tpu.ops.pallas.norm_kernels import layer_norm_ref_pallas
    x = jnp.asarray(_rand((N, H, W, C), 23))
    gamma = jnp.asarray(np.random.default_rng(24).uniform(size=(C,)).astype(np.float32) + 0.5)
    beta = jnp.asarray(_rand((C,), 25))

    def loss_p(x, g, b):
        return jnp.sum(jnp.tanh(layer_norm_ref_pallas(x, g, b)))

    def loss_r(x, g, b):
        return jnp.sum(jnp.tanh(layer_norm_ref(x, g, b)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b2 in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=2e-4)


def test_adain_bf16_io():
    """Kernels accept bfloat16 activations with fp32 stats."""
    x = jnp.asarray(_rand((N, H, W, C), 12)).astype(jnp.bfloat16)
    s = jnp.asarray(_rand((N, C), 13))
    b = jnp.asarray(_rand((N, C), 14))
    y = adain_pallas(x, s, b, True)
    assert y.dtype == jnp.bfloat16
    ref = jax.nn.relu(adain(x, s, b))
    np.testing.assert_allclose(np.asarray(y, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), atol=3e-2)
