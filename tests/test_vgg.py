"""VGG perceptual-loss tests: preprocessing against the torch reference
formula, feature parity with a torch-built VGG16 from identical weights,
and the loss inside a train step."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dwcgan_tpu.models.vgg import (
    Vgg16Features, _LAYERS, init_random_vgg, make_vgg_loss_fn, vgg_preprocess,
)


def test_vgg_preprocess_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(vgg_preprocess(jnp.asarray(x)))
    # reference: chunk RGB, cat BGR, (x+1)*255/2, subtract means (utils.py:207-217)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    r, g, b = torch.chunk(xt, 3, dim=1)
    bgr = torch.cat((b, g, r), dim=1)
    bgr = (bgr + 1) * 255 * 0.5
    mean = torch.tensor([103.939, 116.779, 123.680]).view(1, 3, 1, 1)
    want = (bgr - mean).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_vgg_features_match_torch_with_same_weights():
    variables = init_random_vgg(seed=1)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(Vgg16Features().apply(variables, jnp.asarray(x)))

    h = torch.from_numpy(x).permute(0, 3, 1, 2)
    for name, _, pool in _LAYERS:
        p = variables["params"][name]
        w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["bias"]).copy())
        h = F.relu(F.conv2d(h, w, b, padding=1))
        if pool:
            h = F.max_pool2d(h, 2, 2)
    want = h.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_vgg_loss_zero_for_identical_inputs_and_positive_otherwise():
    variables = init_random_vgg(seed=3)
    loss_fn = make_vgg_loss_fn(variables)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    assert float(loss_fn(x, x)) < 1e-10
    assert float(loss_fn(x, y)) > 0.0
    # differentiable w.r.t. inputs (it sits inside the G loss)
    g = jax.grad(lambda a: loss_fn(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
