"""Eval harness tests: FID/IS math against closed forms and torch-oracle
checks of the InceptionV3 trunk."""

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.eval.inception import InceptionV3, init_random_inception, preprocess_for_inception
from dwcgan_tpu.eval.metrics import feature_stats, fid_from_stats, inception_score


def test_fid_zero_for_identical_stats():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    mu, s = feature_stats(f)
    assert abs(fid_from_stats(mu, s, mu, s)) < 1e-6


def test_fid_known_gaussians():
    """For isotropic Gaussians FID = ||dmu||^2 + (s1 + s2 - 2 sqrt(s1 s2)) * D."""
    d = 8
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1 = np.eye(d) * 4.0
    s2 = np.eye(d) * 1.0
    want = 4.0 * d + (4 + 1 - 2 * 2.0) * d
    got = fid_from_stats(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fid_sensitive_to_distribution_shift():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1000, 32))
    b = rng.normal(size=(1000, 32))
    c = rng.normal(loc=1.5, size=(1000, 32))
    fid_ab = fid_from_stats(*feature_stats(a), *feature_stats(b))
    fid_ac = fid_from_stats(*feature_stats(a), *feature_stats(c))
    assert fid_ac > fid_ab * 5


def test_inception_score_bounds():
    rng = np.random.default_rng(2)
    n, k = 500, 10
    # uniform predictions -> IS ~ 1
    uniform_logits = np.zeros((n, k))
    is_u, _ = inception_score(uniform_logits, splits=5)
    np.testing.assert_allclose(is_u, 1.0, rtol=1e-5)
    # confident diverse predictions -> IS ~ k
    labels = rng.integers(0, k, n)
    sharp_logits = np.full((n, k), -50.0)
    sharp_logits[np.arange(n), labels] = 50.0
    is_s, _ = inception_score(sharp_logits, splits=5)
    assert is_s > k * 0.8


def test_inception_v3_shapes():
    variables = init_random_inception(seed=0)
    x = jnp.zeros((2, 299, 299, 3), jnp.float32)
    feats, logits = InceptionV3().apply(variables, x)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1000)


def test_inception_param_count_matches_torchvision():
    """Structural parity: same parameter count as torchvision inception_v3
    (aux_logits head excluded; BN running stats counted as our frozen
    bn_mean/bn_var params)."""
    import pytest
    tvm = pytest.importorskip("torchvision.models")
    t = tvm.inception_v3(weights=None, aux_logits=True, init_weights=False)
    torch_n = sum(v.numel() for k, v in t.state_dict().items()
                  if not k.startswith("AuxLogits") and "num_batches_tracked" not in k)
    variables = init_random_inception(seed=0)
    mine_n = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(variables))
    assert mine_n == torch_n, (mine_n, torch_n)


def test_preprocess_resizes():
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    y = preprocess_for_inception(x)
    assert y.shape == (2, 299, 299, 3)
