"""Legacy v1 model family + legacy utilities: shape and sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.losses.gmm import gmm_emd_flat, gmm_kl_flat
from dwcgan_tpu.losses.gan import isometry_constraint, mode_seeking_constraint
from dwcgan_tpu.models.legacy import AdaINGenV1, ContentEncoderOld, VAEGen
from dwcgan_tpu.utils.interp import get_slerp_interp, slerp


def test_adain_gen_v1_shapes():
    gen = AdaINGenV1(dim=8, style_dim=8, n_downsample=2, n_res=2,
                     mlp_dim=16, embed_dim=12, hidden_size=12, vocab_size=102)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)
    content, mu, logvar = gen.apply(params, x, method="encode")
    # uncapped: 8 -> 16 -> 32 channels at 8x8
    assert content.shape == (2, 8, 8, 32)
    assert mu.shape == (2, 8) and logvar.shape == (2, 8)
    img, att = gen.apply(params, content, mu, method="decode")
    assert img.shape == (2, 32, 32, 3) and att.shape == (2, 32, 32, 1)
    mu_t, lv_t = gen.apply(params, mu, jnp.zeros((2, 6), jnp.int32),
                           jnp.full((2,), 6, jnp.int32), method="encode_txt")
    assert mu_t.shape == (2, 8) and lv_t.shape == (2, 8)


def test_content_encoder_old_uncapped():
    enc = ContentEncoderOld(dim=16, n_downsample=3, n_res=1)
    assert enc.output_dim == 128
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    assert enc.apply(params, x).shape == (1, 4, 4, 128)


def test_vae_gen():
    vae = VAEGen(dim=8, n_downsample=2, n_res=2)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), x)
    recon, hiddens = vae.apply(params, x)
    assert recon.shape == x.shape
    # stochastic path
    r2, _ = vae.apply(params, x, key=jax.random.PRNGKey(1), deterministic=False)
    assert not np.allclose(np.asarray(recon), np.asarray(r2))


def test_gmm_flat_variants():
    mu = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    var = jnp.exp(jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)))
    m = jnp.sign(jnp.asarray(np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)))
    assert np.isfinite(float(gmm_kl_flat(mu, var, m, 0.25)))
    assert float(gmm_emd_flat(m, m)) == 0.0


def test_legacy_constraints():
    z = jnp.ones((2, 4))
    assert float(isometry_constraint(z, 2 * z, z, 2 * z)) == 0.0
    v = mode_seeking_constraint(jnp.ones((2, 3)), jnp.zeros((2, 3)),
                                jnp.ones((2, 4)), jnp.zeros((2, 4)))
    assert np.isfinite(float(v))


def test_slerp():
    low = np.array([1.0, 0.0])
    high = np.array([0.0, 1.0])
    mid = slerp(0.5, low, high)
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, rtol=1e-6)
    grid = get_slerp_interp(2, 3, 8)
    assert grid.shape == (6, 8, 1, 1)
