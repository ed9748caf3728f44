"""Loss tests: GMM distances against the torch reference implementation,
adversarial losses against closed forms, penalties against analytic
gradients, and style sampling statistics."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dwcgan_tpu.losses.gan import (
    adversarial_d_loss, adversarial_g_loss, classification_loss, dis_loss,
    diversity_loss, gen_adv_loss, gradient_penalty, r1_penalty, recon_l1,
)
from dwcgan_tpu.losses.gmm import gmm_emd, gmm_kl
from dwcgan_tpu.train.sampling import sample_style, style_replace

sys.path.insert(0, "/root/reference")
import gmm as ref_gmm  # noqa: E402

N, K, C = 4, 8, 8
SIGMA_SQ = 0.25  # stddev 0.5 (configs/celeba_faces.yaml:25, solver.py:53)


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_gmm_kl_matches_reference():
    mu = _rand((N, K, C), 0)
    logvar = _rand((N, K, C), 1) * 0.3
    means = np.sign(_rand((N, K), 2)).astype(np.float32)

    got = float(gmm_kl(jnp.asarray(mu), jnp.asarray(logvar), jnp.asarray(means), SIGMA_SQ))

    # reference takes lists of [N, C] per attribute and [N, K] means
    mus_list = [torch.from_numpy(mu[:, i]) for i in range(K)]
    lv_list = [torch.from_numpy(logvar[:, i]) for i in range(K)]
    want = ref_gmm.gmm_kl_distance_sp(
        mus_list, lv_list, torch.from_numpy(means), torch.tensor(SIGMA_SQ))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_gmm_emd_matches_reference():
    mu = _rand((N, K, C), 3)
    means = np.sign(_rand((N, K), 4)).astype(np.float32)
    got = float(gmm_emd(jnp.asarray(mu), jnp.asarray(means)))
    mus_list = [torch.from_numpy(mu[:, i]) for i in range(K)]
    want = ref_gmm.gmm_earth_mover_distance_sp(mus_list, torch.from_numpy(means))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_gmm_kl_zero_at_prior():
    """KL is zero when prediction equals the prior exactly."""
    means = np.sign(_rand((N, K), 5)).astype(np.float32)
    mu = np.repeat(means[:, :, None], C, axis=2)
    logvar = np.full((N, K, C), np.log(SIGMA_SQ), np.float32)
    got = float(gmm_kl(jnp.asarray(mu), jnp.asarray(logvar), jnp.asarray(means), SIGMA_SQ))
    assert abs(got) < 1e-6


def test_adversarial_losses_closed_form():
    f = jnp.full((2, 4, 4, 1), 0.25)
    r = jnp.full((2, 4, 4, 1), 0.75)
    # lsgan: mean(f^2) + mean((r-1)^2)
    np.testing.assert_allclose(float(adversarial_d_loss(f, r, "lsgan")),
                               0.25**2 + 0.25**2, rtol=1e-6)
    np.testing.assert_allclose(float(adversarial_g_loss(f, "lsgan")),
                               0.75**2, rtol=1e-6)
    # wgan: mean(f) - mean(r)
    np.testing.assert_allclose(float(adversarial_d_loss(f, r, "wgan")), -0.5, rtol=1e-6)
    np.testing.assert_allclose(float(adversarial_g_loss(f, "wgan")), -0.25, rtol=1e-6)


def test_nsgan_matches_torch_bce():
    f = _rand((2, 4, 4, 1), 6)
    r = _rand((2, 4, 4, 1), 7)
    got = float(adversarial_d_loss(jnp.asarray(f), jnp.asarray(r), "nsgan"))
    ft, rt = torch.from_numpy(f), torch.from_numpy(r)
    want = (torch.nn.functional.binary_cross_entropy(torch.sigmoid(ft), torch.zeros_like(ft))
            + torch.nn.functional.binary_cross_entropy(torch.sigmoid(rt), torch.ones_like(rt)))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_classification_loss_matches_torch():
    logits = _rand((4, 8), 8)
    target = (np.sign(_rand((4, 8), 9)) * 0.5 + 0.5).astype(np.float32)
    got = float(classification_loss(jnp.asarray(logits), jnp.asarray(target), "CelebA"))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target), reduction="mean")
    np.testing.assert_allclose(got, float(want), rtol=1e-5)
    # categorical path
    got_ce = float(classification_loss(jnp.asarray(logits), jnp.asarray(np.array([1, 0, 7, 3])), "RaFD"))
    want_ce = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.tensor([1, 0, 7, 3]))
    np.testing.assert_allclose(got_ce, float(want_ce), rtol=1e-5)


def test_dis_and_gen_losses_sum_over_scales():
    outs_f = [(jnp.zeros((2, 4, 4, 1)), jnp.zeros((2, 8))),
              (jnp.zeros((2, 2, 2, 1)), jnp.zeros((2, 8)))]
    outs_r = [(jnp.ones((2, 4, 4, 1)), jnp.zeros((2, 8))),
              (jnp.ones((2, 2, 2, 1)), jnp.zeros((2, 8)))]
    cls = jnp.ones((2, 8)) * 0.0
    d = float(dis_loss(outs_f, outs_r, cls, "lsgan", "CelebA", 1.0, 0.0))
    assert abs(d) < 1e-6  # perfect D, gan term zero per scale
    g = float(gen_adv_loss(outs_f, cls, "lsgan", "CelebA", 1.0, 0.0))
    np.testing.assert_allclose(g, 2.0, rtol=1e-6)  # (0-1)^2 per scale


def test_recon_and_diversity():
    a = jnp.ones((2, 3)) * 2
    b = jnp.zeros((2, 3))
    np.testing.assert_allclose(float(recon_l1(a, b)), 2.0)
    np.testing.assert_allclose(float(diversity_loss(a, b)), 2.0)
    # diversity must not backprop through x2
    g = jax.grad(lambda x: diversity_loss(a, x))(b)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_r1_penalty_analytic():
    """dis(x) = 0.5 * sum(x^2) => grad = x => penalty = mean(||x||^2 ^ 2)
    (the reference squares the squared norm, solver.py:313-314)."""
    x = _rand((3, 4, 4, 1), 10)
    fn = lambda v: 0.5 * jnp.sum(jnp.square(v), axis=(1, 2, 3))
    got = float(r1_penalty(fn, jnp.asarray(x)))
    want = np.mean(np.sum(x.reshape(3, -1) ** 2, 1) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gradient_penalty_analytic():
    x = _rand((3, 4, 4, 1), 11)
    fn = lambda v: 0.5 * jnp.sum(jnp.square(v), axis=(1, 2, 3))
    got = float(gradient_penalty(fn, jnp.asarray(x)))
    want = np.mean((np.linalg.norm(x.reshape(3, -1), axis=1) - 1) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_sample_style_statistics():
    means = jnp.asarray(np.sign(_rand((512, K), 12)), jnp.float32)
    z = np.asarray(sample_style(jax.random.PRNGKey(0), means, C, 0.5))
    assert z.shape == (512, K * C)
    zb = z.reshape(512, K, C)
    err = np.abs(zb.mean(axis=2) - np.asarray(means))
    # per-attribute block centered on its component mean
    assert err.mean() < 0.2
    assert abs(zb.std() - np.sqrt(0.5**2 + 1.0)) < 0.1  # means +/-1 + noise


def test_style_replace():
    c_src = jnp.asarray([[1.0, -1.0, 1.0]])
    c_trg = jnp.asarray([[1.0, 1.0, -1.0]])
    z_src = jnp.arange(6, dtype=jnp.float32).reshape(1, 6)
    z_trg = -jnp.ones((1, 6))
    out = np.asarray(style_replace(c_src, c_trg, z_src, z_trg, c_dim=2))
    # attr 0 unchanged -> source block kept; attrs 1,2 changed -> target kept
    np.testing.assert_array_equal(out, [[0, 1, -1, -1, -1, -1]])


def test_focal_loss_matches_torch():
    """Focal loss vs a torch oracle built exactly as the reference's
    FocalLoss.forward (networks.py:26-37)."""
    from dwcgan_tpu.losses.gan import focal_loss

    x = _rand((6, 8), 21)
    t = (np.random.default_rng(22).random((6, 8)) > 0.5).astype(np.float32)

    for logits in (True, False):
        inp = x if logits else 1.0 / (1.0 + np.exp(-x))
        ti, tt = torch.tensor(inp), torch.tensor(t)
        if logits:
            bce = torch.nn.functional.binary_cross_entropy_with_logits(
                ti, tt, reduction="none")
        else:
            bce = torch.nn.functional.binary_cross_entropy(ti, tt, reduction="none")
        pt = torch.exp(-bce)
        want = (1.0 * (1 - pt) ** 2 * bce).mean().item()
        got = float(focal_loss(jnp.asarray(inp), jnp.asarray(t), logits=logits))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # unreduced path
        got_elem = np.asarray(focal_loss(jnp.asarray(inp), jnp.asarray(t),
                                         logits=logits, use_reduce=False))
        np.testing.assert_allclose(
            got_elem, (1.0 * (1 - pt) ** 2 * bce).numpy(), rtol=1e-4, atol=1e-6)


def test_sample_style_flat_statistics_and_layout():
    """v1 distribution_sampling equivalent (tools.py:49-55): element-major
    [N, M*v_dim] layout, mean mu, stddev sigma."""
    from dwcgan_tpu.train.sampling import sample_style_flat

    mu = jnp.asarray(_rand((256, 16), 33))
    z = np.asarray(sample_style_flat(jax.random.PRNGKey(1), mu, v_dim=4,
                                     stddev=0.5))
    assert z.shape == (256, 64)
    zb = z.reshape(256, 16, 4)
    err = np.abs(zb.mean(axis=2) - np.asarray(mu))
    assert err.mean() < 0.25                       # centered per element
    assert abs((zb - np.asarray(mu)[:, :, None]).std() - 0.5) < 0.02

    # v_dim=1 degenerates to mu + noise in the original order
    z1 = np.asarray(sample_style_flat(jax.random.PRNGKey(2), mu, v_dim=1,
                                      stddev=1e-6))
    np.testing.assert_allclose(z1, np.asarray(mu), atol=1e-4)


def test_spectral_norm_sigma_accuracy():
    """The stateless 5-iteration power method (ops/blocks.py) must estimate
    sigma within a few percent of the exact SVD value on the actual D kernel
    shapes — and at least as well as torch's persisted-u spectral_norm after
    one forward (the reference runs ONE iteration per call,
    networks.py:793-802)."""
    from dwcgan_tpu.ops.blocks import _spectral_normalize

    shapes = [(4, 4, 3, 64), (4, 4, 64, 128), (4, 4, 256, 512),
              (1, 1, 512, 1), (7, 7, 512, 8)]
    for i, shp in enumerate(shapes):
        w = _rand(shp, 40 + i)
        w_mat = w.reshape(-1, shp[-1])
        sigma_true = np.linalg.svd(w_mat, compute_uv=False)[0]

        w_norm = np.asarray(_spectral_normalize(jnp.asarray(w)))
        # recover the sigma the op divided by
        sigma_est = float(np.median(w.reshape(-1) / w_norm.reshape(-1)))
        rel_err = abs(sigma_est - sigma_true) / sigma_true
        assert rel_err < 0.03, f"{shp}: sigma rel err {rel_err:.4f}"

        # torch oracle: spectral_norm with one fresh power iteration (the
        # reference runs ONE iteration per forward, networks.py:793-802)
        lin = torch.nn.Linear(w_mat.shape[0], w_mat.shape[1], bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(w_mat.T))
        sn = torch.nn.utils.spectral_norm(lin, n_power_iterations=1)
        with torch.no_grad():
            sn(torch.zeros(1, w_mat.shape[0]))
        w_t = sn.weight.detach().numpy().T
        sigma_torch = float(np.median(w_mat.reshape(-1) / w_t.reshape(-1)))
        torch_err = abs(sigma_torch - sigma_true) / sigma_true
        assert rel_err <= torch_err + 0.02, (
            f"{shp}: ours {rel_err:.4f} vs torch-1-iter {torch_err:.4f}")
