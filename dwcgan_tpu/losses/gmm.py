"""GMM latent-space distance losses.

The style space is a Gaussian mixture with one component per attribute
combination; component means sit at +/-1 per attribute with stddev sigma
(reference `/root/reference/gmm.py`).  Styles here are `[N, K, C]` tensors
(K = num attributes, C = dims per attribute) rather than lists of K tensors,
so the per-attribute loop becomes one broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp


def gmm_kl(pred_mu: jnp.ndarray, pred_logvar: jnp.ndarray,
           comp_means: jnp.ndarray, sigma_sq: float) -> jnp.ndarray:
    """KL( N(pred_mu, exp(pred_logvar)) || N(comp_means, sigma_sq) ).

    pred_mu/pred_logvar: [N, K, C]; comp_means: [N, K] in {-1, +1}.
    Matches `gmm_kl_distance_sp` (gmm.py:13-22): per attribute the KL is
    summed over C and averaged over the batch, then summed over attributes.
    """
    mu = pred_mu.astype(jnp.float32)
    logvar = pred_logvar.astype(jnp.float32)
    var = jnp.exp(logvar)
    m = comp_means.astype(jnp.float32)[:, :, None]
    kl = 0.5 * (jnp.log(sigma_sq) - logvar + (var + jnp.square(mu - m)) / sigma_sq - 1.0)
    # sum over C, mean over N, sum over K == sum(dim=1).mean() per attr, summed
    return kl.sum(axis=2).mean(axis=0).sum()


def gmm_emd(pred_mu: jnp.ndarray, comp_means: jnp.ndarray) -> jnp.ndarray:
    """Earth-mover (L1-to-component-mean) variant (gmm.py:33-41)."""
    mu = pred_mu.astype(jnp.float32)
    m = comp_means.astype(jnp.float32)[:, :, None]
    return jnp.abs(mu - m).sum(axis=2).mean(axis=0).sum()


def gmm_kl_flat(pred_mu: jnp.ndarray, pred_var: jnp.ndarray,
                mus: jnp.ndarray, sigma_sq: float) -> jnp.ndarray:
    """Non-split (v1) KL over flat [N, D] styles (gmm.py:4-10).  Note the v1
    form takes *variance* directly, not logvar."""
    mu = pred_mu.astype(jnp.float32)
    var = pred_var.astype(jnp.float32)
    m = mus.astype(jnp.float32)
    kl = 0.5 * (jnp.log(sigma_sq / var) + (var + jnp.square(mu - m)) / sigma_sq - 1.0)
    return kl.sum(axis=1).mean()


def gmm_emd_flat(pred_mu: jnp.ndarray, mus: jnp.ndarray) -> jnp.ndarray:
    """Non-split (v1) earth-mover over flat [N, D] styles (gmm.py:25-30)."""
    return jnp.abs(pred_mu.astype(jnp.float32)
                   - mus.astype(jnp.float32)).sum(axis=1).mean()
