"""Device-side GMM style sampling.

Replaces `/root/reference/tools.py:65-79` (`dist_sampling_split`) with
`jax.random` — keys are threaded explicitly, so per-step and per-device
decorrelation falls out of key folding instead of global CUDA RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_style(key: jax.Array, comp_means: jnp.ndarray, c_dim: int,
                 stddev: float, dtype=jnp.float32) -> jnp.ndarray:
    """Sample a style vector per sample from the attribute GMM.

    comp_means: [N, K] component means (+/-1 per attribute).  Each attribute's
    c_dim-block is drawn i.i.d. N(mean_k, stddev) — attribute-major layout
    matching `z[:, k*c_dim:(k+1)*c_dim]` in the reference.
    Returns [N, K * c_dim].
    """
    n, k = comp_means.shape
    eps = jax.random.normal(key, (n, k, c_dim), jnp.float32)
    z = comp_means.astype(jnp.float32)[:, :, None] + stddev * eps
    return z.reshape(n, k * c_dim).astype(dtype)


def sample_style_flat(key: jax.Array, mu: jnp.ndarray, v_dim: int = 1,
                      stddev: float = 0.5, dtype=jnp.float32) -> jnp.ndarray:
    """v1 `distribution_sampling` equivalent (reference tools.py:49-55).

    mu: [N, M] flat style means; draws v_dim i.i.d. N(mu, stddev) samples per
    element, element-major layout (the reference's transpose/view chain) ->
    [N, M * v_dim].  With v_dim=1 this is plain per-element Gaussian noise
    around mu — the legacy single-head style sampler.
    """
    n, m = mu.shape
    eps = jax.random.normal(key, (n, m, v_dim), jnp.float32)
    z = mu.astype(jnp.float32)[:, :, None] + stddev * eps
    return z.reshape(n, m * v_dim).astype(dtype)


def blend_attention(img, att, x_real, att_on=True):
    """Attention-masked edit: img*att + x_real*(1-att) when attention is
    active (solver.py:158-170); the raw decode otherwise.  `att_on` may be a
    traced boolean (the step-10000 warm-up gate) or a Python bool.

    Single definition shared by the train step, the samplers, and inference.
    """
    if att is None:
        return img.astype(jnp.float32)
    att = att.astype(jnp.float32)
    blended = img.astype(jnp.float32) * att + x_real.astype(jnp.float32) * (1.0 - att)
    if att_on is True:
        return blended
    return jnp.where(att_on, blended, img.astype(jnp.float32))


def style_replace(c_src: jnp.ndarray, c_trg: jnp.ndarray, z_src: jnp.ndarray,
                  z_trg: jnp.ndarray, c_dim: int) -> jnp.ndarray:
    """Keep the source style for attributes the command leaves unchanged.

    Vectorized form of the reference's per-element loop (solver.py:134-140):
    where c_src[n,k] == c_trg[n,k], z_trg's k-th c_dim block is replaced by
    z_src's.  z_*: [N, K*c_dim] flat styles.
    """
    n = c_src.shape[0]
    keep = (c_src == c_trg)[:, :, None]  # [N, K, 1]
    zs = z_src.reshape(n, -1, c_dim)
    zt = z_trg.reshape(n, -1, c_dim)
    return jnp.where(keep, zs, zt).reshape(z_trg.shape)
