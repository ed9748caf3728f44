"""Learning-rate schedules as pure functions of the step.

Reference behavior (`/root/reference/utils.py:220-231`, `solver.py:96-107`):
schedulers are stepped once per *iteration*; 'cosa' manually warm-restarts
— when the lr anneals to eta_min the period is multiplied by t_mult and the
cosine restarts.  Expressed here in closed form so the whole schedule lives
inside the jitted step (no Python-side scheduler state to checkpoint).
"""

from __future__ import annotations

import jax.numpy as jnp

from dwcgan_tpu.config import Config


def lr_schedule(cfg: Config):
    """Returns f(step) -> lr for const / step / cosa policies."""
    base, policy = cfg.lr, cfg.lr_policy

    if policy == "const":
        return lambda step: jnp.asarray(base, jnp.float32)

    if policy == "step":
        gamma, size = cfg.gamma, cfg.step_size

        def step_fn(step):
            k = jnp.asarray(step, jnp.float32) // size
            return jnp.asarray(base, jnp.float32) * jnp.power(gamma, k)

        return step_fn

    if policy == "cosa":
        eta_min, t0, m = cfg.eta_min, float(cfg.step_size), float(cfg.t_mult)

        def cosa_fn(step):
            s = jnp.asarray(step, jnp.float32)
            if m == 1.0:
                t = jnp.mod(s, t0)
                period = t0
            else:
                # cycle index i satisfies sum_{j<i} t0*m^j <= s
                i = jnp.floor(jnp.log(s * (m - 1.0) / t0 + 1.0) / jnp.log(m))
                start = t0 * (jnp.power(m, i) - 1.0) / (m - 1.0)
                t = s - start
                period = t0 * jnp.power(m, i)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t / period))
            return eta_min + (base - eta_min) * cos

        return cosa_fn

    raise ValueError(f"unsupported lr_policy {policy}")
